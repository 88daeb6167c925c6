package graft.etl

import graft.SparkSpec
import graft.sources.Obo

/** Merge-semantics gates mirroring t/loader/obo2chado.t +
  * obo2chado-core-update.t: fresh load counts, then a v2 re-load
  * asserting prune/update/insert behavior. */
class OntologyMergeSpec extends SparkSpec {

  private val v1 =
    """format-version: 1.2
      |
      |[Term]
      |id: T:1
      |name: root
      |
      |[Term]
      |id: T:2
      |name: child
      |synonym: "kid" EXACT []
      |is_a: T:1
      |
      |[Term]
      |id: T:3
      |name: doomed
      |is_a: T:1
      |""".stripMargin

  // v2: T:3 pruned (absorbed as alt_id of T:2), T:2 renamed, T:4 new.
  private val v2 =
    """format-version: 1.2
      |
      |[Term]
      |id: T:1
      |name: root
      |
      |[Term]
      |id: T:2
      |name: child renamed
      |alt_id: T:3
      |synonym: "kid" EXACT []
      |synonym: "offspring" BROAD []
      |is_a: T:1
      |
      |[Term]
      |id: T:4
      |name: brand new
      |is_a: T:2
      |""".stripMargin

  import spark.implicits._

  private def staged(src: String) = OntologyMerge.stage(spark,
    spark.createDataset(Obo.parseTerms(src)),
    spark.createDataset(Obo.parseRelationships(src)))

  test("fresh load: all terms and relationships are new") {
    val st = staged(v1)
    val r = OntologyMerge.merge(st, OntologyMerge.CvStore.emptyLike(st))
    assert(r.counts("new_terms") == 3)
    assert(r.counts("new_relationships") == 2)
    assert(r.counts("pruned") == 0)
    assert(r.counts("new_synonyms") == 1)
  }

  test("v2 re-load: prune-unless-altid, rename detection, delta inserts") {
    val st1 = staged(v1)
    val first = OntologyMerge.merge(st1, OntologyMerge.CvStore.emptyLike(st1))
    val r = OntologyMerge.merge(staged(v2), first.store)
    // T:3 absent from v2 but arrives as alt_id of T:2 -> NOT pruned
    assert(r.counts("pruned") == 0)
    assert(r.counts("updated") == 1) // T:2 renamed
    assert(r.counts("new_terms") == 1) // T:4
    assert(r.counts("new_synonyms") == 1) // offspring
    assert(r.counts("new_relationships") == 1) // T:4 is_a T:2
  }

  test("re-load of identical content is a no-op") {
    val st1 = staged(v1)
    val first = OntologyMerge.merge(st1, OntologyMerge.CvStore.emptyLike(st1))
    val r = OntologyMerge.merge(staged(v1), first.store)
    assert(r.counts.values.forall(_ == 0L), s"expected all-zero, got ${r.counts}")
  }

  test("OBO validation flags dup ids, dangling edges, obsolete with edges") {
    import spark.implicits._
    val cvterm = Seq(
      ("T:1", "a", null, 0, "ns"), ("T:1", "a2", null, 0, "ns"), // dup
      ("T:2", "b", null, 1, "ns"), // obsolete but has an edge
      ("T:3", "c", null, 0, "ns"))
      .toDF("accession", "name", "definition", "is_obsolete", "namespace")
    val alt = Seq(("T:3", "T:99")).toDF("accession", "alt_id")
    val rel = Seq(
      ("T:2", "is_a", "T:3"),
      ("T:3", "is_a", "T:99"), // resolves via alt_id -> OK
      ("T:3", "is_a", "T:404")) // dangling object
      .toDF("subject", "predicate", "object")
    val st = OntologyMerge.CvStore(cvterm,
      Seq.empty[(String, String)].toDF("accession", "synonym"), alt, rel)
    val got = OntologyMerge.validate(st)
      .as[(String, String)].collect().toSet
    assert(got == Set(
      ("duplicate_id", "T:1"),
      ("dangling_object", "T:404"),
      ("obsolete_with_relationship", "T:2")))
  }

  test("pub annotation export folds curation props per (gene, pub)") {
    import spark.implicits._
    val fp = Seq(("DDB_G1", "10557"), ("DDB_G2", "20991"))
      .toDF("accession", "pubmed")
    val props = Seq(("DDB_G1", "10557", "curated"), ("DDB_G1", "10557", "reviewed"))
      .toDF("accession", "pubmed", "prop")
    val got = graft.export.PubExport.pubAnnotations(fp, props)
      .as[String].collect().toSeq
    assert(got == Seq("DDB_G1\t10557\tcurated|reviewed", "DDB_G2\t20991\t"))
  }
}
