package graft.etl

import java.nio.file.Files
import graft.SparkSpec
import graft.sources.Gff3
import org.apache.spark.sql.functions.expr

/** Golden-count + idempotence gates mirroring the reference's own test
  * strategy (t/lib/ChadoGFF3.pm:120-162): exact per-table insert counts
  * on first load, zero new rows on identical re-load. */
class Gff3ToChadoSpec extends SparkSpec {

  private val fixture =
    """##gff-version 3
      |chr1	test	chromosome	1	2000	.	.	.	ID=chr1
      |chr1	test	gene	100	900	.	+	.	ID=gene1;Name=g1;Alias=alpha,beta;Dbxref=GeneDB:G1,UniProt:U1;note=x
      |chr1	test	mRNA	100	900	.	+	.	ID=rna1;Parent=gene1;Dbxref=GeneDB:G1
      |chr1	test	exon	100	200	.	+	.	Parent=rna1
      |chr1	test	exon	300	900	.	+	.	Parent=rna1
      |chr1	test	CDS	150	850	.	+	0	ID=cds1;Parent=rna1
      |chr1	blat	match	1000	1500	95.5	-	.	ID=hit1;Target=q1 1 501 +
      |chr1	test	polypeptide	150	850	.	+	.	ID=pp1;Derives_from=rna1
      |""".stripMargin

  private lazy val path = {
    val f = Files.createTempFile("load", ".gff3")
    Files.writeString(f, fixture)
    f.toString
  }

  test("first load produces the golden per-table insert counts") {
    val staging = Gff3ToChado.stage(spark, Gff3.features(spark, path))
    val (_, counts) = Gff3ToChado.merge(staging, Gff3ToChado.Store.emptyLike(staging))
    assert(counts("feature") == 8)
    assert(counts("featureloc") == 8) // rank-0 location per feature
    assert(counts("featureloc_target") == 1) // the Target hit (W2 rank 1)
    assert(counts("analysisfeature") == 1) // scored match line
    assert(counts("synonym") == 2) // alpha, beta
    assert(counts("feature_synonym") == 2)
    // GeneDB:G1 deduped across rows (W1), UniProt:U1, plus the two
    // GFF_source xrefs (test, blat) the loader records for column 2
    assert(counts("dbxref") == 4)
    assert(counts("feature_dbxref") == 11) // gene1 x2, rna1 x1, + 8 GFF_source links
    assert(counts("feature_relationship") == 5) // 4 part_of + 1 derives_from
    assert(counts("featureprop") == 1) // lowercase note -> generic prop (P8)
  }

  test("FeatureVersion plugin adds one versioned dbxref per feature, idempotently") {
    val staged = Gff3ToChado.stage(spark, Gff3.features(spark, path))
    val staging = Gff3ToChado.withFeatureVersion(staged)
    val (store, counts) = Gff3ToChado.merge(staging, Gff3ToChado.Store.emptyLike(staging))
    // 8 features -> +8 DDB:uniquename dbxrefs, links, version props
    assert(counts("dbxref") == 4 + 8)
    assert(counts("feature_dbxref") == 11 + 8)
    assert(counts("featureprop") == 1 + 8)
    val (_, again) = Gff3ToChado.merge(staging, store)
    assert(again.values.forall(_ == 0L)) // re-load adds nothing
  }

  test("identical re-load inserts zero rows everywhere (idempotence)") {
    val staging = Gff3ToChado.stage(spark, Gff3.features(spark, path))
    val (store, _) = Gff3ToChado.merge(staging, Gff3ToChado.Store.emptyLike(staging))
    val (_, counts2) = Gff3ToChado.merge(staging, store)
    assert(counts2.values.forall(_ == 0L), s"expected all-zero, got $counts2")
  }

  test("refCompat staging reproduces the reference's OWN golden counts on test1.gff3") {
    val ref = "/root/reference/t/test_data/gff3/test1.gff3"
    assume(new java.io.File(ref).canRead,
      "reference fixture not present in this environment")
    // the reference's acceptance contract, t/lib/ChadoGFF3.pm:120-139
    val golden = Map(
      "feature" -> 53L, "featureloc" -> 51L, "featureloc_target" -> 2L,
      "analysisfeature" -> 6L, "synonym" -> 3L, "feature_synonym" -> 4L,
      "feature_relationship" -> 39L, "dbxref" -> 5L,
      "feature_dbxref" -> 6L, "featureprop" -> 12L)
    val staging = Gff3ToChado.stageRefCompat(spark,
      Gff3.featuresWithLine(spark, ref))
    val (store, counts) =
      Gff3ToChado.merge(staging, Gff3ToChado.Store.emptyLike(staging))
    assert(counts == golden, s"expected the reference's golden hash, got $counts")
    // the reference's idempotence gate: identical re-stage (auto ids
    // re-derive from line order, so they collide exactly) inserts zero
    val staging2 = Gff3ToChado.stageRefCompat(spark,
      Gff3.featuresWithLine(spark, ref))
    val (_, again) = Gff3ToChado.merge(staging2, store)
    assert(again.values.forall(_ == 0L), s"expected all-zero, got $again")
  }

  test("refCompat update load (test1 then test2) reproduces the reference's updated golden counts") {
    val ref1 = "/root/reference/t/test_data/gff3/test1.gff3"
    val ref2 = "/root/reference/t/test_data/gff3/test2.gff3"
    assume(new java.io.File(ref1).canRead && new java.io.File(ref2).canRead,
      "reference fixtures not present in this environment")
    // the reference's UPDATE contract, t/lib/ChadoGFF3.pm:141-162 —
    // test2 loaded into the store test1 built, auto-id counter
    // CONTINUING across the loads (ChadoGFF3UpdateRunner.pm:34-44);
    // the one shared id (ctg123) is the 22nd staged feature that is
    // not new
    val goldenUpdate = Map(
      "feature" -> 21L, "featureloc" -> 21L, "featureloc_target" -> 0L,
      "analysisfeature" -> 0L, "synonym" -> 0L, "feature_synonym" -> 0L,
      "feature_relationship" -> 19L, "dbxref" -> 0L,
      "feature_dbxref" -> 0L, "featureprop" -> 10L)
    val recs1 = Gff3.featuresWithLine(spark, ref1)
    val st1 = Gff3ToChado.stageRefCompat(spark, recs1)
    val (store, _) = Gff3ToChado.merge(st1, Gff3ToChado.Store.emptyLike(st1))
    val idless1 = recs1
      .filter(expr("element_at(attributes, 'ID')[0]").isNull).count()
    val st2 = Gff3ToChado.stageRefCompat(spark,
      Gff3.featuresWithLine(spark, ref2), autoIdFrom = idless1 + 1L)
    val (_, counts) = Gff3ToChado.merge(st2, store)
    assert(counts == goldenUpdate,
      s"expected the reference's updated hash, got $counts")
  }

  test("incremental load inserts only the delta") {
    val staging = Gff3ToChado.stage(spark, Gff3.features(spark, path))
    val (store, _) = Gff3ToChado.merge(staging, Gff3ToChado.Store.emptyLike(staging))
    val f2 = Files.createTempFile("load2", ".gff3")
    Files.writeString(f2, fixture +
      "chr1\ttest\tgene\t1200\t1600\t.\t-\t.\tID=gene2;Alias=alpha\n")
    val staging2 = Gff3ToChado.stage(spark, Gff3.features(spark, f2.toString))
    val (_, counts) = Gff3ToChado.merge(staging2, store)
    assert(counts("feature") == 1) // just gene2
    assert(counts("featureloc") == 1)
    assert(counts("synonym") == 0) // alpha already present
    assert(counts("feature_synonym") == 1) // but the link is new
    assert(counts("feature_relationship") == 0)
  }
}
