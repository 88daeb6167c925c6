package graft.sources

import graft.SparkSpec

class OboGafSpec extends SparkSpec {

  private val obo =
    """format-version: 1.2
      |date: 01:06:2024 12:00
      |default-namespace: test_ontology
      |
      |[Term]
      |id: T:0000001
      |name: root
      |namespace: test_ontology
      |def: "the root" [REF:1]
      |
      |[Term]
      |id: T:0000002
      |name: child
      |synonym: "kid" EXACT []
      |synonym: "junior" BROAD []
      |alt_id: T:0000099
      |is_a: T:0000001 ! root
      |relationship: part_of T:0000001 ! root
      |
      |[Term]
      |id: T:0000003
      |name: gone
      |is_obsolete: true
      |
      |[Typedef]
      |id: part_of
      |name: part of
      |""".stripMargin

  test("OBO stanzas parse terms, synonyms, alt_ids, obsolete flags") {
    val terms = Obo.parseTerms(obo)
    assert(terms.length == 4)
    val child = terms.find(_.id == "T:0000002").get
    assert(child.name.contains("child"))
    assert(child.synonyms == Seq("kid", "junior"))
    assert(child.altIds == Seq("T:0000099"))
    val gone = terms.find(_.id == "T:0000003").get
    assert(gone.isObsolete)
    assert(terms.find(_.id == "part_of").get.isRelationshipType)
    assert(terms.find(_.id == "T:0000001").get.definition.contains("the root"))
  }

  test("OBO relationships include is_a and typed relationship tags") {
    val rels = Obo.parseRelationships(obo)
    assert(rels.toSet == Set(
      graft.chado.OboRelationship("T:0000002", "is_a", "T:0000001"),
      graft.chado.OboRelationship("T:0000002", "part_of", "T:0000001")))
  }

  test("OBO header metadata parses (version-gate input)") {
    val h = Obo.parseHeader(obo)
    assert(h("format-version") == "1.2")
    assert(h("date") == "01:06:2024 12:00")
    assert(h("default-namespace") == "test_ontology")
  }

  test("GAF rows parse 17 columns, skip comments, split pipes") {
    val lines = Seq(
      "!gaf-version: 2.0",
      "dictyBase\tDDB_G1\tabcA\t\tGO:0003674\tPMID:1|PMID:2\tIEA\tInterPro:IPR1\tF\tname here\tsyn1|syn2\tgene\ttaxon:44689\t20240101\tdictyBase\t\t")
    val recs = lines.flatMap(Gaf.parseLine)
    assert(recs.length == 1)
    val r = recs.head
    assert(r.db == "dictyBase" && r.objectId == "DDB_G1")
    assert(r.dbRef == Seq("PMID:1", "PMID:2"))
    assert(r.synonyms == Seq("syn1", "syn2"))
    assert(r.aspect == "F" && r.date == "20240101")
  }

  test("GAF round-trips through format()") {
    import spark.implicits._
    val line = "dictyBase\tDDB_G1\tabcA\t\tGO:0003674\tPMID:1|PMID:2\tIEA\t\tF\t\tsyn1|syn2\tgene\ttaxon:44689\t20240101\tdictyBase\t\t"
    val ds = spark.createDataset(Gaf.parseLine(line).toSeq)
    val out = Gaf.format(ds).as[String].collect().head
    assert(out == line)
  }

  test("closure TSV parses 4 columns") {
    import java.nio.file.Files
    val f = Files.createTempFile("closure", ".inf")
    Files.writeString(f, "T:2\tis_a\t1\tT:1\nT:3\tis_a\t2\tT:1\nbadline\n")
    val rows = ClosureTsv.read(spark, f.toString).collect()
    assert(rows.length == 2)
    assert(rows.find(_.subject == "T:3").get.pathdistance == 2)
  }
}
