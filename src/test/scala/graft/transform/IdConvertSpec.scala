package graft.transform

import graft.SparkSpec
import graft.sources.Gaf

/** modidingoa / modrefingoa (modidingoa.pm:29-59, modrefingoa.pm:30-83,
  * Convert/Resource/{gp2protein,goref}.pm): resource parsing and the
  * broadcast translate over GAF rows.
  */
class IdConvertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(content: String, suffix: String): String = {
    val f = java.nio.file.Files.createTempFile("idconv", suffix)
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  private val gafRows = Seq(
    "db\tQ54W44\tsym\t\tGO:1\tPMID:1\tIDA\t\tF\t\t\tgene\ttaxon:1\t20240101\tsrc\t\t",
    "db\tP0XXXX\tsym2\t\tGO:2\tGO_REF:0000002|PMID:9\tIEA\t\tF\t\t\tgene\ttaxon:1\t20240101\tsrc\t\t",
    "db\tQ86KT3\tsym3\t\tGO:3\tGO_REF:0000099\tIEA\t\tF\t\t\tgene\ttaxon:1\t20240101\tsrc\t\t")

  private def gaf = spark.createDataset(gafRows).flatMap(Gaf.parseLine _)

  test("gp2protein resource parses MOD->DB mappings with prefixes stripped") {
    val path = tmp(
      """!comment line
        |DDB:DDB_G0281829	UniProtKB:Q54W44;UniProtKB:Q86KT3
        |DDB:DDB_G0267178	UniProtKB:P12345
        |""".stripMargin, ".gp2protein")
    val m = IdConvert.gp2protein(spark, path)
      .as[(String, String)].collect().toMap
    assert(m == Map("Q54W44" -> "DDB_G0281829", "Q86KT3" -> "DDB_G0281829",
      "P12345" -> "DDB_G0267178"))
  }

  test("modidingoa converts column 2, drops untranslatable rows (F16)") {
    val path = tmp("DDB:DDB_G1\tUniProtKB:Q54W44;UniProtKB:Q86KT3\n", ".gp2protein")
    val (kept, dropped) = IdConvert.convertIds(
      gaf, IdConvert.gp2protein(spark, path))
    val ids = kept.select($"objectId").as[String].collect().toSet
    assert(ids == Set("DDB_G1"))
    assert(kept.count() == 2 && dropped.count() == 1)
    assert(dropped.select($"objectId").as[String].collect().toSeq == Seq("P0XXXX"))
  }

  test("goref resource takes the matching MOD external accession per stanza") {
    val path = tmp(
      """go_ref_id: GO_REF:0000002
        |title: something
        |external_accession: dictyBase_REF:10157
        |external_accession: SGD_REF:S000124036
        |
        |go_ref_id: GO_REF:0000003
        |external_accession: SGD_REF:S999
        |""".stripMargin, ".goref")
    val m = IdConvert.gorefMapping(spark, path)
      .as[(String, String)].collect().toMap
    // the stanza without a dictyBase_REF accession contributes nothing
    assert(m == Map("GO_REF:0000002" -> "dictyBase_REF:10157"))
  }

  test("modrefingoa translates the GO_REF entry in place, passes others through") {
    val path = tmp(
      "go_ref_id: GO_REF:0000002\nexternal_accession: dictyBase_REF:10157\n",
      ".goref")
    val (kept, dropped) = IdConvert.convertRefs(
      gaf, IdConvert.gorefMapping(spark, path))
    val byId = kept.select($"objectId", $"dbRef").as[(String, Seq[String])]
      .collect().toMap
    assert(byId("Q54W44") == Seq("PMID:1")) // no GO_REF: untouched
    assert(byId("P0XXXX") == Seq("dictyBase_REF:10157", "PMID:9")) // in place
    // unmapped GO_REF drops the row (reference warns + skips)
    assert(dropped.select($"objectId").as[String].collect().toSeq == Seq("Q86KT3"))
  }
}
