package graft.export

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.etl.GafLoad
import graft.sources.Gaf

/** chado2gaf pipeline (lib/Modware/Export/GAF.pm:155-386 +
  * dictygaf.pm:118-146) — validated like t/chado2gaf/validate_gaf.t: a
  * GAF fixture is loaded into the annotation store shape, exported back,
  * and every emitted line must be structurally valid GAF 2.0 and match
  * the fixture's payload.
  */
class GafExportSpec extends SparkSpec {

  private val gafText =
    """!gaf-version: 2.0
      |!generated for the spec
      |dictyBase	DDB_G0267178	aarA		GO:0003779	PMID:10557	IDA		F	actin binder	aarA-1|aarA-2	gene	taxon:44689	20240115	dictyBase
      |dictyBase	DDB_G0267178	aarA		GO:0003779	PMID:20991	IEA		F			gene	taxon:44689	20240116	UniProt
      |dictyBase	DDB_G0269100	abcB	NOT	GO:0005524	GO_REF:0000015	ISS	With:Not_supplied	F	transporter		gene	taxon:44689	20230601	dictyBase
      |dictyBase	DDB_G0269100	abcB		GO:0016020	PMID:33333	IC	GO:0005524	C	membrane thing		gene	taxon:44689	20240201	dictyBase
      |dictyBase	DDB_G0280000	obsG		GO:0099999	PMID:44444	ND		P			gene	taxon:44689	20240301	dictyBase
      |""".stripMargin

  private def writeFixture(): String = {
    val f = java.nio.file.Files.createTempFile("gaf-export", ".gaf")
    java.nio.file.Files.writeString(f, gafText)
    f.toString
  }

  private def storeFrom(path: String) = {
    val tables = GafLoad.toStore(Gaf.read(spark, path))
    // the ontology side marks GO:0099999 obsolete (P2 input) and adds the
    // spelled-out EXACT synonyms that exercise F18's short-form preference
    val terms = tables("cvterm_go")
      .withColumn("is_obsolete",
        when(col("go_id") === "0099999", 1).otherwise(col("is_obsolete")))
    import spark.implicits._
    val longForms = Seq(
      ("ECO:IDA", "direct assay evidence used in manual assertion"),
      ("ECO:IEA", "evidence used in automatic assertion"),
      ("ECO:ISS", "sequence similarity evidence"),
      ("ECO:IC", "inference from background scientific knowledge"),
      ("ECO:ND", "no biological data available"))
      .toDF("evidence_id", "synonym")
    (tables("feature_cvterm"), terms, tables("gene"),
      tables("evidence_synonym").unionByName(longForms),
      tables("gene_synonym"), tables("gene_description"))
  }

  private def exportRows(skip: Option[org.apache.spark.sql.DataFrame] = None) = {
    val (assoc, terms, genes, evSyn, geneSyn, desc) = storeFrom(writeFixture())
    GafExport.rows(assoc, terms, genes, evSyn, geneSyn, desc, skipIds = skip)
  }

  test("GAF round-trip: every non-obsolete annotation re-exports with its payload") {
    val rows = exportRows().orderBy("c2_accession", "c5_go_id", "c6_db_ref").collect()
    // 5 fixture rows - 1 obsolete-term row (P2) = 4
    assert(rows.length == 4)
    val first = rows.head
    assert(first.getString(0) == "dictyBase")
    assert(first.getString(1) == "DDB_G0267178")
    assert(first.getString(4) == "GO:0003779")
    assert(first.getString(5) == "PMID:10557")
    // F18: short code preferred over the spelled-out synonym
    assert(rows.map(_.getString(6)).toSet == Set("IDA", "IEA", "ISS", "IC"))
    // F17 aspect letters survive the cv round-trip
    assert(rows.map(_.getString(8)).toSet == Set("F", "C"))
    // A7: sorted pipe-fold of gene synonyms
    assert(first.getString(10) == "aarA-1|aarA-2")
    // every row is 17 columns wide
    assert(rows.forall(_.length == 17))
  }

  test("With:Not_supplied is blanked; real with_from values survive") {
    val byRef = exportRows().collect().map(r => r.getString(5) -> r.getString(7)).toMap
    assert(byRef("GO_REF:0000015") == "")
    assert(byRef("PMID:33333") == "GO:0005524")
  }

  test("A6 latest-by-date description wins per gene") {
    val rows = exportRows().filter(col("c2_accession") === "DDB_G0267178").collect()
    // two product rows (20240115 'actin binder', 20240116 '' — the empty
    // one is dropped as null objectName? no: second row HAS no name) —
    // only the dated 'actin binder' row exists, latest pick returns it
    assert(rows.forall(_.getString(9) == "actin binder"))
    val desc = GafExport.latestDescription(
      { import spark.implicits._
        Seq(("g1", "old product", "02-Jan-20"),
          ("g1", "new product", "15-Mar-24"),
          ("g2", "only", "01-Jan-21")).toDF("gene_id", "description", "date_created") })
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc == Map("g1" -> "new product", "g2" -> "only"))
  }

  test("P6 skip-id anti-join drops listed accessions") {
    import spark.implicits._
    val skip = Seq("DDB_G0269100").toDF("accession")
    val rows = exportRows(Some(skip)).collect()
    assert(rows.map(_.getString(1)).toSet == Set("DDB_G0267178"))
  }

  test("partitioned GAF write: one self-contained headered doc per aspect") {
    val out = java.nio.file.Files.createTempDirectory("gafpart").toString
    GafExport.writeDocument(exportRows(), "dictyBase", "http://dictybase.org",
      java.time.LocalDate.of(2026, 8, 12), out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("aspect=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("aspect=C", "aspect=F"))
    val f = spark.read.textFile(s"$out/aspect=F").collect()
    assert(f.take(3).toSeq == Seq("!gaf-version: 2.0", "!08/12/2026",
      "!dictyBase(http://dictybase.org)"))
    assert(f.drop(3).forall(_.split("\t", -1)(8) == "F"))
    assert(f.drop(3).length == 3) // the three F-aspect annotations
  }

  test("serialized GAF 2.0 document: dated header + valid tab rows") {
    val lines = GafExport.lines(exportRows(), "dictyBase", "http://dictybase.org",
      java.time.LocalDate.of(2026, 8, 12)).collect().map(_.getString(0))
    assert(lines(0) == "!gaf-version: 2.0")
    assert(lines(1) == "!08/12/2026")
    assert(lines(2) == "!dictyBase(http://dictybase.org)")
    val body = lines.drop(3)
    assert(body.length == 4)
    // validate_gaf.t-style checks: 17 columns, GO: prefix, taxon column
    assert(body.forall(_.split("\t", -1).length == 17))
    assert(body.forall(_.split("\t", -1)(4).startsWith("GO:")))
    assert(body.forall(_.split("\t", -1)(12) == "taxon:44689"))
    assert(body.forall(l => Set("F", "P", "C").contains(l.split("\t", -1)(8))))
  }
}
