package graft.export

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.etl.Gff3ToChado
import graft.sources.Gff3

/** The five dicty house GFF3 exports against one fixture genome
  * (lib/Modware/Export/Command/chado2dicty*gff3.pm semantics):
  * curator-else-sequencing-center fallback, curator-only curated dump,
  * ncRNA dump, per-source noncanonical dumps, and the SO-compliant
  * pseudogene rewrite. */
class DictyGff3ExportSpec extends SparkSpec {

  // gene1: curated + seqcenter mRNAs (canonical keeps the curated one)
  // gene2: seqcenter mRNA only (canonical falls back)
  // gene3: curated pseudogene (rewritten pseudogene model)
  // gene4: seqcenter tRNA (noncoding only)
  // gene5: curated ncRNA (curated + noncoding)
  // rna6:  geneID reprediction mRNA (noncanonical-v2 only)
  private val fixture =
    """##gff-version 3
      |chr1	dictyBase	chromosome	1	10000	.	.	.	ID=chr1
      |chr1	dictyBase Curator	gene	100	900	.	+	.	ID=gene1;Alias=abcA,b%2Cc
      |chr1	dictyBase Curator	mRNA	100	900	.	+	.	ID=rna1a;Parent=gene1
      |chr1	Sequencing Center	mRNA	100	880	.	+	.	ID=rna1b;Parent=gene1
      |chr1	dictyBase Curator	exon	100	400	.	+	.	ID=e1a;Parent=rna1a
      |chr1	Sequencing Center	exon	100	380	.	+	.	ID=e1b;Parent=rna1b
      |chr1	dictyBase Curator	polypeptide	100	900	.	+	.	ID=pp1.P;Derives_from=rna1a
      |chr1	Sequencing Center	gene	1200	1800	.	-	.	ID=gene2
      |chr1	Sequencing Center	mRNA	1200	1800	.	-	.	ID=rna2;Parent=gene2
      |chr1	Sequencing Center	exon	1200	1500	.	-	.	ID=e2;Parent=rna2
      |chr1	dictyBase	gene	2000	2400	.	+	.	ID=gene3;Alias=pseudoAlias
      |chr1	dictyBase Curator	pseudogene	2000	2400	.	+	.	ID=ps3;Parent=gene3
      |chr1	dictyBase Curator	exon	2000	2200	.	+	.	ID=e3;Parent=ps3
      |chr1	Sequencing Center	gene	3000	3200	.	+	.	ID=gene4
      |chr1	Sequencing Center	tRNA	3000	3200	.	+	.	ID=t4;Parent=gene4
      |chr1	dictyBase Curator	gene	4000	4300	.	-	.	ID=gene5
      |chr1	dictyBase Curator	ncRNA	4000	4300	.	-	.	ID=n5;Parent=gene5
      |chr1	geneID reprediction	mRNA	5000	5600	.	+	.	ID=rna6
      |chr1	geneID reprediction	exon	5000	5300	.	+	.	ID=e6;Parent=rna6
      |""".stripMargin

  private lazy val chado: DictyGff3Export.Chado = {
    val f = Files.createTempFile("dicty", ".gff3")
    Files.writeString(f, fixture)
    val st = Gff3ToChado.stage(spark, Gff3.features(spark, f.toString))
    DictyGff3Export.Chado(st.feature, st.featureloc,
      st.featureRelationship, st.featureDbxref, st.featureSynonym)
  }

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("uniquename") ->
      (r.getAs[String]("ftype"), r.getAs[String]("source"),
        r.getAs[String]("parent"))).toMap

  test("canonical: curator transcripts win, sequencing center is the per-gene fallback") {
    val rows = byId(DictyGff3Export.canonical(chado))
    assert(rows.contains("rna1a") && !rows.contains("rna1b"))
    assert(rows("rna2") == (("mRNA", "Sequencing Center", "gene2")))
    // gene rows inherit the surviving transcript's source
    assert(rows("gene1") == (("gene", "dictyBase Curator", null)))
    assert(rows("gene2") == (("gene", "Sequencing Center", null)))
    // polypeptide rides its curated transcript via Derives_from (no
    // Parent) and loses the house '.P' id suffix
    assert(rows("pp1") == (("polypeptide", "dictyBase Curator", null)))
    assert(!rows.contains("pp1.P"))
    // exon of the dropped seqcenter transcript is gone
    assert(rows.contains("e1a") && !rows.contains("e1b"))
    // non-mRNA gene models are out of scope
    assert(!rows.contains("t4") && !rows.contains("n5") && !rows.contains("rna6"))
  }

  test("canonical: dicty pseudogene models are rewritten SO-compliant") {
    val rows = byId(DictyGff3Export.canonical(chado))
    // the pseudogene gene row keeps its OWN source (pseudorow2gff3hash),
    // not the transcript's
    assert(rows("gene3") == (("pseudogene", "dictyBase", null)))
    assert(rows("ps3") == (("pseudogenic_transcript", "dictyBase Curator", "gene3")))
    assert(rows("e3") == (("pseudogenic_exon", "dictyBase Curator", "ps3")))
  }

  test("curated: curator-only, *RNA* or pseudogene, no fallback") {
    val rows = byId(DictyGff3Export.curated(chado))
    assert(Set("rna1a", "ps3", "n5").subsetOf(rows.keySet))
    assert(!rows.contains("rna2") && !rows.contains("rna1b") && !rows.contains("t4"))
    assert(rows.contains("gene5") && !rows.contains("gene2"))
    assert(!rows.contains("pp1")) // curated command wires no polypeptide event
  }

  test("noncoding: the fixed ncRNA type list from any source") {
    val rows = byId(DictyGff3Export.noncoding(chado))
    assert(rows.keySet.filter(k => k.startsWith("t") || k.startsWith("n")) == Set("t4", "n5"))
    assert(rows("gene4") == (("gene", "Sequencing Center", null)))
    assert(!rows.contains("rna1a") && !rows.contains("ps3"))
  }

  test("noncanonical: one source, no gene rows, parentless transcripts") {
    val rows = byId(DictyGff3Export.noncanonical(chado))
    assert(rows.keySet == Set("rna1b", "rna2", "e1b", "e2"))
    assert(rows("rna1b") == (("mRNA", "Sequencing Center", null)))
    assert(rows("e2") == (("exon", "Sequencing Center", "rna2"))) // exons keep Parent
  }

  test("noncanonical v2: flat reprediction dump with subfeatures") {
    val rows = byId(DictyGff3Export.noncanonicalV2(chado))
    assert(rows.keySet == Set("rna6", "e6"))
    assert(rows("rna6") == (("mRNA", "geneID reprediction", null)))
    assert(rows("e6") == (("exon", "geneID reprediction", "rna6")))
  }

  test("noncanonical v2: feature/subfeature types and source are configurable") {
    // the CLI's --feature-type/--subfeature-type/--source flags flow
    // here (chado2dictynoncanonicalv2gff3.pm's Getopt options)
    val rows = byId(DictyGff3Export.noncanonicalV2(chado,
      featureType = "mRNA", subfeatureType = "exon",
      source = "Sequencing Center"))
    assert(rows.keySet == Set("rna1b", "rna2", "e1b", "e2"))
    // a subfeature type with no part_of children yields features only
    val cds = byId(DictyGff3Export.noncanonicalV2(chado,
      featureType = "mRNA", subfeatureType = "CDS",
      source = "Sequencing Center"))
    assert(cds.keySet == Set("rna1b", "rna2"))
  }

  test("gene Alias carries synonyms and parents sort before children in the document") {
    val frame = DictyGff3Export.canonical(chado)
    val lines = Gff3Export.document(
      chado.feature.filter(col("ftype") === "chromosome")
        .select(col("uniquename"), col("seqlen")),
      frame).collect().map(_.getString(0))
    val gene1 = lines.find(_.contains("ID=gene1")).get
    // multi-valued Alias: values joined with ',' and embedded commas
    // %2C-escaped (round-trips through the parser)
    assert(gene1.contains("Alias=abcA,b%2Cc"))
    assert(gene1.split("\t")(1) == "dictyBase Curator")
    // pseudogene gene rows carry no Alias (pseudorow2gff3hash attrs)
    assert(!lines.find(_.contains("ID=gene3")).get.contains("Alias"))
    // polypeptide: stripped id, Derives_from instead of Parent
    val pp = lines.find(_.contains("ID=pp1")).get
    assert(pp.contains("ID=pp1;") && pp.contains("Derives_from=rna1a")
      && !pp.contains("Parent="))
    // parent-before-child: gene3 (pseudogene row) precedes ps3 precedes e3
    val ig = lines.indexWhere(_.contains("ID=gene3"))
    val ip = lines.indexWhere(_.contains("ID=ps3;"))
    val ie = lines.indexWhere(_.contains("ID=e3;"))
    assert(ig >= 0 && ig < ip && ip < ie,
      s"order wrong ($ig/$ip/$ie): ${lines.mkString("\n")}")
    assert(lines.head == "##gff-version 3")
    assert(lines.exists(_.startsWith("##sequence-region chr1 1 ")))
  }
}
