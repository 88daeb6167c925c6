package graft.export

import graft.SparkSpec

/** chado2fasta set-based export (chado2fasta.pm:359-460): hand-computed
  * spliced/inferred sequences from a tiny two-exon fixture, including
  * the minus-strand revcomp-of-assembled-sequence semantics.
  */
class FastaExportSpec extends SparkSpec {
  import spark.implicits._

  // reference: 40 bases, positions (1-based) 1..40
  private val refSeq = "ACGTACGTACGTACGTACGTTTTTGGGGCCCCAAAATTTT"
  private def refs = Seq(("chr1", refSeq)).toDF("srcfeature", "residues")

  test("inferred sequence = SUBSTR of reference span, revcomp on minus") {
    val locs = Seq(
      ("geneP", "chr1", 0, 8, 1), // bases 1..8 = ACGTACGT
      ("geneM", "chr1", 0, 8, -1)) // revcomp = ACGTACGT reversed-complemented
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand")
    val got = FastaExport.inferred(locs, refs)
      .as[(String, String)].collect().toMap
    assert(got("geneP") == "ACGTACGT")
    assert(got("geneM") == "ACGTACGT".reverse.map {
      case 'A' => 'T'; case 'C' => 'G'; case 'G' => 'C'; case 'T' => 'A' })
  }

  test("spliced transcript = exons cut and assembled in fmin order") {
    // exon1 spans bases 5..8 (fmin 4, fmax 8) = ACGT
    // exon2 spans bases 21..24 (fmin 20, fmax 24) = TTTT
    val tLocs = Seq(("rna1", "chr1", 4, 24, 1))
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand")
    // deliberately list exon2 first: fmin order must win
    val parents = Seq(("exon2", "rna1"), ("exon1", "rna1"))
      .toDF("uniquename", "parent")
    val eLocs = Seq(
      ("exon2", "chr1", 20, 24, 1),
      ("exon1", "chr1", 4, 8, 1))
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand")
    val got = FastaExport.spliced(tLocs, parents, eLocs, refs)
      .as[(String, String)].collect().toMap
    assert(got("rna1") == "ACGT" + "TTTT")
  }

  test("minus-strand transcript revcomps the ASSEMBLED sequence") {
    val tLocs = Seq(("rnaM", "chr1", 4, 24, -1))
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand")
    val parents = Seq(("e1", "rnaM"), ("e2", "rnaM")).toDF("uniquename", "parent")
    val eLocs = Seq(
      ("e1", "chr1", 4, 8, -1),
      ("e2", "chr1", 20, 24, -1))
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand")
    val got = FastaExport.spliced(tLocs, parents, eLocs, refs)
      .as[(String, String)].collect().toMap
    // assembled plus-strand "ACGTTTTT", then revcomp once of the whole
    // assembly (chado2fasta.pm:452-456) = "AAAAACGT"
    assert(got("rnaM") == "AAAAACGT")
  }

  test("polypeptides are scoped by derives_from before inference") {
    val pLocs = Seq(
      ("poly1", "chr1", 0, 4, 1),
      ("orphan", "chr1", 0, 4, 1))
      .toDF("uniquename", "srcfeature", "fmin", "fmax", "strand")
    val derives = Seq(("poly1", "rna1")).toDF("subject", "object")
    val got = FastaExport.polypeptides(pLocs, derives, refs)
      .as[(String, String)].collect().toMap
    assert(got == Map("poly1" -> "ACGT"))
  }

  test("round-trip: GFF3 + FASTA tail -> spliced FASTA via the CLI path shape") {
    val gff3 =
      s"""##gff-version 3
         |chr1\tsrc\tgene\t5\t24\t.\t+\t.\tID=g1
         |chr1\tsrc\tmRNA\t5\t24\t.\t+\t.\tID=rna1;Parent=g1
         |chr1\tsrc\texon\t5\t8\t.\t+\t.\tID=exon1;Parent=rna1
         |chr1\tsrc\texon\t21\t24\t.\t+\t.\tID=exon2;Parent=rna1
         |##FASTA
         |>chr1
         |$refSeq
         |""".stripMargin
    val f = java.nio.file.Files.createTempFile("roundtrip", ".gff3")
    java.nio.file.Files.writeString(f, gff3)
    val feats = graft.sources.Gff3.features(spark, f.toString).toDF()
      .withColumn("uniquename", org.apache.spark.sql.functions.expr(
        "element_at(attributes, 'ID')[0]"))
      .withColumn("parent", org.apache.spark.sql.functions.expr(
        "element_at(attributes, 'Parent')[0]"))
      .withColumnRenamed("seqId", "srcfeature")
    val fasta = graft.sources.Gff3.embeddedFasta(spark, f.toString).toDF()
      .select($"seqId".as("srcfeature"), $"residues")
    val sel = Seq($"uniquename", $"srcfeature", $"fmin", $"fmax", $"strand")
    val got = FastaExport.spliced(
      feats.filter($"ftype" === "mRNA").select(sel: _*),
      feats.filter($"ftype" === "exon").select($"uniquename", $"parent"),
      feats.filter($"ftype" === "exon").select(sel: _*),
      fasta)
      .as[(String, String)].collect().toMap
    assert(got == Map("rna1" -> "ACGTTTTT"))
  }
}
