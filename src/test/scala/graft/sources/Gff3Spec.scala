package graft.sources

import java.nio.file.Files
import graft.SparkSpec

class Gff3Spec extends SparkSpec {

  // Fixture mirroring the semantics of the reference's test1.gff3
  // (t/lib/ChadoGFF3.pm golden counts) at miniature scale: a reference
  // sequence, a two-level gene model, a Target alignment, reserved vs
  // generic attributes, and an embedded FASTA tail.
  private val fixture =
    """##gff-version 3
      |##sequence-region chr1 1 2000
      |chr1	test	chromosome	1	2000	.	.	.	ID=chr1;Name=chr1
      |chr1	test	gene	100	900	.	+	.	ID=gene1;Name=g1;Alias=alpha,beta;Dbxref=GeneDB:G1;note=hand%3Bmade
      |chr1	test	mRNA	100	900	.	+	.	ID=rna1;Parent=gene1
      |chr1	test	exon	100	200	.	+	.	Parent=rna1
      |chr1	test	exon	300	900	.	+	.	Parent=rna1
      |chr1	test	CDS	150	850	.	+	0	ID=cds1;Parent=rna1
      |chr1	blat	match	1000	1500	95.5	-	.	ID=hit1;Target=q1 1 501 +
      |chr1	test	polypeptide	150	850	.	+	.	ID=pp1;Derives_from=rna1
      |##FASTA
      |>chr1
      |ACGTACGTACGT
      |ACGT
      |>q1
      |TTTTGGGG
      |""".stripMargin

  private lazy val path = {
    val f = Files.createTempFile("test", ".gff3")
    Files.writeString(f, fixture)
    f.toString
  }

  test("feature lines parse with 0-based interbase coordinates") {
    val feats = Gff3.features(spark, path).collect()
    assert(feats.length == 8)
    val gene = feats.find(_.attributes.get("ID").exists(_.contains("gene1"))).get
    assert(gene.fmin == 99 && gene.fmax == 900) // F8: start-1
    assert(gene.strand.contains(1)) // F7
    val hit = feats.find(_.ftype == "match").get
    assert(hit.score.contains(95.5))
    assert(hit.strand.contains(-1))
  }

  test("attribute multi-map splits on comma and percent-decodes") {
    val gene = Gff3.features(spark, path).collect()
      .find(_.attributes.get("ID").exists(_.contains("gene1"))).get
    assert(gene.attributes("Alias") == Seq("alpha", "beta"))
    assert(gene.attributes("note") == Seq("hand;made")) // %3B decoded
  }

  test("directives are extracted, FASTA tail is excluded from features") {
    val dirs = Gff3.directives(spark, path).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(dirs("gff-version") == "3")
    assert(dirs("sequence-region") == "chr1 1 2000")
  }

  test("embedded FASTA parses records after ##FASTA") {
    val fasta = Gff3.embeddedFasta(spark, path).collect()
      .map(r => r.seqId -> r.residues).toMap
    assert(fasta("chr1") == "ACGTACGTACGTACGT")
    assert(fasta("q1") == "TTTTGGGG")
  }
}
