package graft.etl

import graft.SparkSpec
import graft.sources.GenBank

/** gb2chado (lib/Modware/Load/Command/gb2chado.pm + Loader/Genome/
  * GenBank.pm:384-531): FeatureStack grouping, location parsing, and the
  * staged merge with golden counts + idempotent re-load, like
  * Gff3ToChadoSpec does for the GFF3 path.
  */
class GenBankToChadoSpec extends SparkSpec {
  import spark.implicits._

  private val gb =
    """LOCUS       SCF001   1200 bp  DNA  linear  CON 01-JAN-2024
      |DEFINITION  test scaffold.
      |FEATURES             Location/Qualifiers
      |     source          1..1200
      |                     /organism="Dictyostelium discoideum"
      |     gene            100..900
      |                     /gene="abcA"
      |                     /locus_tag="DDB_G1"
      |     mRNA            join(100..400,500..900)
      |                     /gene="abcA"
      |     CDS             join(150..400,500..850)
      |                     /gene="abcA"
      |                     /protein_id="XP_1"
      |     gene            complement(<950..>1100)
      |                     /locus_tag="DDB_G2"
      |     CDS             complement(950..1100)
      |                     /locus_tag="DDB_G2"
      |ORIGIN
      |        1 acgtacgtac gtacgtacgt
      |//
      |""".stripMargin

  private def fixture(): String = {
    val f = java.nio.file.Files.createTempFile("gb2chado", ".gb")
    java.nio.file.Files.writeString(f, gb)
    f.toString
  }

  test("location parser handles join/complement/partial forms") {
    assert(GenBankToChado.parseLocation("100..900").contains((99, 900, 1)))
    assert(GenBankToChado.parseLocation("join(100..400,500..900)").contains((99, 900, 1)))
    assert(GenBankToChado.parseLocation("complement(<950..>1100)").contains((949, 1100, -1)))
    assert(GenBankToChado.parseLocation("42").contains((41, 42, 1)))
    assert(GenBankToChado.parseLocation("").isEmpty)
  }

  test("FeatureStack grouping: scaffold + genes own their RNA/CDS rows") {
    val recs = GenBank.read(spark, fixture())
    val gff = GenBankToChado.toGffRecords(recs).collect()
    val byType = gff.groupBy(_.ftype)
    assert(byType("chromosome").head.seqId == "SCF001")
    assert(byType("gene").map(_.attributes("Name").head).toSet == Set("abcA", "DDB_G2"))
    // the mRNA belongs to gene 1; the orphan-gene CDS parents the gene
    val mrna = byType("mRNA").head
    assert(mrna.attributes("Parent") == Seq("SCF001:abcA"))
    val cdsParents = byType("CDS").map(_.attributes("Parent").head).toSet
    assert(cdsParents == Set(mrna.attributes("ID").head, "SCF001:DDB_G2"))
    // strands: gene2 family is minus
    assert(gff.filter(_.attributes("ID").head.contains("DDB_G2")).forall(_.strand.contains(-1)))
    // source/organism rows are not loaded (the reference skips them)
    assert(!byType.contains("source"))
  }

  test("mitochondrial mode synthesizes mRNA transcripts per CDS (P9 flag)") {
    val recs = GenBank.read(spark, fixture())
    val gff = GenBankToChado.toGffRecords(recs, mitochondrial = true).collect()
    // both CDSes now have a synthesized transcript between them and the gene
    val mrnas = gff.filter(_.ftype == "mRNA")
    assert(mrnas.length == 3) // 1 real + 2 synthesized
    val scaffoldProps = gff.filter(_.ftype == "chromosome").head.attributes
    assert(scaffoldProps("genome_type") == Seq("mitochondrial_DNA"))
    // synthesized transcript carries the GENE's strand
    val synth = mrnas.filter(_.attributes("ID").head.contains(":mRNA:"))
    assert(synth.exists(_.strand.contains(-1)))
  }

  test("gb2chado merge inserts golden counts, re-load inserts zero") {
    val recs = GenBank.read(spark, fixture())
    val staging = Gff3ToChado.stage(spark, GenBankToChado.toGffRecords(recs))
    val (store, counts) = Gff3ToChado.merge(staging, Gff3ToChado.Store.emptyLike(staging))
    // 1 scaffold + 2 genes + 1 mRNA + 2 CDS = 6 features
    assert(counts("feature") == 6)
    assert(counts("featureloc") == 6)
    // CDS->parent via both part_of and derives_from, mRNA+CDS part_of
    assert(counts("feature_relationship") == 5)
    assert(counts("featureprop") == 2) // genome_type + protein_id
    // idempotence: identical second load inserts nothing
    val (_, again) = Gff3ToChado.merge(staging, store)
    assert(again.values.forall(_ == 0L))
  }
}
