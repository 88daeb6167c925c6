package graft.etl

import graft.SparkSpec
import graft.sources.GenBank
import org.apache.spark.sql.functions._

/** gbassembly2chado (lib/Modware/Load/Command/gbassembly2chado.pm +
  * Loader/Genome/GenBank/Assembly.pm): CONTIG join-list walk into
  * interbase coordinates, the scaffold-presence gate, residue slicing
  * from scaffold sequences, golden merge counts and idempotent re-load.
  */
class GbAssemblySpec extends SparkSpec {
  import spark.implicits._

  // 120-base scaffold sequence, deterministic
  private val scafSeq = ("ACGT" * 30).take(120)

  // SCAF1: two contigs with a gap; CONTIG wraps across lines.
  // SCAF2: the single-contig branch (Assembly.pm:320-371) with a non-zero
  // first offset. SCAF3 exercises the unparseable-member skip.
  private val asmGb =
    s"""LOCUS       SCAF1   120 bp  DNA  linear  CON 01-JAN-2024
       |DEFINITION  assembly scaffold 1.
       |CONTIG      join(CTG1.1:1..40,gap(10),
       |            CTG2.2:5..34)
       |//
       |LOCUS       SCAF2   80 bp  DNA  linear  CON 01-JAN-2024
       |CONTIG      join(CTG3.1:11..40)
       |//
       |LOCUS       SCAF3   50 bp  DNA  linear  CON 01-JAN-2024
       |CONTIG      join(CTG4.1:1..10,what?is:this,gap(unk100))
       |//
       |""".stripMargin

  private def fixture(): String = {
    val f = java.nio.file.Files.createTempFile("gbasm", ".gb")
    java.nio.file.Files.writeString(f, asmGb)
    f.toString
  }

  test("CONTIG walk stacks interbase coordinates like the reference") {
    val segs = AssemblyToChado.parseContigJoin(
      "SCAF1", "join(CTG1.1:1..40,gap(10),CTG2.2:5..34)")
    assert(segs.map(s => (s.uniquename, s.ftype, s.fmin, s.fmax, s.seqlen)) ==
      Seq(("CTG1", "contig", 0L, 40L, 40L),
        ("SCAF1:gap1", "gap", 40L, 50L, 10L),
        // third segment stacks at the running end, not at its own 5..34
        ("CTG2", "contig", 50L, 80L, 30L)))
    assert(segs.head.version.contains(1) && segs.last.version.contains(2))
    // single-contig branch keeps its own offsets (start-1 interbase)
    val single = AssemblyToChado.parseContigJoin("SCAF2", "join(CTG3.1:11..40)")
    assert(single.map(s => (s.fmin, s.fmax)) == Seq((10L, 40L)))
    // unk gaps parse; garbage members are skipped, coordinates keep going
    val mixed = AssemblyToChado.parseContigJoin(
      "SCAF3", "join(CTG4.1:1..10,what?is:this,gap(unk100))")
    assert(mixed.map(_.ftype) == Seq("contig", "gap"))
    assert(mixed.last.fmin == 10L && mixed.last.fmax == 110L)
    assert(AssemblyToChado.parseContigJoin("X", "").isEmpty)
    // malformed leading gap: the coordinate scale starts at 0 and the
    // following contig STACKS — no overlap with the emitted gap
    val led = AssemblyToChado.parseContigJoin("S", "join(gap(10),C9.1:1..40)")
    assert(led.map(s => (s.ftype, s.fmin, s.fmax)) ==
      Seq(("gap", 0L, 10L), ("contig", 10L, 50L)))
  }

  test("scanner captures multi-line CONTIG headers; walk runs distributed") {
    val recs = GenBank.read(spark, fixture())
    val byLocus = recs.collect().map(r => r.locus -> r.contig).toMap
    // continuation line joined without whitespace — mid-accession wraps ok
    assert(byLocus("SCAF1") == "join(CTG1.1:1..40,gap(10),CTG2.2:5..34)")
    val segs = AssemblyToChado.segments(recs).collect()
    assert(segs.count(_.ftype == "contig") == 4)
    assert(segs.count(_.ftype == "gap") == 2)
  }

  test("assembly merge: scaffold gate, golden counts, residues, idempotence") {
    // live store holds SCAF1/SCAF2 as supercontigs (the "top level
    // features has to be loaded" precondition); SCAF3 is NOT loaded
    val scaffolds = Seq(
      graft.chado.GffRecord("genome", Some("genbank"), "supercontig", 0, 120,
        None, None, None, Map("ID" -> Seq("SCAF1"))),
      graft.chado.GffRecord("genome", Some("genbank"), "supercontig", 0, 80,
        None, None, None, Map("ID" -> Seq("SCAF2"))))
    val liveStaging = Gff3ToChado.stage(spark, spark.createDataset(scaffolds))
    val (live, _) = Gff3ToChado.merge(liveStaging,
      Gff3ToChado.Store.emptyLike(liveStaging))

    val recs = GenBank.read(spark, fixture())
    val all = AssemblyToChado.segments(recs)
    val segs = AssemblyToChado.onLoadedScaffolds(all, live.feature, "supercontig")
    // SCAF3's contig+gap dropped by the gate
    assert(all.count() == 6 && segs.count() == 4)

    val staging = Gff3ToChado.stage(spark,
      AssemblyToChado.toGffRecords(segs, prefix = "dictyBase"))
    val (store, counts) = Gff3ToChado.merge(staging, live)
    assert(counts("feature") == 4) // 3 contigs + 1 gap
    assert(counts("featureloc") == 4)
    // per feature: MOD accession + GFF_source:GenBank compat xref
    assert(counts("feature_dbxref") == 8)
    assert(counts("featureprop") == 3) // version props, contigs only

    // featureloc rows carry the stacked interbase coordinates
    val locs = store.featureloc
      .filter(col("srcfeature") === "SCAF1").orderBy(col("fmin"))
      .select(col("uniquename"), col("fmin"), col("fmax"))
      .as[(String, Int, Int)].collect().toSeq
    assert(locs == Seq(("CTG1", 0, 40), ("SCAF1:gap1", 40, 50), ("CTG2", 50, 80)))

    // residues sliced from the scaffold sequence table, md5-checksummed;
    // gaps excluded (Assembly.pm gap features carry no residues)
    val seqTable = Seq(("SCAF1", scafSeq), ("SCAF2", scafSeq.take(80)))
      .toDF("uniquename", "residues")
    val contigs = AssemblyToChado.contigSequences(segs, seqTable)
      .as[(String, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(contigs.keySet == Set("CTG1", "CTG2", "CTG3"))
    assert(contigs("CTG1")._1 == scafSeq.substring(0, 40))
    assert(contigs("CTG2")._1 == scafSeq.substring(50, 80))
    assert(contigs("CTG3")._1 == scafSeq.substring(10, 40))
    val md5Ctg1 = java.security.MessageDigest.getInstance("MD5")
      .digest(scafSeq.substring(0, 40).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(contigs("CTG1")._2 == md5Ctg1)

    // deterministic accessions make the re-load a no-op (engine contract;
    // deviation from the reference's Oracle-sequence ids, documented)
    val (_, again) = Gff3ToChado.merge(staging, store)
    assert(again.values.forall(_ == 0L))
  }

  test("declarative stitch matches the sequential walk on stacked segments") {
    // gap-led tails and multi-contig stacking: lengths as data
    val segs = AssemblyToChado.parseContigJoin(
      "SCAF1", "join(CTG1.1:1..40,gap(10),CTG2.2:5..34)")
    val parts = segs.map(s => ("SCAF1", s.ord.toLong, s.seqlen)).toDF("p", "ord", "len")
    val parents = Seq(("SCAF1", scafSeq)).toDF("p", "seq")
    val got = AssemblyToChado.stitch(parts, "p", "ord", "len", parents, "seq")
      .orderBy(col("ord")).select(col("fmin"), col("fmax"), col("piece"))
      .as[(Long, Long, String)].collect().toSeq
    assert(got.map(g => (g._1, g._2)) == segs.map(s => (s.fmin, s.fmax)))
    assert(got.head._3 == scafSeq.substring(0, 40))
  }
}
