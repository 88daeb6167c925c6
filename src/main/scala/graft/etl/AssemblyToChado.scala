package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.chado.GffRecord
import graft.sources.GenBank.GbRecord

/** gbassembly2chado (SURVEY.md §2.1 S6, assembly variant): scaffold
  * GenBank records whose CONTIG header is a `join(...)` of contig spans
  * and gaps become `contig`/`gap` features located on the already-loaded
  * scaffolds — mirroring lib/Modware/Load/Command/gbassembly2chado.pm +
  * lib/Modware/Loader/Genome/GenBank/Assembly.pm:292-474.
  *
  * The reference walks each scaffold's join-list sequentially, stacking
  * 0-based interbase coordinates (Assembly.pm:303-432): the first contig
  * keeps its own `start-1..end` offsets, every later segment starts where
  * the previous one ended; gap lengths are explicit (`gap(N)` /
  * `gap(unkN)`). That walk is per-scaffold sequential text processing, so
  * it runs inside `flatMap` — scaffolds parallelize, the walk is a local
  * loop. Everything relational after it — novelty anti-joins, FK stitch,
  * residue slicing — is set-based on DataFrames.
  *
  * Deviation from the reference, documented: gap/dbxref accessions come
  * from an Oracle sequence there (Assembly.pm:521-532), which makes
  * re-loads mint fresh ids. Here accessions are deterministic
  * (`scaffold:gapN` / the contig's own accession), so the merge DAG's
  * anti-joins make the load idempotent — the engine-wide re-load
  * contract.
  */
object AssemblyToChado {

  /** One ordered member of a scaffold's assembly join-list.
    * Coordinates are 0-based interbase on the scaffold. */
  case class AsmSegment(scaffold: String, uniquename: String, ftype: String,
                        version: Option[Int], fmin: Long, fmax: Long,
                        seqlen: Long, ord: Int)

  // Assembly.pm:161-177 — contig spans look like `ACC.VER:START..END`,
  // gaps like `gap(1234)` or `gap(unk100)`.
  private val ContigRgx = """^(\w+)\.(\d{1,2}):(\d+)\.\.(\d+)$""".r
  private val GapRgx = """^gap\((unk)?(\d+)\)$""".r
  private val JoinRgx = """join\((.+)\)""".r

  /** Walk one scaffold's CONTIG string into ordered interbase segments
    * (Assembly.pm:298-474). Unparseable members are skipped, as the
    * reference logs-and-continues. */
  def parseContigJoin(scaffold: String, contig: String): Seq[AsmSegment] = {
    val inner = contig match {
      case JoinRgx(s) => s
      case _ => return Seq.empty
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[AsmSegment]
    var runningEnd = 0L
    var startFlag = true
    var gapIdx = 0
    for (loc <- inner.split(',').iterator.map(_.trim) if loc.nonEmpty) {
      loc match {
        case ContigRgx(acc, ver, s, e) =>
          val len = e.toLong - s.toLong + 1
          // first contig keeps its own offsets (start-1 interbase);
          // later segments stack at the running end (Assembly.pm:376-385)
          val fmin = if (startFlag) s.toLong - 1 else runningEnd
          startFlag = false
          runningEnd = fmin + len
          out += AsmSegment(scaffold, acc, "contig", Some(ver.toInt),
            fmin, runningEnd, len, out.size)
        case GapRgx(_, n) =>
          // the reference assumes assemblies never start with a gap
          // (Assembly.pm:427-428) and would mis-anchor the next contig
          // if one did; here a leading gap simply starts the coordinate
          // scale at 0, so a malformed join-list cannot make a later
          // contig overlap the segments already emitted
          startFlag = false
          val len = n.toLong
          val fmin = runningEnd
          runningEnd = fmin + len
          gapIdx += 1
          out += AsmSegment(scaffold, s"$scaffold:gap$gapIdx", "gap", None,
            fmin, runningEnd, len, out.size)
        case _ => // "no matching contig or accession found" — skip
      }
    }
    out.toSeq
  }

  /** Scaffold records → ordered assembly segments (map-only). */
  def segments(records: Dataset[GbRecord]): Dataset[AsmSegment] = {
    import records.sparkSession.implicits._
    records.flatMap(r => parseContigJoin(r.locus, r.contig))
  }

  /** Segments → GFF3-shaped rows for [[Gff3ToChado.stage]]: each contig
    * carries its MOD accession dbxref (prefix db, Assembly.pm:339-343),
    * the GFF_source:GenBank compat xref (Assembly.pm:534-546) and its
    * accession version as a featureprop; gaps carry the same xrefs minus
    * the version. featureloc rows fall out of seqId/fmin/fmax. */
  def toGffRecords(segs: Dataset[AsmSegment],
                   prefix: String = "dictyBase"): Dataset[GffRecord] = {
    import segs.sparkSession.implicits._
    segs.map { s =>
      // GffRecord carries Int interbase coordinates (the engine-wide
      // featureloc schema); fail loudly rather than wrap past 2^31 —
      // a >2 Gbp scaffold or a corrupt gap(N) would otherwise emit
      // negative coordinates while the residue slice kept the Long
      require(s.fmax <= Int.MaxValue,
        s"assembly coordinate overflow on ${s.scaffold}: fmax=${s.fmax}")
      val attrs = Map(
        "ID" -> Seq(s.uniquename),
        "Name" -> Seq(s.uniquename),
        "Dbxref" -> Seq(s"$prefix:${s.uniquename}", "GFF_source:GenBank")) ++
        s.version.map(v => "version" -> Seq(v.toString))
      // source 'GenBank' coincides with the explicit compat xref above,
      // so the staged column-2 GFF_source link dedupes against it
      GffRecord(s.scaffold, Some("GenBank"), s.ftype,
        s.fmin.toInt, s.fmax.toInt, None, None, None, attrs)
    }
  }

  /** Contig residues sliced from the scaffold sequences — the set-based
    * form of the reference's per-contig `SUBSTR(residues, ...)` round
    * trip (Assembly.pm:476-485, one DB query per contig there; one join
    * here). `scaffoldSeqs` is (uniquename, residues). Gaps have no
    * residues and are excluded, as in the reference. */
  def contigSequences(segs: Dataset[AsmSegment],
                      scaffoldSeqs: DataFrame): DataFrame = {
    segs.toDF()
      .filter(col("ftype") === "contig")
      .join(scaffoldSeqs.withColumnRenamed("uniquename", "scaffold"), "scaffold")
      .select(col("uniquename"),
        expr("substring(residues, fmin + 1, cast(seqlen as int))").as("residues"))
      .withColumn("md5checksum", md5(col("residues")))
  }

  /** The declarative stitch shape (q91): parts with explicit lengths,
    * stacked per parent in `ord` order into interbase coordinates via a
    * running-sum window, then joined to the parent sequence and sliced.
    * One window pass + one shuffle join — the plan the per-contig ORM
    * walk above collapses into when segment lengths are data rather than
    * text. Output adds `fmin`/`fmax`/`piece`/`piece_md5`. */
  def stitch(parts: DataFrame, parentCol: String, ordCol: String,
             lenCol: String, parents: DataFrame, seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(parentCol)).orderBy(col(ordCol))
    parts
      .withColumn("fmax", sum(col(lenCol)).over(w).cast("long"))
      .withColumn("fmin", (col("fmax") - col(lenCol)).cast("long"))
      .join(parents, parentCol)
      .withColumn("piece",
        expr(s"substring($seqCol, cast(fmin + 1 as int), cast($lenCol as int))"))
      .withColumn("piece_md5", md5(col("piece")))
  }

  /** Scaffold-presence gate: segments whose scaffold is not a loaded
    * feature of `referenceType` are dropped (the reference's scaffold
    * cache miss, Assembly.pm:125-150 — it warns; here the caller reports
    * the dropped count). Broadcast-friendly: the scaffold list is
    * dimension-sized. */
  def onLoadedScaffolds(segs: Dataset[AsmSegment], storeFeature: DataFrame,
                        referenceType: String): Dataset[AsmSegment] = {
    import segs.sparkSession.implicits._
    val scaffolds = storeFeature.filter(col("ftype") === referenceType)
      .select(col("uniquename").as("scaffold"))
    segs.toDF().join(broadcast(scaffolds), Seq("scaffold"), "left_semi")
      .as[AsmSegment]
  }
}
