package graft.transform

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Overlap

/** blast2chadogff3 transform (SURVEY.md S7 + §2.3 P5 + §2.4 J13 +
  * §2.9 F10): tabular BLAST results (outfmt-6 style, the pre-converted
  * input SURVEY.md suggests for S7) become GFF3 `match`/`match_part`
  * features. HSPs of one (query, subject, strand) are chained into
  * non-overlapping groups with the windowed overlap operator instead of
  * the reference's O(n²) pairwise walk
  * (lib/Modware/Transform/Command/blast2chadogff3.pm:337-435).
  */
object BlastToGff3 {

  /** One HSP row of a 12-column tabular BLAST report. */
  case class Hsp(
      queryId: String, subjectId: String, percentIdentity: Double,
      alignLen: Int, mismatches: Int, gapOpens: Int,
      qStart: Int, qEnd: Int, sStart: Int, sEnd: Int,
      evalue: Double, bitscore: Double)

  def parseLine(line: String): Option[Hsp] = {
    val f = line.split("\t", -1)
    if (line.startsWith("#") || f.length < 12) None
    else try Some(Hsp(f(0), f(1), f(2).toDouble, f(3).toInt, f(4).toInt,
      f(5).toInt, f(6).toInt, f(7).toInt, f(8).toInt, f(9).toInt,
      f(10).toDouble, f(11).toDouble))
    catch { case _: NumberFormatException => None }
  }

  /** `badRows` tallies unparseable non-comment lines (A8), matching the
    * GFF3 reader's policy. */
  def read(spark: SparkSession, path: String,
           badRows: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[Hsp] =
    parse(spark.read.textFile(path), badRows)

  /** The same parse gate over an in-memory line Dataset — the entry
    * point the oracle row (q104) uses; [[read]] is exactly
    * `parse(textFile(path))`. */
  def parse(lines: Dataset[String],
            badRows: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[Hsp] = {
    import lines.sparkSession.implicits._
    lines.flatMap { line =>
      val parsed = parseLine(line)
      if (parsed.isEmpty && !line.startsWith("#") && line.trim.nonEmpty)
        badRows.foreach(_.add(1))
      parsed
    }
  }

  /** Group HSPs and emit per-group `match` + per-HSP `match_part` frames.
    *
    * - P5: drop HSPs with evalue above `evalueCutoff`
    *   (blast2chadogff3.pm:235-237)
    * - strand from subject coordinate orientation; minus-strand
    *   coordinates normalized to (min, max)
    * - J13: chain grouping per (query, subject, strand)
    */
  private def grouped(hsps: Dataset[Hsp], evalueCutoff: Double): DataFrame = {
    val norm = hsps.toDF()
      .filter(col("evalue") <= evalueCutoff)
      .withColumn("strand", when(col("sEnd") >= col("sStart"), 1).otherwise(-1))
      .withColumn("start", least(col("sStart"), col("sEnd")) - 1) // 0-based interbase
      .withColumn("end", greatest(col("sStart"), col("sEnd")))
    Overlap.assignGroups(norm,
        Seq(col("queryId"), col("subjectId"), col("strand")),
        col("start"), col("end"))
      .withColumn("match_id",
        concat_ws(":", col("queryId"), col("subjectId"), col("strand"), col("group_id")))
  }

  def toFeatures(hsps: Dataset[Hsp], evalueCutoff: Double = 10.0): DataFrame =
    grouped(hsps, evalueCutoff)
      .groupBy(col("match_id"), col("queryId"), col("subjectId"), col("strand"))
      .agg(
        min(col("start")).as("fmin"),
        max(col("end")).as("fmax"),
        min(col("evalue")).as("evalue"),
        max(col("bitscore")).as("score"),
        count(lit(1)).as("n_parts"))

  /** Per-HSP `match_part` rows parented by their match group — the
    * two-level match/match_part output of the reference
    * (blast2chadogff3.pm:286-327), in the relational feature-frame shape
    * [[AlignmentFilter.matchPartFilter]] consumes. */
  def toMatchParts(hsps: Dataset[Hsp], evalueCutoff: Double = 10.0): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("match_id")).orderBy(col("start"), col("end"))
    grouped(hsps, evalueCutoff)
      .withColumn("part_no", row_number().over(w))
      .select(
        concat_ws(":", col("match_id"), col("part_no")).as("uniquename"),
        lit(null).cast("string").as("name"),
        lit("match_part").as("ftype"),
        col("subjectId").as("srcfeature"),
        col("start").as("fmin"), col("end").as("fmax"),
        col("bitscore").as("score"), col("strand"),
        lit(null).cast("int").as("phase"),
        lit("blast").as("source"),
        col("match_id").as("parent"))
  }

  private def gff3Line = concat_ws("\t",
    col("subjectId"), lit("blast"), lit("match"),
    (col("fmin") + 1).cast("string"), col("fmax").cast("string"),
    graft.functions.GenomicFunctions.formatG3(col("evalue")),
    when(col("strand") === 1, "+").otherwise("-"),
    lit("."),
    concat(lit("ID="), col("match_id"), lit(";Target="), col("queryId")))

  /** Serialize match groups as GFF3 lines with `%.3g` e-values (F10). */
  def toGff3Lines(matches: DataFrame): DataFrame =
    matches.select(gff3Line.as("value")).orderBy(col("value"))

  /** Same lines keyed by subject sequence, for the per-reference
    * partitioned write (scale path — no global sort). */
  def toGff3LinesBySubject(matches: DataFrame): DataFrame =
    matches.select(col("subjectId").as("srcfeature"), gff3Line.as("value"))

  /** The reference's algorithm→column-3 type map
    * (blast2gbrowsegff3.pm:90-113 `primary_tag`). With tabular input
    * the algorithm isn't in the file, so the source name doubles as the
    * guess — overridable, like the reference's option. */
  def primaryTagFor(source: String): String = source.toLowerCase match {
    case "blastn"             => "nucleotide_match"
    case "blastp" | "tblastn" => "protein_match"
    case "blastx" | "tblastx" => "translated_nucleotide_match"
    case _                    => "match"
  }

  /** GBrowse two-level GFF3 document (blast2gbrowsegff3.pm:311-366
    * write_hit/write_hsp): hit lines typed by algorithm with
    * `ID`/`Name` attributes; `match_part` lines carrying `Parent` +
    * `Target=<query> <qstart> <qend> <qstrand>` (strand numeric 1/-1,
    * exactly what the reference prints) and, when the HSP is ungapped,
    * `Gap=M<alignlen>` — tabular input has no cigar string, so a gapped
    * HSP's Gap is honestly omitted rather than guessed. Scores are
    * `%.3g` e-values on both levels (F10). Returns
    * (srcfeature, sort keys, value) rows: parent-before-children via
    * (hit fmin, match_id, rank, fmin). */
  def toGbrowseLines(hsps: Dataset[Hsp], source: String = "blast",
      primaryTag: Option[String] = None,
      evalueCutoff: Double = 10.0): DataFrame = {
    val tag = primaryTag.getOrElse(primaryTagFor(source))
    val strandCh = when(col("strand") === 1, "+").otherwise("-")
    val hits = toFeatures(hsps, evalueCutoff).select(
      col("subjectId").as("srcfeature"),
      col("fmin").as("hit_fmin"), col("match_id"),
      lit(0).as("rank"), col("fmin"),
      concat_ws("\t",
        col("subjectId"), lit(source), lit(tag),
        (col("fmin") + 1).cast("string"), col("fmax").cast("string"),
        graft.functions.GenomicFunctions.formatG3(col("evalue")),
        strandCh, lit("."),
        concat(lit("ID="), col("match_id"), lit(";Name="), col("queryId"))
      ).as("value"))
    val g = grouped(hsps, evalueCutoff)
    val hitSpan = g.groupBy(col("match_id").as("mid"))
      .agg(min(col("start")).as("hit_fmin"))
    val parts = g.join(hitSpan, col("match_id") === col("mid")).select(
      col("subjectId").as("srcfeature"),
      col("hit_fmin"), col("match_id"),
      lit(1).as("rank"), col("start").as("fmin"),
      concat_ws("\t",
        col("subjectId"), lit(source), lit("match_part"),
        (col("start") + 1).cast("string"), col("end").cast("string"),
        graft.functions.GenomicFunctions.formatG3(col("evalue")),
        strandCh, lit("."),
        concat(
          when(col("gapOpens") === 0,
            concat(lit("Gap=M"), col("alignLen"), lit(";")))
            .otherwise(lit("")),
          lit("Parent="), col("match_id"),
          lit(";Target="), col("queryId"), lit(" "),
          col("qStart"), lit(" "), col("qEnd"), lit(" "),
          when(col("qEnd") >= col("qStart"), 1).otherwise(-1))
      ).as("value"))
    hits.unionByName(parts)
  }
}
