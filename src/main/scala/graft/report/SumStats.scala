package graft.report

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.chado.GffRecord

/** sumstatsongff3 report (SURVEY.md A4/W3): intron lengths are the gaps
  * between consecutive exons of an mRNA — the reference sorts exons and
  * loops (lib/Modware/Report/Command/sumstatsongff3.pm:85-121); here one
  * `lag` window computes every gap, and the per-file fork parallelism
  * becomes ordinary partition parallelism.
  */
object SumStats {

  /** Per-mRNA exon gaps: (mrna, intron_start, intron_end, intron_len). */
  def introns(features: Dataset[GffRecord]): DataFrame = {
    val exons = features.toDF()
      .filter(col("ftype") === "exon")
      .select(explode(expr("element_at(attributes, 'Parent')")).as("mrna"),
        col("fmin"), col("fmax"))
    val w = Window.partitionBy(col("mrna")).orderBy(col("fmin"))
    exons
      .withColumn("prev_end", lag(col("fmax"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("fmin") > col("prev_end"))
      .select(col("mrna"), col("prev_end").as("intron_start"),
        col("fmin").as("intron_end"),
        (col("fmin") - col("prev_end")).as("intron_len"))
  }

  /** The report row: count/avg/max/min intron length (A4). */
  def intronStats(features: Dataset[GffRecord]): DataFrame =
    introns(features).agg(
      count(lit(1)).as("n_introns"),
      (sum(col("intron_len")).cast("double") / count(lit(1))).as("avg_len"),
      max(col("intron_len")).as("max_len"),
      min(col("intron_len")).as("min_len"))
}
