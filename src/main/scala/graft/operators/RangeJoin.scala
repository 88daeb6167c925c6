package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via binning.
  *
  * A raw `p.v BETWEEN i.lo AND i.hi` join has no equi key, so Spark
  * plans BroadcastNestedLoopJoin — O(|P|·|I|) comparisons, a
  * scale-killer once intervals stop fitting the broadcast threshold.
  * Binning restores an equi key: each point maps to the single bin
  * `floor(v / binWidth)`; each interval is replicated to every bin it
  * overlaps. A hash join on the bin id then only compares co-binned
  * rows, and the residual `BETWEEN` filter removes same-bin misses.
  * Because a point lives in exactly one bin, every qualifying pair
  * appears exactly once — no dedup pass.
  *
  * Cost model: interval replication is `span/binWidth + 1` rows, and
  * join work per bin is `points_in_bin × intervals_overlapping_bin` —
  * pick `binWidth` on the order of the typical interval span. The same
  * plan shape runs on a 1000-executor cluster as a plain shuffled hash
  * join; small interval sets still broadcast (pass the interval side
  * wrapped in `broadcast()` to pin that).
  */
object RangeJoin {

  /** Join `points` rows to every `intervals` row whose
    * `[loCol, hiCol]` (inclusive both ends) contains `pointCol`.
    * Column sets must be disjoint apart from the coordinates; output
    * carries all columns of both inputs.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pts = points.withColumn("__bin",
      floor(col(pointCol) / lit(binWidth)).cast("long"))
    val ivs = intervals.withColumn("__bin", explode(sequence(
      floor(col(loCol) / lit(binWidth)).cast("long"),
      floor(col(hiCol) / lit(binWidth)).cast("long"))))
    pts.join(ivs, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
