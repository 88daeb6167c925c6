package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based grouping of ordered rows into chains/sessions.
  *
  * Spark-native form of the reference's HSP overlap-chain grouping
  * (lib/Modware/Transform/Command/blast2chadogff3.pm:337-435, SURVEY.md
  * J13): the Perl walks sorted rows pairwise in O(n^2); here one window
  * pass marks chain starts (`lag`) and a running `sum` assigns group ids —
  * O(n log n) in one shuffle, fully parallel across partition keys.
  */
object Sessionize {

  /** Assign a `session_id` (1-based, per partition key) to rows whose gap
    * from the previous row (by `orderCols`) exceeds `gapThreshold` in the
    * units of `measure`.
    */
  def assign(df: DataFrame, partitionCols: Seq[Column], orderCols: Seq[Column],
             measure: Column, gapThreshold: Long): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val prev = lag(measure, 1).over(w)
    val isStart = when(prev.isNull || (measure - prev) > gapThreshold, 1).otherwise(0)
    df.withColumn("session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
