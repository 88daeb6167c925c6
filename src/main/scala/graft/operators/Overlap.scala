package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap chain grouping (SURVEY.md J13): the reference walks
  * sorted HSPs pairwise in O(n²)
  * (lib/Modware/Transform/Command/blast2chadogff3.pm:337-435); here a
  * running-max window marks chain starts in one pass — a row starts a new
  * group when its start is at or past the max end seen so far.
  */
object Overlap {

  /** Assign `group_id` (1-based per partition key) such that intervals in
    * the same group form an overlapping chain. */
  def assignGroups(df: DataFrame, partitionCols: Seq[Column],
                   startCol: Column, endCol: Column): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*)
      .orderBy(startCol, endCol)
    val runningMaxEnd = max(endCol)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val isStart = when(runningMaxEnd.isNull || startCol >= runningMaxEnd, 1)
      .otherwise(0)
    df.withColumn("group_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
