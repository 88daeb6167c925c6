package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join — attach to each left row the latest
  * right row at-or-before its timestamp (backward) or the earliest one
  * at-or-after it (forward), matched per key.
  *
  * Spark has no native ASOF JOIN; the naive encodings are a range join
  * (`l.ts >= r.ts` — O(n·m) per key after the equi part) or a per-key
  * `collect_list` + binary search (memory-bound on hot keys). This
  * operator instead tags both inputs, unions them, and runs ONE window
  * pass per key ordered by (ts, tag): a right row's payload is carried
  * forward by `last(..., ignoreNulls)` until the next right row, so each
  * left row reads the payload of its immediate predecessor. Cost is a
  * single hash shuffle of |L|+|R| rows plus a per-partition sort —
  * the same plan shape as one window aggregate, fully parallel across
  * keys, no row expansion. That is the 100 TB design: joining a 100 TB
  * event stream to per-key reference updates shuffles each side once,
  * regardless of how many left rows share a key.
  *
  * Semantics (backward): match right rows with `r.ts <= l.ts` (inclusive,
  * like DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`); left rows with no
  * prior right row keep null payload columns (left-outer). If several
  * right rows share (key, ts), the one greatest by `rightOrder` wins —
  * pass the right side pre-deduplicated or give a unique tiebreak column
  * for deterministic output.
  *
  * Output: all left columns, plus the right payload columns (right
  * columns minus keys/timestamp), plus the matched right timestamp as
  * `asofTsName`.
  */
object AsofJoin {

  /** Latest right row at-or-before each left row's timestamp. */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
               rightOrder: Seq[String] = Nil,
               asofTsName: String = "asof_ts"): DataFrame =
    join(left, right, keys, tsCol, rightOrder, asofTsName, forward = false)

  /** Earliest right row at-or-after each left row's timestamp. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
              rightOrder: Seq[String] = Nil,
              asofTsName: String = "asof_ts"): DataFrame =
    join(left, right, keys, tsCol, rightOrder, asofTsName, forward = true)

  private def join(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
                   rightOrder: Seq[String], asofTsName: String,
                   forward: Boolean): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one equi key")
    val commonCols = keys :+ tsCol
    val leftPayload = left.columns.filterNot(commonCols.contains)
    val rightPayload = right.columns.filterNot(commonCols.contains)
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"ambiguous payload columns: ${leftPayload.intersect(rightPayload).mkString(", ")} — rename one side")
    require(rightOrder.forall(rightPayload.contains),
      "rightOrder columns must be right payload columns")

    // Unified schema for the tagged union: keys, ts, tag, tiebreaks,
    // right payload as one struct (so one ignoreNulls last() carries it),
    // left payload (null on right rows).
    val payloadStruct = struct(
      rightPayload.toIndexedSeq.map(col) :+ col(tsCol).as(asofTsName): _*)
    val rightTagged = right.select(
      commonCols.map(col) ++
        Seq(lit(0).as("__asof_tag"), payloadStruct.as("__asof_payload")) ++
        rightOrder.zipWithIndex.map { case (c, i) => col(c).as(s"__asof_ord$i") } ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val payloadType = rightTagged.schema("__asof_payload").dataType
    val leftTagged = left.select(
      commonCols.map(col) ++
        Seq(lit(1).as("__asof_tag"), lit(null).cast(payloadType).as("__asof_payload")) ++
        rightOrder.zipWithIndex.map { case (c, i) =>
          lit(null).cast(right.schema(c).dataType).as(s"__asof_ord$i") } ++
        leftPayload.map(col): _*)

    // Backward scans time ascending; forward scans descending. Either
    // way right rows (tag 0) sort before left rows at equal ts, giving
    // inclusive at-or-before / at-or-after semantics.
    val ts = col(tsCol)
    val ordering: Seq[Column] =
      (if (forward) ts.desc else ts.asc) +: col("__asof_tag").asc +:
        rightOrder.indices.map(i => col(s"__asof_ord$i").asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = rightTagged.unionByName(leftTagged)
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_tag") === 1)
    matched.select(
      commonCols.map(col) ++ leftPayload.map(col) ++
        rightPayload.map(c => col(s"__asof_match.$c").as(c)) :+
        col(s"__asof_match.$asofTsName").as(asofTsName): _*)
  }
}
