package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed surrogate-id allocation (SURVEY.md §7 risk 2): the
  * reference delegates ids to database sequences
  * (`nextval('feature_feature_id_seq')`, Staging/Postgresql.pm:28-33);
  * a Spark merge needs dense, unique, deterministic ids WITHOUT a global
  * window (one partition) and WITHOUT `monotonically_increasing_id`
  * (non-contiguous, unstable across retries).
  *
  * The scalable form is two-phase range allocation:
  *   1. sort rows into range partitions by the natural key (makes the
  *      partition layout — and therefore every id — a pure function of
  *      the data);
  *   2. count each partition, prefix-sum the counts on the driver
  *      (#partitions longs, not rows), and assign
  *      `base + partitionOffset + localIndex` per partition.
  *
  * q48 demonstrates the oracle-expressible single-window form; this is
  * the 1000-executor form of the same contract, spec'd for density,
  * uniqueness, and determinism.
  */
object IdAllocate {

  /** Append an `id` column: dense ids starting at `base + 1`, ordered by
    * `keyCol` (globally — range partitioning + local index), stable
    * across retries and re-runs for identical input. */
  def denseIds(df: DataFrame, keyCol: String, base: Long): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(col(keyCol))
      .sortWithinPartitions(col(keyCol))
    val withLocal = ranged.rdd.mapPartitionsWithIndex(
      { (pid, rows) =>
        rows.zipWithIndex.map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ pid.toLong :+ i.toLong)
        }
      }, preservesPartitioning = true)
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("__pid", LongType), StructField("__idx", LongType)))
    val tmp = spark.createDataFrame(withLocal, schema)
    // per-partition counts -> driver-side prefix sums (#partitions longs)
    val counts = tmp.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (counts.isEmpty) {
      tmp.withColumn("id", lit(base) + lit(1)).drop("__pid", "__idx")
    } else {
      var acc = 0L
      val offsets = counts.keys.toSeq.sorted.map { pid =>
        val off = acc; acc += counts(pid); pid -> off
      }
      val offsetMap = map(offsets.flatMap {
        case (pid, off) => Seq(lit(pid), lit(off)) }: _*)
      tmp.withColumn("id",
        lit(base) + lit(1) + element_at(offsetMap, col("__pid")) + col("__idx"))
        .drop("__pid", "__idx")
    }
  }
}
