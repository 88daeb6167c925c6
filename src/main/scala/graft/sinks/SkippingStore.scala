package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone-map data skipping: the min/max file-pruning layout every lake
  * table format (Delta, Iceberg, Hudi) builds on, in pure Spark — the
  * storage-side complement to partition pruning (q123) for columns too
  * fine-grained to be directory keys.
  *
  * Write side: range-partition + sort the table by the skipping column,
  * so each parquet file covers a narrow, mostly-disjoint value range,
  * then record one (file, min, max) row per file in a `_zonemap`
  * parquet colocated under the store (underscore-prefixed paths are
  * invisible to Spark's directory reads, the `_delta_log` convention).
  * Read side: prune the file LIST against the predicate driver-side —
  * the zone map is file-count-sized, never data-sized — and hand Spark
  * only the surviving files, with the residual row filter (and its
  * parquet pushdown) still applied on top.
  *
  * At 100 TB the effect is the q123 one: a selective range query opens
  * a handful of files instead of listing-then-row-filtering the whole
  * table, and the layout cost is paid once at write time. The sort also
  * tightens parquet row-group statistics, so even the surviving files
  * row-group-skip internally.
  *
  * Reference analog: the post-load staging indexes of
  * Temp/WithPostgresql.pm:30-51 — pay at write time for selective
  * reads — translated to Spark's immutable-file storage model.
  */
object SkippingStore {

  /** Write `df` as `nFiles` range-partitioned, internally sorted parquet
    * files under `dir`, plus the `_zonemap` index. One extra metadata
    * pass over the written store builds the map (at scale this folds
    * into the writer's task-commit statistics; a separate pass keeps
    * the demonstration engine-agnostic). */
  def write(df: DataFrame, sortCol: String, dir: String, nFiles: Int): Unit = {
    require(nFiles >= 1, "need at least one file")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(sortCol)).as("zmin"), max(col(sortCol)).as("zmax"))
      .coalesce(1) // file-count-sized by construction
      .write.mode("overwrite").parquet(s"$dir/_zonemap")
  }

  /** The zone map as a DataFrame (one row per data file). */
  def zoneMap(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/_zonemap")

  /** Read only the files whose [zmin, zmax] range intersects [lo, hi],
    * with the exact residual filter applied on top. The prune happens
    * on the driver over the file-count-sized zone map — the same shape
    * as a lake format's manifest scan. Returns (survivingFiles,
    * totalFiles, frame); an empty survivor set yields an empty frame
    * with the store's schema. */
  def readPruned(spark: SparkSession, dir: String, sortCol: String,
                 lo: Column, hi: Column): (Long, Long, DataFrame) = {
    val zm = zoneMap(spark, dir).cache()
    try {
      val total = zm.count()
      val files = zm.filter(col("zmax") >= lo && col("zmin") <= hi)
        .select(col("file")).collect().map(_.getString(0))
      val residual = (d: DataFrame) =>
        d.filter(col(sortCol) >= lo && col(sortCol) <= hi)
      if (files.isEmpty)
        (0L, total, residual(spark.read.parquet(dir)).limit(0))
      else
        (files.length.toLong, total,
          residual(spark.read.parquet(files.toIndexedSeq: _*)))
    } finally zm.unpersist()
  }
}
