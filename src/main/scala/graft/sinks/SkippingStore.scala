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

  /** Append `df` to an existing store and extend the zone map by
    * scanning ONLY the newly written files: the store's immutable-file
    * model means an append never touches existing zone rows, so the
    * index update costs one pass over the appended data, not the
    * table. New files are the directory listing minus the files the
    * zone map already describes (both driver-side, file-count-sized).
    * Appended batches are each internally range-sorted; their value
    * ranges may overlap older files' — pruning stays correct (zone
    * intersection is per-file) and only loses selectivity, which a
    * periodic compaction rewrite (`write`) restores. */
  def append(df: DataFrame, sortCol: String, dir: String, nFiles: Int): Unit = {
    require(nFiles >= 1, "need at least one file")
    df.repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("append").parquet(dir)
    val spark = df.sparkSession
    val known = zoneMap(spark, dir).select(col("file"))
      .collect().map(_.getString(0)).toSet
    val newFiles = listDataFiles(dir).filterNot(known)
    if (newFiles.nonEmpty)
      spark.read.parquet(newFiles.toIndexedSeq: _*)
        .groupBy(input_file_name().as("file"))
        .agg(min(col(sortCol)).as("zmin"), max(col(sortCol)).as("zmax"))
        .coalesce(1)
        .write.mode("append").parquet(s"$dir/_zonemap")
  }

  /** The store's data files as the `file:` URIs `input_file_name`
    * reports, so listing and zone-map keys compare equal. */
  private def listDataFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array())
      .filter(f => f.isFile && f.getName.startsWith("part-")
        && f.getName.endsWith(".parquet"))
      .map(_.toURI.toString.replaceFirst("^file:/", "file:///"))
      .toSeq

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
