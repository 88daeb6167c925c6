package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-store housekeeping: the two maintenance passes every
  * long-lived table needs at scale.
  *
  * - [[compact]]: streaming/incremental appends leave small files; a
  *   100 TB table with 10 MB files is 10M tasks per scan and a
  *   NameNode/metadata hazard. Rewriting to ~`targetBytes` files
  *   restores scan efficiency (task count ≈ bytes / maxPartitionBytes).
  * - [[expire]]: retention deletes (TTL) as a rewrite keeping only
  *   surviving rows — the set-based delete shape (anti-filter), not a
  *   row-at-a-time mutation.
  *
  * Both write the rewritten table to a sibling temp directory first and
  * swap it into place only after the write completes — the source
  * directory stays intact (and readable) until the replacement is fully
  * on disk, so a crash mid-rewrite can never lose the table. All
  * filesystem work goes through the Hadoop `FileSystem` API
  * ([[HadoopSwap]]), so the same code runs against `file:` and `hdfs:`
  * roots; object stores without atomic rename should route rewrites
  * through [[VersionedStore]] manifest commits instead.
  */
object StoreMaintenance {

  /** Write `df` (which may read from `dir`) to a temp sibling, then swap
    * it in: rename the live dir aside, move the replacement in, delete
    * the aside copy last. A complete copy of the data exists on disk at
    * every instant — the only crash window is between the two renames,
    * after which the old store survives under the deterministic
    * `<dir>.old-*` name for manual recovery (a delete-then-move swap
    * would instead leave NO live store, and a crash there silently
    * rebuilds from the next delta alone). */
  private[graft] def overwriteViaSwap(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    val stamp = System.nanoTime()
    val tmp = dir + ".rewrite-" + stamp
    val aside = dir + ".old-" + stamp
    df.write.mode("overwrite").parquet(tmp)
    HadoopSwap.swapInto(spark, tmp, dir, aside)
  }

  /** Rewrite the store at `dir` into ≈ `targetBytes`-sized files.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int) = {
    val before = HadoopSwap.parquetFileCount(spark, dir)
    val bytes = HadoopSwap.dirBytes(spark, dir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    overwriteViaSwap(spark.read.parquet(dir).repartition(nFiles), dir)
    (before, HadoopSwap.parquetFileCount(spark, dir))
  }

  /** Retention rewrite: keep only rows whose `tsCol` is at or after
    * `cutoff` (an ISO timestamp/date string). Returns rows dropped. */
  def expire(spark: SparkSession, dir: String, tsCol: String,
             cutoff: String): Long = {
    val data = spark.read.parquet(dir)
    val total = data.count()
    val keep = data.filter(col(tsCol) >= lit(cutoff))
    overwriteViaSwap(keep, dir)
    total - spark.read.parquet(dir).count()
  }
}
