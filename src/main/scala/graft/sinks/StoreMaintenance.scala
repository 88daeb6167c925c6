package graft.sinks

import org.apache.spark.sql.SparkSession
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
  * Both read-then-overwrite, with `localCheckpoint` breaking the
  * read-your-own-write cycle — the same guard the merge DAGs use.
  * On a real cluster the rewrite would land in a new directory +
  * atomic swap; local overwrite keeps the spec-able semantics.
  */
object StoreMaintenance {

  private def dirBytes(dir: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(dir))
  }

  /** Rewrite the store at `dir` into ≈ `targetBytes`-sized files.
    * Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int) = {
    def parquetFiles(d: String): Int = {
      def walk(f: java.io.File): Int =
        if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      walk(new java.io.File(d))
    }
    val before = parquetFiles(dir)
    val nFiles = math.max(1L, (dirBytes(dir) + targetBytes - 1) / targetBytes).toInt
    val data = spark.read.parquet(dir).localCheckpoint()
    data.repartition(nFiles).write.mode("overwrite").parquet(dir)
    (before, parquetFiles(dir))
  }

  /** Retention rewrite: keep only rows whose `tsCol` is at or after
    * `cutoff` (an ISO timestamp/date string). Returns rows dropped. */
  def expire(spark: SparkSession, dir: String, tsCol: String,
             cutoff: String): Long = {
    val data = spark.read.parquet(dir).localCheckpoint()
    val keep = data.filter(col(tsCol) >= lit(cutoff))
    val dropped = data.count() - keep.count()
    keep.write.mode("overwrite").parquet(dir)
    dropped
  }
}
