package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Hadoop-`FileSystem` primitives shared by every store rewrite path
  * (compaction, TTL expiry, postings-store compaction) — the same API
  * family [[VersionedStore]] and [[Constraints]] already use, so the
  * rename-aside swap works identically on `file:` and `hdfs:` roots.
  * `java.io.File` walks only ever worked on local disk; at 100 TB the
  * store lives on a cluster filesystem and every maintenance pass must
  * go through the Hadoop abstraction.
  *
  * Object-store caveat: S3-style stores have no atomic directory
  * rename — the swap degrades to copy+delete with a visible window.
  * Route rewrites there through the [[VersionedStore]] manifest commit
  * (write new files, commit a manifest, vacuum later) instead of
  * directory swaps; HDFS and local FS renames are metadata-only and
  * safe.
  */
object HadoopSwap {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir))

  def deleteRecursive(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (f.exists(p)) { f.delete(p, true); () }
  }

  private def renameOrThrow(f: FileSystem, src: Path, dst: Path): Unit =
    require(f.rename(src, dst),
      s"rename $src -> $dst failed — aborting swap with the source intact")

  /** Swap a fully-written `tmp` directory into place at `dir` with the
    * rename-aside crash discipline: rename the live dir to `aside`,
    * rename `tmp` in, delete the aside copy last. A complete copy of
    * the data exists on disk at every instant; the only crash window
    * (between the two renames) leaves the old store recoverable under
    * the deterministic `aside` name. A failed rename throws with the
    * source untouched rather than proceeding to a torn state. */
  def swapInto(spark: SparkSession, tmp: String, dir: String,
               aside: String): Unit = {
    val f = fs(spark, dir)
    val (pt, pd, pa) = (new Path(tmp), new Path(dir), new Path(aside))
    // verify the replacement exists BEFORE renaming the live dir aside:
    // failing after the aside rename would leave no live store
    require(f.exists(pt), s"replacement $tmp missing — live store untouched")
    if (f.exists(pd)) {
      renameOrThrow(f, pd, pa)
      renameOrThrow(f, pt, pd)
      f.delete(pa, true); ()
    } else renameOrThrow(f, pt, pd)
  }

  /** Recursive byte size of `dir` (data plus sidecars — the compaction
    * sizing input, matching what a rewrite will rewrite). */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) 0L else f.getContentSummary(p).getLength
  }

  /** Count `*.parquet` files under `dir`, recursing into partition and
    * sidecar subdirectories — the before/after metric of a rewrite. */
  def parquetFileCount(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) return 0
    val it = f.listFiles(p, true)
    var n = 0
    while (it.hasNext)
      if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }
}
