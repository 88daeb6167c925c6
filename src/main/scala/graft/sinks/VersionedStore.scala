package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Snapshot-versioned parquet store with time travel — the commit-log
  * core of every lake table format (Delta's `_delta_log`, Iceberg's
  * snapshot manifests) in pure Spark primitives.
  *
  * Layout: data files are immutable and accumulate flat under the store
  * dir; each commit writes a MANIFEST (one parquet row per member file
  * name) to `_versions/_tmp-*` and atomically renames it to
  * `_versions/v<n>`. The rename is the commit point: readers resolve a
  * version to its manifest's file list and read exactly those files, so
  * a crash mid-commit leaves either no new version (temp manifest only)
  * or a complete one — never a torn snapshot. An append commit's
  * manifest is the previous file set plus the new files; an overwrite
  * commit's is the new files alone, with the old data files retained on
  * disk so every earlier version stays readable (time travel) until
  * [[vacuum]] reclaims them.
  *
  * At 100 TB this is the concurrency/e2e-retry story a mutable
  * directory can't give: writers never modify live files, readers pin a
  * version for the whole job (no torn reads under concurrent appends),
  * failed jobs retry by re-committing without cleanup, and the manifest
  * is file-count-sized — the driver never touches data-sized state.
  *
  * Reference analog: the reference's obsolete-and-replace update model
  * (`lib/Modware/Loader/GAF.pm` keeps superseded rows queryable until a
  * cleanup pass) — generalized to whole-table snapshots on immutable
  * storage.
  */
object VersionedStore {

  private val VersionsDir = "_versions"
  private val VPrefix = "v"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFileNames(spark: SparkSession, dir: String): Set[String] = {
    val p = new Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Set.empty
    else f.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .toSet
  }

  /** All committed version numbers under `dir`, ascending. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new Path(s"$dir/$VersionsDir")
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith(VPrefix))
      .flatMap(n => scala.util.Try(n.drop(VPrefix.length).toLong).toOption)
      .sorted.toSeq
  }

  /** Schema identity up to nullability/metadata (parquet round-trips
    * every column as nullable, so exact StructType equality would
    * reject a re-commit of the store's own data). */
  private def shape(s: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => (f.name, f.dataType.catalogString))

  private def manifestPath(dir: String, v: Long): String =
    f"$dir/$VersionsDir/$VPrefix$v%010d"

  private def manifestFiles(spark: SparkSession, dir: String, v: Long): Set[String] =
    spark.read.parquet(manifestPath(dir, v))
      .select(col("file")).collect().map(_.getString(0)).toSet

  /** The data-file names a committed version's manifest records —
    * the immutable identity of the snapshot ([[graft.sinks.Constraints]]
    * stamps it for version-pinned constraint declarations). */
  def snapshotFiles(spark: SparkSession, dir: String, version: Long): Set[String] = {
    require(versions(spark, dir).contains(version),
      s"version $version does not exist in $dir")
    manifestFiles(spark, dir, version)
  }

  /** Does `dir` carry a VersionedStore commit log? */
  def isVersioned(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(s"$dir/$VersionsDir"))

  /** Commit `df` as a new version: `overwrite = false` appends to the
    * latest snapshot's file set, `true` replaces it (old versions stay
    * readable). Returns the new version number. The data write lands
    * first; the snapshot exists only once the manifest rename — the
    * atomic commit point — succeeds. */
  def commit(df: DataFrame, dir: String, nFiles: Int,
             overwrite: Boolean = false, tag: Option[Long] = None): Long = {
    require(nFiles >= 1, "need at least one file")
    val spark = df.sparkSession
    val prior = versions(spark, dir)
    val base: Set[String] =
      if (overwrite || prior.isEmpty) Set.empty
      else manifestFiles(spark, dir, prior.last)
    // append commits must match the live schema (an overwrite may
    // evolve it — old versions keep their own schema); catching this at
    // commit time beats a planner error in some later reader
    if (!overwrite && prior.nonEmpty && base.nonEmpty) {
      val live = read(spark, dir, prior.last).schema
      require(shape(df.schema) == shape(live),
        s"append commit schema ${df.schema.simpleString} does not match " +
          s"version ${prior.last}'s ${live.simpleString} — commit with " +
          "overwrite to evolve the schema")
    }
    // stage under a commit-private directory and move EXACTLY those
    // files in: a shared-directory diff (list-write-list) would absorb
    // any file a concurrent committer lands between the two listings
    // into THIS commit's manifest — its rows would then surface twice
    // once the loser retries. Part-file names carry write-job UUIDs,
    // so the moves can't collide; a crash before the manifest rename
    // leaves only orphaned data files for vacuum, never a torn
    // snapshot.
    val staging = s"$dir/$VersionsDir/_staging-${java.util.UUID.randomUUID()}"
    df.repartition(nFiles).write.mode("overwrite").parquet(staging)
    val f0 = fs(spark, dir)
    val added = f0.listStatus(new Path(staging)).filter(_.isFile)
      .map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .toSet
    added.foreach { n =>
      require(f0.rename(new Path(s"$staging/$n"), new Path(s"$dir/$n")),
        s"commit staging move of $n failed — retry the commit")
    }
    f0.delete(new Path(staging), true)
    val snapshot = (base ++ added).toSeq.sorted
    val v = prior.lastOption.getOrElse(0L) + 1
    val tmp = s"$dir/$VersionsDir/_tmp-${java.util.UUID.randomUUID()}"
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        snapshot.map(f => org.apache.spark.sql.Row(f, tag.map(Long.box).orNull)), 1),
      StructType(Seq(
        StructField("file", StringType, nullable = false),
        StructField("tag", LongType, nullable = true))))
      .write.mode("overwrite").parquet(tmp)
    val f = fs(spark, dir)
    require(f.rename(new Path(tmp), new Path(manifestPath(dir, v))),
      s"commit of version $v failed: manifest rename refused (concurrent " +
        s"committer?) — data files are orphaned, not corrupted; retry commits")
    v
  }

  /** Read the snapshot at `version` (latest when omitted) — exactly the
    * manifest's files, independent of anything committed since. Fails
    * loudly if a member file is missing (vacuumed too aggressively or
    * foreign delete) instead of silently dropping rows. */
  /** The versioned-manifest and tombstoned-delete disciplines must not
    * silently compose: a manifest read knows nothing about a pending
    * `_tombstones` sidecar (TextIndex/Similarity deletes), so serving
    * a snapshot from such a dir would resurrect every tombstoned row.
    * Nothing in this engine writes both into one dir — this guard
    * catches the foreign/mis-pointed case loud instead of wrong. */
  private def requireNoTombstones(spark: SparkSession, dir: String,
                                  op: String): Unit = {
    // a tombstone sidecar parked under a fold-crash aside must still
    // trip this guard — restore before the existence check
    SidecarFold.restoreAside(spark, s"$dir/_tombstones")
    require(!fs(spark, dir).exists(new Path(s"$dir/_tombstones")),
      s"$dir carries a _tombstones sidecar — $op would silently ignore " +
        "pending tombstoned deletes; purge via the owning store's " +
        "compact() before versioned reads")
  }

  def read(spark: SparkSession, dir: String, version: Long = -1L): DataFrame = {
    requireNoTombstones(spark, dir, "a versioned read")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"$dir has no committed versions")
    val v = if (version < 0) vs.last else version
    require(vs.contains(v), s"version $v does not exist in $dir (have $vs)")
    val files = manifestFiles(spark, dir, v)
    if (files.isEmpty) return spark.read.parquet(dir).limit(0)
    val present = dataFileNames(spark, dir)
    val missing = files -- present
    require(missing.isEmpty,
      s"version $v of $dir references ${missing.size} missing data files " +
        s"${missing.take(3).mkString("(", ",", ")")} — vacuumed past it?")
    spark.read.parquet(files.toSeq.sorted.map(n => s"$dir/$n"): _*)
  }

  /** File-level change set between two versions: one row per file that
    * is in exactly one of the two snapshots, `change` = added/removed
    * (w.r.t. the older-to-newer direction). Manifest-sized, never
    * touches data. */
  def diff(spark: SparkSession, dir: String, from: Long, to: Long): DataFrame = {
    import spark.implicits._
    val a = manifestFiles(spark, dir, from)
    val b = manifestFiles(spark, dir, to)
    ((b -- a).toSeq.sorted.map(f => (f, "added")) ++
      (a -- b).toSeq.sorted.map(f => (f, "removed")))
      .toDF("file", "change")
  }

  /** The commit tag of the LATEST version (None when untagged or the
    * store predates tags). Tags carry the streaming sink's micro-batch
    * id INSIDE the atomic manifest rename, so the exactly-once gate and
    * the data commit cannot drift — the lake-format `txn` record. */
  def lastTag(spark: SparkSession, dir: String): Option[Long] = {
    val vs = versions(spark, dir)
    if (vs.isEmpty) return None
    val m = spark.read.parquet(manifestPath(dir, vs.last))
    if (!m.columns.contains("tag")) None
    else m.select(col("tag")).limit(1).collect()
      .headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
  }

  /** Commit history, manifest-sized: one row per version with its file
    * count and tag (Delta's DESCRIBE HISTORY shape). Never reads data
    * files. */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    versions(spark, dir).map { v =>
      val m = spark.read.parquet(manifestPath(dir, v))
      val nFiles = m.count()
      val tag =
        if (!m.columns.contains("tag")) None
        else m.select(col("tag")).limit(1).collect()
          .headOption.flatMap(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
      (v, nFiles, tag)
    }.toDF("version", "n_files", "tag")
  }

  /** Row-level change set between two snapshots — the CDC export shape.
    * Because data files are immutable, rows in files PRESENT IN BOTH
    * manifests cannot have changed, so only the file-level delta is
    * read: cost is proportional to the files that changed between the
    * versions, not the table (at 100 TB an append-heavy table diffs in
    * seconds). Within the delta, `exceptAll` cancels rows that merely
    * moved between files (compaction), leaving true adds/removes with
    * multiplicity. Returns the data columns plus `change` =
    * added/removed (w.r.t. `from` → `to`). */
  def rowDiff(spark: SparkSession, dir: String, from: Long, to: Long): DataFrame = {
    requireNoTombstones(spark, dir, "rowDiff")
    val a = manifestFiles(spark, dir, from)
    val b = manifestFiles(spark, dir, to)
    def readSet(files: Set[String]): DataFrame =
      if (files.isEmpty) read(spark, dir, to).limit(0)
      else spark.read.parquet(files.toSeq.sorted.map(n => s"$dir/$n"): _*)
    val addedRows = readSet(b -- a)
    val removedRows = readSet(a -- b)
    require(shape(addedRows.schema) == shape(removedRows.schema),
      s"cannot row-diff across a schema change: v$from has " +
        s"${removedRows.schema.simpleString}, v$to has " +
        s"${addedRows.schema.simpleString} — use diff() for the file-level view")
    addedRows.exceptAll(removedRows).withColumn("change", lit("added"))
      .unionByName(
        removedRows.exceptAll(addedRows).withColumn("change", lit("removed")))
  }

  /** Compact the LATEST snapshot through the manifest route: rewrite
    * its rows into `nFiles` fresh data files and commit them as a new
    * OVERWRITE version. No directory is ever renamed or swapped — the
    * commit point is the one manifest rename the store already relies
    * on — so this is the compaction discipline for object stores,
    * where [[HadoopSwap]]'s rename-aside swap degrades to copy+delete
    * with a visible window ([[StoreMaintenance]]/compactIvfStore are
    * the HDFS/local-FS fast path). Every earlier version stays
    * time-travel-readable (superseded files are retained until
    * [[vacuum]]), the row set is identical by construction
    * ([[rowDiff]] across the compaction is empty — immutable files
    * mean moved rows cancel), and a crash at any point leaves either
    * the old latest or the new one, never a torn store. Returns
    * (newVersion, filesBefore, filesAfter). */
  def compactVersioned(spark: SparkSession, dir: String,
                       nFiles: Int): (Long, Int, Int) = {
    require(nFiles >= 1, "need at least one file")
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"$dir has no committed versions to compact")
    val before = manifestFiles(spark, dir, vs.last).size
    // reading the latest snapshot while committing is safe: member
    // files are immutable and the commit stages into a private dir
    val v = commit(read(spark, dir, vs.last), dir, nFiles, overwrite = true)
    (v, before, manifestFiles(spark, dir, v).size)
  }

  /** Reclaim storage: drop all but the newest `keepLast` versions, then
    * delete data files no surviving manifest references. Manifests go
    * first so no retained version can ever point at a deleted file; a
    * crash in between leaves only harmless orphan data files that the
    * next vacuum sweeps. Returns (versionsDropped, filesDeleted). */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int): (Int, Int) = {
    require(keepLast >= 1, "must keep at least one version")
    val f = fs(spark, dir)
    val vs = versions(spark, dir)
    val dropped = vs.dropRight(keepLast)
    dropped.foreach(v => f.delete(new Path(manifestPath(dir, v)), true))
    val live = versions(spark, dir)
      .flatMap(v => manifestFiles(spark, dir, v)).toSet
    val orphans = (dataFileNames(spark, dir) -- live).toSeq.sorted
    orphans.foreach(n => f.delete(new Path(s"$dir/$n"), false))
    (dropped.size, orphans.size)
  }

  /** Drop the store entirely (tests/scratch lifecycles). */
  def destroy(spark: SparkSession, dir: String): Unit = {
    fs(spark, dir).delete(new Path(dir), true): Unit
  }
}
