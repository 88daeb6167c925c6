package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Declared, VERIFIED table constraints for parquet stores — the
  * `_constraints` sidecar behind [[graft.plans.JoinEliminationRule]].
  *
  * A `unique(col)` declaration is checked against the data at
  * declaration time (one aggregation pass; duplicate non-null keys
  * refuse loudly) and stamped with the store's exact data-file set.
  * The stamp is the invalidation mechanism: a verifier only trusts the
  * constraint while the stamped set equals the current files, so any
  * append/compact/overwrite — which could silently break uniqueness —
  * self-invalidates the declaration without the writers needing to
  * know constraints exist. Re-declare after maintenance to re-verify.
  *
  * Nulls: uniqueness is enforced over NON-NULL keys only. SQL equality
  * never matches NULL, so duplicate null keys cannot fan out a join —
  * exactly the semantics join elimination needs.
  */
object Constraints {

  /** Verify `keyCol` is unique (among non-null values) and persist the
    * declaration stamped with the store's file identity. Throws on
    * duplicates; overwrites only a previous declaration with the SAME
    * declaration id (the plain store's live stamp, or the same pinned
    * version).
    *
    * On a PLAIN store the stamp is the current `part-*.parquet` set,
    * so any append/compact/overwrite self-invalidates. On a
    * [[VersionedStore]] (a `_versions/` commit log exists) the
    * verification runs over a PINNED snapshot (`version`, latest when
    * -1) and the stamp is that version's manifest file set — snapshots
    * are immutable, so the declaration stays valid for pinned reads of
    * that version FOREVER, across any number of later commits, while a
    * read of any other version (different file set) refuses. Stamps
    * are KEYED by version (`decl` = v<n>), so declaring on a later
    * snapshot coexists with earlier versions' declarations instead of
    * disarming them — every declared version stays armed at once.
    * That is what lets join/DISTINCT elimination fire on time-travel
    * reads. */
  def declareUnique(spark: SparkSession, dir: String, keyCol: String,
                    version: Long = -1L): Unit = {
    val versioned = VersionedStore.isVersioned(spark, dir)
    require(versioned || version < 0,
      s"declareUnique($dir, $keyCol): version pinning needs a versioned store")
    val (df, stampFiles, decl) =
      if (versioned) {
        val v = if (version < 0) VersionedStore.versions(spark, dir).last
                else version
        (VersionedStore.read(spark, dir, v),
          VersionedStore.snapshotFiles(spark, dir, v), s"v$v")
      } else (spark.read.parquet(dir), dataFileNames(spark, dir), LiveDecl)
    val dup = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).count()
    require(dup == 0L,
      s"declareUnique($dir, $keyCol): duplicate non-null keys present")
    // null keys at declaration time: uniqueness tolerates them (SQL
    // equality never matches NULL), but DISTINCT elimination does not
    // (null = null in grouping), so the count rides the declaration
    val nnulls = df.filter(col(keyCol).isNull).count()
    import spark.implicits._
    writeSidecar(spark, dir, keyCol, decl,
      stampFiles.toSeq.sorted
        .map(f => ("unique", keyCol, decl, f, nnulls))
        .toDF("constraint", "col", "decl", "file", "nnulls"))
  }

  /** The declaration id of a PLAIN (unversioned) store's stamp — one
    * live declaration per column, overwritten on re-declare. Versioned
    * stores key declarations by their pinned version (`v<n>`), so
    * declaring on a later snapshot COEXISTS with earlier versions'
    * stamps — each stays armed for pinned reads of its own version. */
  private val LiveDecl = "live"

  /** Rewrite the `_constraints` sidecar with `rows` for
    * (`keyCol`, `decl`), carrying every OTHER (column, declaration)
    * pair over verbatim — their stamps keep their own validity
    * lifecycle, including other versions' stamps on the same column. */
  private def writeSidecar(spark: SparkSession, dir: String, keyCol: String,
                           decl: String,
                           rows: org.apache.spark.sql.DataFrame): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_constraints")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val others =
      if (!fs.exists(p)) None
      else {
        val sc = spark.read.parquet(s"$dir/_constraints")
        // legacy schemas (pre-nnulls or pre-decl): drop and rebuild
        if (!sc.columns.contains("nnulls") || !sc.columns.contains("decl")) None
        else Some(sc
          .filter(!(col("col") === keyCol && col("decl") === decl))
          .select(col("constraint"), col("col"), col("decl"), col("file"),
            col("nnulls"))
          .collect().toSeq)
      }
    val all = others match {
      case Some(rest) if rest.nonEmpty =>
        import spark.implicits._
        rows.unionByName(rest.map(r => (r.getString(0), r.getString(1),
            r.getString(2), r.getString(3), r.getLong(4)))
          .toDF("constraint", "col", "decl", "file", "nnulls"))
      case _ => rows
    }
    val tmp = s"$dir/_constraints_tmp"
    all.coalesce(1).write.mode("overwrite").parquet(tmp)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p): Unit
  }

  /** Every unique declaration recorded for `keyCol`, one entry per
    * declaration id: its stamped file set and null count (None when
    * the stamps conflict within the declaration). Pre-decl sidecars
    * read as a single declaration. */
  private def uniqueDecls(spark: SparkSession, dir: String,
                          keyCol: String): Seq[(Set[String], Option[Long])] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_constraints")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    val sc = spark.read.parquet(s"$dir/_constraints")
    if (!sc.columns.contains("nnulls")) return Seq.empty // legacy: re-declare
    val hasDecl = sc.columns.contains("decl")
    val rows = sc.filter(col("constraint") === "unique" && col("col") === keyCol)
      .select(col("file"), col("nnulls"),
        (if (hasDecl) col("decl") else lit(LiveDecl)).as("decl"))
      .collect()
    rows.groupBy(_.getString(2)).values.map { rs =>
      val ns = rs.map(_.getLong(1)).distinct
      (rs.map(_.getString(0)).toSet,
        if (ns.length == 1) Some(ns.head) else None)
    }.toSeq
  }

  /** Is there a CURRENTLY-VALID unique declaration for `keyCol`? True
    * only when the sidecar exists, carries the column, and one
    * declaration's stamped file set exactly matches the store's data
    * files (any drift — appends, compaction, overwrite — reads as
    * "not declared"). */
  def verifiedUnique(spark: SparkSession, dir: String, keyCol: String): Boolean =
    verifiedUniqueFor(spark, dir, keyCol, dataFileNames(spark, dir))

  /** [[verifiedUnique]] against an EXPLICIT file set — the pinned-read
    * form: a version-pinned [[VersionedStore]] read is an explicit
    * file list, and its constraint is valid exactly when SOME stamped
    * declaration equals the files actually being read (the snapshot's
    * manifest). Declarations are keyed per version, so stamping a
    * later snapshot never disarms an earlier one. */
  def verifiedUniqueFor(spark: SparkSession, dir: String, keyCol: String,
                        files: Set[String]): Boolean =
    files.nonEmpty &&
      uniqueDecls(spark, dir, keyCol).exists(_._1 == files)

  /** Extend a unique declaration after an append instead of paying the
    * full re-verification: only the NEW files' keys are checked —
    * internally unique, and disjoint from the stamped files' keys via
    * a key-column-only left-semi join (batch-sized build side; the old
    * side reads one column, not the store) — then the declaration is
    * restamped over the full current file set with the null count
    * rolled forward. Cost is O(batch) + one key-column scan, vs the
    * full groupBy over n+m keys of [[declareUnique]] — the difference
    * between constraint maintenance being per-batch and per-store
    * under streaming appends. Refusals leave the OLD stamp in place,
    * which no longer matches the current files, so the constraint
    * correctly reads invalid until the conflict is fixed or the store
    * re-declared. Pre-null-count declarations must re-declare. */
  def extendUnique(spark: SparkSession, dir: String, keyCol: String): Unit = {
    val scPath = new org.apache.hadoop.fs.Path(s"$dir/_constraints")
    val fs = scPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(scPath), s"extendUnique($dir, $keyCol): no declaration")
    // versioned stores stamp a snapshot manifest, not the raw dir: the
    // "new files" diff below would read OTHER versions' files — declare
    // on the new pinned version instead
    require(!VersionedStore.isVersioned(spark, dir),
      s"extendUnique($dir, $keyCol): versioned store — re-declare on the " +
        "new version (declareUnique with the version pin)")
    val scAll = spark.read.parquet(s"$dir/_constraints")
    require(scAll.columns.contains("nnulls") && scAll.columns.contains("decl"),
      s"extendUnique($dir, $keyCol): declaration predates the null-count/" +
        "decl stamps — re-run declareUnique once")
    val rows = scAll
      .filter(col("constraint") === "unique" && col("col") === keyCol &&
        col("decl") === LiveDecl)
      .select(col("file"), col("nnulls")).collect()
    require(rows.nonEmpty, s"extendUnique($dir, $keyCol): no unique($keyCol)")
    val stamped = rows.map(_.getString(0)).toSet
    val oldNnulls = rows.map(_.getLong(1)).distinct
    require(oldNnulls.length == 1,
      s"extendUnique($dir, $keyCol): conflicting null-count stamps")
    val current = dataFileNames(spark, dir)
    require(stamped.subsetOf(current),
      s"extendUnique($dir, $keyCol): stamped files missing — the store " +
        "was rewritten, re-run declareUnique")
    val newFiles = (current -- stamped).toSeq.sorted
    if (newFiles.isEmpty) return // nothing appended
    val newDf = spark.read.parquet(newFiles.map(f => s"$dir/$f"): _*)
    val dupNew = newDf.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).count()
    require(dupNew == 0L,
      s"extendUnique($dir, $keyCol): duplicate keys within the appended files")
    val oldDf = spark.read.parquet(stamped.toSeq.sorted.map(f => s"$dir/$f"): _*)
    val clash = oldDf.select(col(keyCol)).filter(col(keyCol).isNotNull)
      .join(newDf.select(col(keyCol)).filter(col(keyCol).isNotNull),
        Seq(keyCol), "left_semi")
      .limit(1).count()
    require(clash == 0L,
      s"extendUnique($dir, $keyCol): appended keys collide with the store")
    val nnulls = oldNnulls.head + newDf.filter(col(keyCol).isNull).count()
    import spark.implicits._
    writeSidecar(spark, dir, keyCol, LiveDecl,
      current.toSeq.sorted
        .map(f => ("unique", keyCol, LiveDecl, f, nnulls))
        .toDF("constraint", "col", "decl", "file", "nnulls"))
  }

  /** [[verifiedUnique]] AND the declaration recorded ZERO null keys —
    * the stronger property DISTINCT elimination needs: a unique
    * non-null key makes every row pairwise distinct on any column set
    * containing it, whereas duplicate NULL keys would still collapse
    * under DISTINCT (grouping treats null = null). Declarations
    * written before the null count existed answer false. */
  def verifiedUniqueNoNulls(spark: SparkSession, dir: String,
                            keyCol: String): Boolean = {
    val files = dataFileNames(spark, dir)
    // the null count must come from the MATCHING declaration — other
    // versions' stamps on the same column carry their own counts
    files.nonEmpty && uniqueDecls(spark, dir, keyCol)
      .exists(d => d._1 == files && d._2.contains(0L))
  }

  /** Declare a VERIFIED foreign key: every `fkCol` value in the fact
    * store is non-null and present in `dimDir.keyCol`, which must
    * already carry a currently-valid unique declaration (the dim half
    * of the integrity argument — without uniqueness an inner join
    * could duplicate fact rows; without totality it could drop them).
    * Verification is one anti-join (batch the fact's key column
    * against the dim's); the declaration stamps BOTH stores' file
    * sets, so an append to EITHER side self-invalidates. Powers
    * inner-join elimination in [[graft.plans.JoinEliminationRule]]. */
  def declareForeignKey(spark: SparkSession, factDir: String, fkCol: String,
                        dimDir: String, keyCol: String): Unit = {
    require(verifiedUnique(spark, dimDir, keyCol),
      s"declareForeignKey: $dimDir.$keyCol needs a valid unique declaration first")
    val fact = spark.read.parquet(factDir)
    require(fact.filter(col(fkCol).isNull).limit(1).count() == 0L,
      s"declareForeignKey($factDir.$fkCol): null keys would drop under an inner join")
    val orphans = fact.select(col(fkCol))
      .join(spark.read.parquet(dimDir).select(col(keyCol).as(fkCol)),
        Seq(fkCol), "left_anti")
      .limit(1).count()
    require(orphans == 0L,
      s"declareForeignKey($factDir.$fkCol): values missing from $dimDir.$keyCol")
    val refDir = qualified(spark, dimDir)
    val rows =
      dataFileNames(spark, factDir).toSeq.sorted
        .map(f => (fkCol, refDir, keyCol, "fact", f)) ++
      dataFileNames(spark, dimDir).toSeq.sorted
        .map(f => (fkCol, refDir, keyCol, "dim", f))
    writeFkSidecar(spark, factDir, fkCol, rows)
  }

  /** Rewrite the `_constraints_fk` sidecar with `rows` for `fkCol`,
    * carrying other fk columns' declarations over verbatim. */
  private def writeFkSidecar(spark: SparkSession, factDir: String,
                             fkCol: String,
                             rows: Seq[(String, String, String, String, String)]): Unit = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(s"$factDir/_constraints_fk")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val others =
      if (!fs.exists(p))
        Seq.empty[(String, String, String, String, String)]
      else spark.read.parquet(s"$factDir/_constraints_fk")
        .filter(col("fkcol") =!= fkCol).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4)))
    val tmp = s"$factDir/_constraints_fk_tmp"
    (rows ++ others).toDF("fkcol", "refdir", "refcol", "side", "file")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    fs.delete(p, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), p): Unit
  }

  /** Extend a foreign-key declaration after a FACT-side append instead
    * of paying the full anti-join re-verification: only the NEW fact
    * files' keys are checked — non-null, and present in the dim — then
    * the declaration restamps over the current fact file set. The
    * [[extendUnique]] discipline applied to referential integrity:
    * O(batch) + one dim key-column scan, vs re-anti-joining the whole
    * store, which is what makes FK maintenance per-batch under
    * streaming appends.
    *
    * The DIM side must be untouched: its stamp must still match and
    * its unique declaration still verify (a dim append can't orphan
    * fact keys, but it CAN break uniqueness, and a dim rewrite can
    * remove referenced keys — both refuse here and require a full
    * [[declareForeignKey]]). Refusals leave the old stamp in place,
    * which no longer matches the current fact files, so the constraint
    * correctly reads invalid until re-declared. */
  def extendForeignKey(spark: SparkSession, factDir: String, fkCol: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$factDir/_constraints_fk")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"extendForeignKey($factDir, $fkCol): no declaration")
    val rows = spark.read.parquet(s"$factDir/_constraints_fk")
      .filter(col("fkcol") === fkCol).collect()
    require(rows.nonEmpty, s"extendForeignKey($factDir, $fkCol): no fk($fkCol)")
    val refs = rows.map(r => (r.getString(1), r.getString(2))).distinct
    require(refs.length == 1,
      s"extendForeignKey($factDir, $fkCol): conflicting references")
    val (refDir, refCol) = refs.head
    val dimStamp = rows.filter(_.getString(3) == "dim").map(_.getString(4)).toSet
    require(dimStamp == dataFileNames(spark, refDir),
      s"extendForeignKey($factDir, $fkCol): the dim side changed — " +
        "re-run declareForeignKey")
    require(verifiedUnique(spark, refDir, refCol),
      s"extendForeignKey($factDir, $fkCol): $refDir.$refCol uniqueness " +
        "no longer verifies — re-declare both sides")
    val factStamp = rows.filter(_.getString(3) == "fact").map(_.getString(4)).toSet
    val current = dataFileNames(spark, factDir)
    require(factStamp.subsetOf(current),
      s"extendForeignKey($factDir, $fkCol): stamped fact files missing — " +
        "the store was rewritten, re-run declareForeignKey")
    val newFiles = (current -- factStamp).toSeq.sorted
    if (newFiles.isEmpty) return // nothing appended
    val newDf = spark.read.parquet(newFiles.map(f => s"$factDir/$f"): _*)
    require(newDf.filter(col(fkCol).isNull).limit(1).count() == 0L,
      s"extendForeignKey($factDir.$fkCol): null keys in the appended files")
    val orphans = newDf.select(col(fkCol))
      .join(spark.read.parquet(refDir).select(col(refCol).as(fkCol)),
        Seq(fkCol), "left_anti")
      .limit(1).count()
    require(orphans == 0L,
      s"extendForeignKey($factDir.$fkCol): appended values missing from " +
        s"$refDir.$refCol")
    writeFkSidecar(spark, factDir, fkCol,
      current.toSeq.sorted.map(f => (fkCol, refDir, refCol, "fact", f)) ++
        dimStamp.toSeq.sorted.map(f => (fkCol, refDir, refCol, "dim", f)))
  }

  /** The (dimDir, keyCol) a CURRENTLY-VALID foreign-key declaration on
    * `factDir.fkCol` references: both stamped file sets must match the
    * stores' current files AND the dim key's unique declaration must
    * itself still verify. None otherwise. */
  def verifiedForeignKey(spark: SparkSession, factDir: String,
                         fkCol: String): Option[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(s"$factDir/_constraints_fk")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val rows = spark.read.parquet(s"$factDir/_constraints_fk")
      .filter(col("fkcol") === fkCol).collect()
    if (rows.isEmpty) return None
    val refs = rows.map(r => (r.getString(1), r.getString(2))).distinct
    if (refs.length != 1) return None
    val (refDir, refCol) = refs.head
    val factStamp = rows.filter(_.getString(3) == "fact").map(_.getString(4)).toSet
    val dimStamp = rows.filter(_.getString(3) == "dim").map(_.getString(4)).toSet
    if (factStamp != dataFileNames(spark, factDir)) return None
    if (dimStamp != dataFileNames(spark, refDir)) return None
    if (!verifiedUnique(spark, refDir, refCol)) return None
    Some((refDir, refCol))
  }

  /** Scheme-qualified canonical form of a store path, so paths
    * recorded at declaration compare equal to the `file:`-qualified
    * roots Catalyst relations report. */
  def qualified(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  private def dataFileNames(spark: SparkSession, dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(n => n.startsWith("part-") && n.endsWith(".parquet"))
      .toSet
  }
}
