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

  /** Verify `keyCol` is unique (among non-null values) in the parquet
    * dir and persist the declaration stamped with the current file
    * set. Throws on duplicates; overwrites any previous declaration. */
  def declareUnique(spark: SparkSession, dir: String, keyCol: String): Unit = {
    val df = spark.read.parquet(dir)
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
    dataFileNames(spark, dir).toSeq.sorted
      .map(f => ("unique", keyCol, f, nnulls))
      .toDF("constraint", "col", "file", "nnulls")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_constraints")
  }

  /** Is there a CURRENTLY-VALID unique declaration for `keyCol`? True
    * only when the sidecar exists, carries the column, and its stamped
    * file set exactly matches the store's data files (any drift —
    * appends, compaction, overwrite — reads as "not declared"). */
  def verifiedUnique(spark: SparkSession, dir: String, keyCol: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_constraints")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val stamped = spark.read.parquet(s"$dir/_constraints")
      .filter(col("constraint") === "unique" && col("col") === keyCol)
      .select(col("file")).collect().map(_.getString(0)).toSet
    stamped.nonEmpty && stamped == dataFileNames(spark, dir)
  }

  /** [[verifiedUnique]] AND the declaration recorded ZERO null keys —
    * the stronger property DISTINCT elimination needs: a unique
    * non-null key makes every row pairwise distinct on any column set
    * containing it, whereas duplicate NULL keys would still collapse
    * under DISTINCT (grouping treats null = null). Declarations
    * written before the null count existed answer false. */
  def verifiedUniqueNoNulls(spark: SparkSession, dir: String,
                            keyCol: String): Boolean = {
    if (!verifiedUnique(spark, dir, keyCol)) return false
    val sc = spark.read.parquet(s"$dir/_constraints")
    if (!sc.columns.contains("nnulls")) return false
    val ns = sc.filter(col("constraint") === "unique" && col("col") === keyCol)
      .select(col("nnulls")).distinct().collect().map(_.getLong(0))
    ns.length == 1 && ns.head == 0L
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
