package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Keyed parquet upsert shared by the store side-tables (sequence,
  * feature_pub, stock tables): anti-join novelty on `keys`, append-only
  * union, overwrite-in-place — the same J1 merge shape as the main DAG.
  * Returns the inserted-row count (the reference's per-table golden
  * number). On a cluster the same frames write to staging + a
  * transactional merge; the parquet overwrite is the local-harness
  * analog. */
object ParquetUpsert {
  def apply(spark: SparkSession, df: DataFrame, path: String,
            keys: Seq[String]): Long = {
    val live =
      if (HadoopSwap.exists(spark, path)) spark.read.parquet(path)
      else df.limit(0)
    // in-batch dedup first: a key repeated WITHIN the input (a corrected
    // row appended to a curation TSV rather than edited) must not
    // persist twice in a keyed table — keep one row per key,
    // deterministically (min over the remaining columns), like the
    // reference's per-row find-or-create creates each id once
    val nonKey = df.columns.filterNot(keys.contains)
    val deduped =
      if (nonKey.isEmpty) df.dropDuplicates(keys)
      else df.groupBy(keys.map(col): _*)
        .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.struct(nonKey.map(col).toIndexedSeq: _*)).as("_r"))
        .select(keys.map(col) ++ nonKey.map(c => col(s"_r.$c").as(c)): _*)
    // null-SAFE anti-join: a nullable key column (e.g. an empty TSV
    // value field) must still dedup against itself, or every re-import
    // re-inserts the null-keyed rows and idempotence silently breaks
    val n_ = deduped.alias("n")
    val o = live.select(keys.map(col): _*).alias("o")
    val cond = keys.map(k => col(s"n.$k") <=> col(s"o.$k")).reduce(_ && _)
    val delta = n_.join(o, cond, "left_anti")
      .localCheckpoint()
    val n = delta.count()
    // materialize the union before overwriting the parquet it reads
    live.unionByName(delta).localCheckpoint()
      .write.mode("overwrite").parquet(path)
    n
  }
}
