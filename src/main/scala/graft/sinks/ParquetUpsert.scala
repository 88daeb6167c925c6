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
      if (new java.io.File(path).exists()) spark.read.parquet(path)
      else df.limit(0)
    val delta = df
      .join(live.select(keys.map(col): _*), keys, "left_anti")
      .localCheckpoint()
    val n = delta.count()
    // materialize the union before overwriting the parquet it reads
    live.unionByName(delta).localCheckpoint()
      .write.mode("overwrite").parquet(path)
    n
  }
}
