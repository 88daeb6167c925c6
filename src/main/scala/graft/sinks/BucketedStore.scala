package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for co-located fact-fact joins (builder brief:
  * "repartition/bucketing for co-located joins").
  *
  * Writing both sides of a recurring equi-join bucketed + sorted by the
  * join key means every subsequent join of the two tables is
  * exchange-free: Spark matches the tables' bucket specs and plans a
  * sort-merge join directly on the bucket files. At 100 TB this converts
  * the nightly fact⋈fact shuffle (terabytes over the network, every
  * run) into a one-time layout cost at write time — the same trade the
  * reference makes with its post-load staging indexes
  * (Temp/WithPostgresql.pm:30-51), translated to Spark's storage model.
  */
object BucketedStore {

  /** Save `df` as a bucketed, per-bucket-sorted external parquet table.
    * Both join sides must use the same `buckets` count and key. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
