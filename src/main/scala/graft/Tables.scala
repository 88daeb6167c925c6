package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Readers for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read one parquet
  * file per table. At cluster scale these would be partitioned/bucketed
  * table paths; the API stays the same.
  *
  * `events.ts` is written as TIMESTAMP(NANOS) parquet, which Spark only
  * reads via `spark.sql.legacy.parquet.nanosAsLong` (set in every session
  * builder here); the long is converted back to a microsecond timestamp on
  * load (floor division — matching DuckDB's own nanos->micros truncation).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
