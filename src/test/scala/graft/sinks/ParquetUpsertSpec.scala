package graft.sinks

import graft.SparkSpec

/** Keyed-upsert contract: novelty against the live store AND within the
  * incoming batch itself — a key repeated in one input file must persist
  * exactly once, deterministically. */
class ParquetUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("a key repeated within one batch persists once (deterministic min)") {
    val dir = java.nio.file.Files.createTempDirectory("upsert").toString + "/t"
    val batch = Seq(("a", "v2"), ("a", "v1"), ("b", "x")).toDF("k", "v")
    val n = ParquetUpsert(spark, batch, dir, Seq("k"))
    assert(n == 2) // two distinct keys inserted
    val rows = spark.read.parquet(dir).as[(String, String)].collect().toMap
    assert(rows == Map("a" -> "v1", "b" -> "x")) // min over non-key cols
    // re-import of the same (duplicated) batch inserts nothing
    assert(ParquetUpsert(spark, batch, dir, Seq("k")) == 0L)
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("key-only tables dedup too") {
    val dir = java.nio.file.Files.createTempDirectory("upsertk").toString + "/t"
    val batch = Seq("a", "a", "b").toDF("k")
    assert(ParquetUpsert(spark, batch, dir, Seq("k")) == 2)
  }
}
