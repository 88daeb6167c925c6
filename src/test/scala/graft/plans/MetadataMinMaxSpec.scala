package graft.plans

import graft.SparkSpec
import graft.sinks.SkippingStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The metadata-only min/max rule: global extrema over a multi-indexed
  * store must plan NO data-file scan and return exactly what the scan
  * would; anything the sidecar cannot provably answer (filters,
  * computed projections, unindexed columns, doubles that may have
  * rounded a huge long) must fall back to the stock scan and stay
  * correct. */
class MetadataMinMaxSpec extends SparkSpec {
  import spark.implicits._

  private def scansData(df: DataFrame): Boolean = PlanProbe.scansFiles(df)

  private lazy val store: (String, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("metaminmax").toString + "/s"
    val df = Seq.tabulate(400)(i =>
      (i.toLong, i * 10, s"w${"%03d".format((i * 7) % 400)}",
        java.sql.Timestamp.valueOf(s"2024-01-${1 + i % 28} 00:00:${i % 60}")))
      .toDF("k", "v", "w", "ts")
    SkippingStore.writeMulti(df, "k", Seq("k", "v", "w", "ts"), dir, nFiles = 8)
    (dir, df)
  }

  test("min/max over indexed long, int, string, timestamp: no data scan") {
    val (dir, df) = store
    val agg = spark.read.parquet(dir).agg(
      min($"k").as("a"), max($"k").as("b"), min($"v").as("c"),
      max($"v").as("d"), min($"w").as("e"), max($"w").as("f"),
      min($"ts").as("g"), max($"ts").as("h"), count(lit(1)).as("n"))
    assert(!scansData(agg), "extrema should come from the zone sidecar")
    val expect = df.agg(
      min($"k"), max($"k"), min($"v"), max($"v"), min($"w"), max($"w"),
      min($"ts"), max($"ts"), count(lit(1))).head()
    assert(agg.head() == expect)
  }

  test("alias-only projections resolve; computed projections scan") {
    val (dir, df) = store
    val aliased = spark.read.parquet(dir)
      .select($"v".as("renamed")).agg(min($"renamed").as("m"))
    assert(!scansData(aliased))
    assert(aliased.as[Int].head() == 0)
    val computed = spark.read.parquet(dir)
      .select(($"v" + 1).as("shifted")).agg(min($"shifted").as("m"))
    assert(scansData(computed), "a computed column is not in the sidecar")
    assert(computed.as[Int].head() == 1)
    df.count() // keep df referenced for clarity of expectations above
  }

  test("filters, grouped aggs, and unindexed columns fall back") {
    val (dir, _) = store
    val filtered = spark.read.parquet(dir).filter($"v" >= 1000)
      .agg(min($"v").as("m"))
    assert(scansData(filtered), "a filter changes the extrema — must scan")
    assert(filtered.as[Int].head() == 1000)
    val grouped = spark.read.parquet(dir)
      .groupBy(($"k" % 2).as("p")).agg(max($"v").as("m"))
    assert(scansData(grouped))
    assert(grouped.agg(max($"m")).as[Int].head() == 3990)
    // a store indexed on fewer columns: min on the unindexed one scans
    val dir2 = java.nio.file.Files.createTempDirectory("metaminmax2").toString + "/s"
    SkippingStore.writeMulti(
      Seq((1, 5), (2, 9)).toDF("k", "v"), "k", Seq("k"), dir2, 1)
    val unindexed = spark.read.parquet(dir2).agg(min($"v").as("m"))
    assert(scansData(unindexed))
    assert(unindexed.as[Int].head() == 5)
  }

  test("nulls: per-file stats ignore them; an all-null column is null") {
    val dir = java.nio.file.Files.createTempDirectory("metaminmax3").toString + "/s"
    val df = Seq[(Int, Option[Int], Option[String])](
      (1, None, None), (2, Some(7), None), (3, Some(3), None), (4, None, None))
      .toDF("k", "v", "w")
    SkippingStore.writeMulti(df, "k", Seq("k", "v", "w"), dir, 2)
    val agg = spark.read.parquet(dir)
      .agg(min($"v").as("a"), max($"v").as("b"), min($"w").as("c"))
    assert(!scansData(agg))
    val r = agg.head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 7 && r.isNullAt(2))
    // count(col) = sum(nrows - nnulls): null-skipping, metadata-only
    val cnt = spark.read.parquet(dir)
      .agg(count($"v").as("nv"), count($"w").as("nw"),
        count(lit(1)).as("n"))
    assert(!scansData(cnt))
    assert(cnt.head() == org.apache.spark.sql.Row(2L, 0L, 4L))
  }

  test("a long beyond 2^53 is not provably exact — must scan") {
    val dir = java.nio.file.Files.createTempDirectory("metaminmax4").toString + "/s"
    val big = (1L << 53) + 3L // rounds to 2^53 as a double
    val df = Seq((1L, 10L), (2L, big)).toDF("k", "v")
    SkippingStore.writeMulti(df, "k", Seq("k", "v"), dir, 1)
    val agg = spark.read.parquet(dir).agg(max($"v").as("m"))
    assert(scansData(agg), "a rounded double slot must not answer")
    assert(agg.as[Long].head() == big)
    // the small-valued column on the same store still answers
    val ok = spark.read.parquet(dir).agg(max($"k").as("m"))
    assert(!scansData(ok))
    assert(ok.as[Long].head() == 2L)
  }

  test("TIMESTAMP_NTZ answers under the engine's UTC sessions") {
    val dir = java.nio.file.Files.createTempDirectory("metaminmax5").toString + "/s"
    val df = Seq((1L, java.time.LocalDateTime.of(2024, 3, 1, 12, 0, 7)),
        (2L, java.time.LocalDateTime.of(2023, 11, 30, 1, 2, 3)))
      .toDF("k", "ts")
    SkippingStore.writeMulti(df, "k", Seq("k", "ts"), dir, 1)
    val agg = spark.read.parquet(dir)
      .agg(min($"ts").as("a"), max($"ts").as("b"))
    assert(!scansData(agg))
    assert(agg.head() == df.agg(min($"ts"), max($"ts")).head())
  }

  test("kill-switch disables the rewrite but not the answer") {
    val (dir, _) = store
    spark.conf.set("spark.graft.metaminmax.enabled", "false")
    try {
      val agg = spark.read.parquet(dir).agg(min($"v").as("m"))
      assert(scansData(agg))
      assert(agg.as[Int].head() == 0)
    } finally spark.conf.set("spark.graft.metaminmax.enabled", "true")
  }
}
