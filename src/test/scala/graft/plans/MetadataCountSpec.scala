package graft.plans

import graft.SparkSpec
import graft.sinks.SkippingStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The metadata-only count rule: a bare count(*) over a plain read of
  * an nrows-carrying store must plan NO data-file scan and return the
  * exact count; anything that could change the answer (filters,
  * count(col), foreign files, legacy sidecars) must fall back to the
  * stock scan and stay correct. */
class MetadataCountSpec extends SparkSpec {
  import spark.implicits._

  /** AQE-aware scan detection: aggregate plans wrap in
    * AdaptiveSparkPlanExec whose children are hidden from collect — a
    * naive collectFirst is vacuously scan-free for EVERY aggregate. */
  private def scansData(df: DataFrame): Boolean = {
    df.collect() // finalize AQE
    def find(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        find(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        find(s.plan)
      case _: FileSourceScanExec => true
      case other => other.children.exists(find)
    }
    find(df.queryExecution.executedPlan)
  }

  private lazy val store: (String, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("metacount").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, i * 10)).toDF("k", "v")
    SkippingStore.writeMulti(df, "k", Seq("k", "v"), dir, nFiles = 8)
    (dir, df)
  }

  test("bare count(*) answers from the sidecar with no data scan") {
    val (dir, _) = store
    val cnt = spark.read.parquet(dir).groupBy().count()
    assert(!scansData(cnt), "count should come from the sidecar manifest")
    assert(cnt.as[Long].head() == 400L)
    // ds.count() goes through the same plan shape
    assert(spark.read.parquet(dir).count() == 400L)
    // append extends the manifest; the count stays metadata-only
    SkippingStore.appendMulti(Seq((1000, 1)).toDF("k", "v"), "k", dir, 1)
    val cnt2 = spark.read.parquet(dir).groupBy().count()
    assert(!scansData(cnt2))
    assert(cnt2.as[Long].head() == 401L)
  }

  test("partitioned stores answer count(*)/min/max metadata-only too") {
    val dir = java.nio.file.Files.createTempDirectory("metapart").toString + "/s"
    val df = Seq.tabulate(300)(i => (i, i % 3, i * 2)).toDF("k", "p", "r")
    df.repartitionByRange(6, $"p", $"r").sortWithinPartitions("p", "r")
      .write.partitionBy("p").parquet(dir)
    SkippingStore.indexPartitioned(spark, dir, Seq("k", "r"))
    val cnt = spark.read.parquet(dir).groupBy().count()
    assert(!scansData(cnt), "partitioned count must come from the sidecar")
    assert(cnt.as[Long].head() == 300L)
    // min/max of an INDEXED data column: metadata-only
    val mm = spark.read.parquet(dir).agg(min($"r"), max($"r"))
    assert(!scansData(mm))
    assert(mm.as[(Int, Int)].head() == ((0, 598)))
    // min of the PARTITION column is not in the sidecar: scans, correct
    val pm = spark.read.parquet(dir).agg(min($"p"))
    assert(scansData(pm), "partition columns fall back to the scan")
    assert(pm.as[Int].head() == 0)
    // an unmapped append (stale sidecar): falls back, stays correct
    Seq((9999, 1, 9999)).toDF("k", "p", "r")
      .write.partitionBy("p").mode("append").parquet(dir)
    val stale = spark.read.parquet(dir).groupBy().count()
    assert(scansData(stale), "stale partitioned sidecar must scan")
    assert(stale.as[Long].head() == 301L)
  }

  test("filters, count(col), and grouped counts scan normally") {
    val (dir, _) = store
    val filtered = spark.read.parquet(dir).filter($"v" >= 1000).groupBy().count()
    assert(scansData(filtered), "a filter changes the answer — must scan")
    assert(filtered.as[Long].head() == 300L)
    // 401 rows: the first test's append is part of the shared store.
    // count(col) skips nulls, so THIS rule leaves it alone — but the
    // companion MetadataMinMaxRule answers it from the nnulls stat,
    // so it is metadata-only too (and correct: v is never null here)
    val countCol = spark.read.parquet(dir).agg(count($"v"))
    assert(!scansData(countCol),
      "count(col) should answer from the null-count stat")
    assert(countCol.as[Long].head() == 401L)
    val grouped = spark.read.parquet(dir)
      .groupBy(($"k" % 2).as("p")).count()
    assert(scansData(grouped))
    assert(grouped.agg(sum($"count")).as[Long].head() == 401L)
  }

  test("foreign data files and legacy sidecars fall back loudly-correct") {
    val (dir, df) = store
    // clone the store, then drop a foreign file in: coverage check
    // refuses the manifest, the stock scan answers
    val dir2 = java.nio.file.Files.createTempDirectory("metacount2").toString + "/s"
    SkippingStore.writeMulti(df, "k", Seq("k"), dir2, nFiles = 4)
    df.limit(7).write.mode("append").parquet(dir2)
    val cnt = spark.read.parquet(dir2).groupBy().count()
    assert(scansData(cnt))
    assert(cnt.as[Long].head() == 407L)
    // legacy sidecar: no nrows column -> not rule-answerable
    val dir3 = java.nio.file.Files.createTempDirectory("metacount3").toString + "/s"
    df.write.parquet(dir3)
    spark.read.parquet(s"$dir/_zonemap_multi").drop("nrows")
      .write.parquet(s"$dir3/_zonemap_multi")
    assert(SkippingStore.metadataCount(spark, dir3).isEmpty)
  }
}
