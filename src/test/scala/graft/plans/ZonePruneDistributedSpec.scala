package graft.plans

import graft.SparkSpec
import graft.sinks.SkippingStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The distributed sidecar evaluation (files > spark.graft.zoneprune
  * .maxDriverFiles) must agree EXACTLY with the in-memory path on
  * every predicate shape: same survivor files, same rows. Also pins
  * the cross-query sidecar cache: one collect per sidecar version,
  * invalidation on append, and coverage still checked per query on
  * cache hits. */
class ZonePruneDistributedSpec extends SparkSpec {
  import spark.implicits._

  private val ThresholdKey = "spark.graft.zoneprune.maxDriverFiles"

  private def scannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.inputRDDs()
        s.relation.location.inputFiles.map(p =>
          new org.apache.hadoop.fs.Path(p).getName).toSet
    }.reduce(_ ++ _)

  /** Runs `q` under both evaluation paths; asserts identical scanned
    * file sets and identical sorted rows, and returns the scanned
    * count so callers can assert pruning actually happened. */
  private def bothPaths(q: () => DataFrame): Int = {
    spark.conf.unset(ThresholdKey)
    val driver = q()
    val driverFiles = scannedFiles(driver)
    val driverRows = driver.collect().map(_.toString).sorted.toSeq
    spark.conf.set(ThresholdKey, "0") // every store is "too big"
    try {
      val dist = q()
      assert(scannedFiles(dist) == driverFiles,
        s"distributed survivors ${scannedFiles(dist).size} != " +
          s"driver survivors ${driverFiles.size}")
      assert(dist.collect().map(_.toString).sorted.toSeq == driverRows)
    } finally spark.conf.unset(ThresholdKey)
    driverFiles.size
  }

  private lazy val flat: (String, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("zpdist").toString + "/s"
    val df = Seq.tabulate(400)(i =>
        (i, i * 10, s"u${"%02d".format(i / 50)}",
          if (i % 7 == 0) null else s"w$i"))
      .toDF("k", "v", "u", "w")
    SkippingStore.writeMulti(df, "k", Seq("k", "v", "u", "w"), dir, nFiles = 8)
    (dir, 8)
  }

  test("numeric ranges, equality, IN, startsWith agree across paths") {
    val (dir, n) = flat
    assert(bothPaths(() => spark.read.parquet(dir)
      .filter($"v" >= 1000.0 && $"v" <= 1500.0)) < n)
    assert(bothPaths(() => spark.read.parquet(dir).filter($"k" === 42)) == 1)
    assert(bothPaths(() => spark.read.parquet(dir)
      .filter($"k".isin(3, 77, 399))) < n)
    assert(bothPaths(() => spark.read.parquet(dir)
      .filter($"u".startsWith("u00"))) < n)
  }

  test("null-count predicates and OR trees agree across paths") {
    val (dir, n) = flat
    assert(bothPaths(() => spark.read.parquet(dir)
      .filter($"w".isNull && $"k" < 100)) < n)
    assert(bothPaths(() => spark.read.parquet(dir)
      .filter($"k" < 50 || $"k" > 380)) < n)
    // opaque disjunct: no pruning either path, rows still exact
    assert(bothPaths(() => spark.read.parquet(dir)
      .filter($"k" < 50 || length($"w") > 100)) == n)
  }

  test("partitioned stores agree across paths (relative keys)") {
    val dir = java.nio.file.Files.createTempDirectory("zpdistp").toString + "/s"
    val df = Seq.tabulate(600)(i => (i.toLong, i % 3, i % 20))
      .toDF("id", "cat", "r")
    df.repartitionByRange(9, $"cat", $"r").sortWithinPartitions($"cat", $"r")
      .write.partitionBy("cat").mode("overwrite").parquet(dir)
    SkippingStore.indexPartitioned(spark, dir, Seq("r"))
    val total = SkippingStore.listDataFileRelPaths(spark, dir).size
    assert(bothPaths(() => spark.read.parquet(dir)
      .filter($"cat" === 1 && $"r" <= 4)) < total)
  }

  test("distributed mode leaves a bloom-indexed equality correct (zone superset)") {
    val dir = java.nio.file.Files.createTempDirectory("zpdistb").toString + "/s"
    val df = Seq.tabulate(300)(i => (i, s"h${i * 2654435761L}"))
      .toDF("k", "h")
    SkippingStore.writeMulti(df, "k", Seq("k"), dir, nFiles = 6)
    SkippingStore.bloomIndex(spark, dir, "h")
    spark.conf.unset(ThresholdKey)
    val driver = spark.read.parquet(dir).filter($"h" === s"h${7 * 2654435761L}")
    val driverFiles = scannedFiles(driver)
    val rows = driver.collect().map(_.toString).sorted.toSeq
    spark.conf.set(ThresholdKey, "0")
    try {
      val dist = spark.read.parquet(dir).filter($"h" === s"h${7 * 2654435761L}")
      // bloom is off above the threshold: survivors may only grow
      assert(driverFiles.subsetOf(scannedFiles(dist)))
      assert(dist.collect().map(_.toString).sorted.toSeq == rows)
    } finally spark.conf.unset(ThresholdKey)
  }

  test("distributed coverage mismatch degrades to the full scan, rows exact") {
    val dir = java.nio.file.Files.createTempDirectory("zpdistc").toString + "/s"
    val df = Seq.tabulate(200)(i => (i, i * 2)).toDF("k", "v")
    SkippingStore.writeMulti(df, "k", Seq("k"), dir, nFiles = 4)
    // foreign append the sidecar never saw
    Seq((999, 1998)).toDF("k", "v").coalesce(1)
      .write.mode("append").parquet(dir)
    spark.conf.set(ThresholdKey, "0")
    try {
      val got = spark.read.parquet(dir).filter($"k" >= 999)
      assert(got.as[(Int, Int)].collect().toSet == Set((999, 1998)),
        "a stale sidecar must never lose the unmapped file's rows")
    } finally spark.conf.unset(ThresholdKey)
  }

  test("sidecar cache: one collect per version, invalidated by append") {
    val dir = java.nio.file.Files.createTempDirectory("zpcache").toString + "/s"
    val df = Seq.tabulate(100)(i => (i, i * 3)).toDF("k", "v")
    SkippingStore.writeMulti(df, "k", Seq("k"), dir, nFiles = 4)
    val actual = SkippingStore.listDataFileRelPaths(spark, dir) // flat names ok?
    val names = SkippingStore.dataFiles(spark, dir, relative = false)
    val a = SkippingStore.loadMultiSidecarCached(spark, dir, names)
    val b = SkippingStore.loadMultiSidecarCached(spark, dir, names)
    assert(a.nonEmpty && (a.get eq b.get),
      "same sidecar version must return the cached instance")
    SkippingStore.appendMulti(
      Seq((500, 1500)).toDF("k", "v"), "k", dir, nFiles = 1)
    val names2 = SkippingStore.dataFiles(spark, dir, relative = false)
    val c = SkippingStore.loadMultiSidecarCached(spark, dir, names2)
    assert(c.nonEmpty && !(c.get eq a.get),
      "an appended sidecar must load fresh")
    // cache hit + drifted DATA (file deleted behind the sidecar's
    // back): the per-query coverage check must still throw
    val victim = names2.find(_ != names2.head).get
    val fs = graft.sinks.HadoopSwap.fs(spark, dir)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$victim"), false)
    val names3 = SkippingStore.dataFiles(spark, dir, relative = false)
    intercept[IllegalArgumentException] {
      SkippingStore.loadMultiSidecarCached(spark, dir, names3)
    }
  }
}
