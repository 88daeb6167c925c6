package graft.plans

import graft.SparkSpec
import graft.sinks.SkippingStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The transparent zone-prune rule: plain `spark.read.parquet(store)
  * .filter(...)` must open only surviving files, return exactly the
  * full-scan rows, fire on either indexed column, stay idempotent, and
  * leave non-stores and non-range filters untouched. */
class ZonePruneSpec extends SparkSpec {
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.inputRDDs() // force lazy init
        s.relation.location.inputFiles.map(p =>
          new org.apache.hadoop.fs.Path(p).getName).toSet
    }.reduce(_ ++ _)

  private lazy val store: (String, DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("zprule").toString + "/s"
    val df = Seq.tabulate(400)(i => (i, i * 10, s"u${i / 50}")).toDF("k", "v", "u")
    SkippingStore.writeMulti(df, "k", Seq("k", "v", "u"), dir, nFiles = 8)
    (dir, df)
  }

  test("a filtered plain read opens only surviving files, rows exact") {
    val (dir, df) = store
    val got = spark.read.parquet(dir).filter($"v" >= 1000.0 && $"v" <= 1500.0)
    val files = scannedFiles(got)
    assert(files.size < 8, s"expected pruning, scanned ${files.size} of 8")
    assert(got.select($"k").as[Int].collect().toSet ==
      df.filter($"v" >= 1000 && $"v" <= 1500).select($"k").as[Int].collect().toSet)
    // string column prunes too (the layout is k-sorted; u correlates)
    val gs = spark.read.parquet(dir).filter($"u" === "u0")
    assert(scannedFiles(gs).size < 8)
    assert(gs.count() == 50)
  }

  test("idempotent at the fixed point; equality predicates prune") {
    val (dir, df) = store
    val got = spark.read.parquet(dir).filter($"k" === 42)
    assert(scannedFiles(got).size == 1)
    assert(got.select($"v").as[Int].collect().toSeq == Seq(420))
    // run the optimizer twice over the same plan — no further rewrite
    val once = got.queryExecution.optimizedPlan
    val twice = spark.sessionState.optimizer.execute(once)
    assert(once == twice, "rule must reach a fixed point")
  }

  test("non-range predicates and plain parquet dirs are untouched") {
    val (dir, df) = store
    // no sidecar: ordinary parquet dir
    val plainDir = java.nio.file.Files.createTempDirectory("zpplain").toString + "/p"
    df.write.parquet(plainDir)
    val plain = spark.read.parquet(plainDir).filter($"v" >= 1000)
    assert(scannedFiles(plain).nonEmpty) // just runs, unpruned
    assert(plain.count() == df.filter($"v" >= 1000).count())
    // unindexable predicate shape on the store: correct, simply unpruned
    val mod = spark.read.parquet(dir).filter($"v" % 2 === 0)
    assert(mod.count() == df.filter($"v" % 2 === 0).count())
    assert(scannedFiles(mod).size == 8)
  }

  test("a filter on an unindexed column keeps correctness (no prune)") {
    val dir = java.nio.file.Files.createTempDirectory("zpuncol").toString + "/s"
    val df = Seq.tabulate(100)(i => (i, i % 7)).toDF("k", "w")
    SkippingStore.writeMulti(df, "k", Seq("k"), dir, nFiles = 4)
    val got = spark.read.parquet(dir).filter($"w" === 3)
    assert(scannedFiles(got).size == 4) // w carries no zones
    assert(got.count() == df.filter($"w" === 3).count())
  }
}
