package graft.streaming

import graft.SparkSpec
import graft.sinks.SkippingStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Streaming ingest into an indexed SkippingStore: every applied batch
  * must leave the store fully prunable (zones AND bloom, explicit
  * readers AND the transparent optimizer rule), with batch-sized
  * sidecar maintenance and the shared replay gate. */
class IndexedIngestSpec extends SparkSpec {
  import spark.implicits._

  private def scannedFiles(df: DataFrame): Set[String] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.inputRDDs() // force lazy init
        s.relation.location.inputFiles.map(p =>
          new org.apache.hadoop.fs.Path(p).getName).toSet
    }.reduce(_ ++ _)

  private def batchDf(from: Int, until: Int): DataFrame =
    (from until until).map(i => (i, i * 10, s"h${i % 97}x$i"))
      .toDF("k", "v", "key")

  test("streamed batches keep the store prunable; replay gate holds") {
    val dir = java.nio.file.Files.createTempDirectory("idxing").toString + "/s"
    assert(StreamingMerge.applyIndexedBatch(batchDf(0, 200), 0L, dir,
      "k", Seq("k", "v"), Some("key"), nFiles = 4))
    assert(StreamingMerge.applyIndexedBatch(batchDf(200, 400), 1L, dir,
      "k", Seq("k", "v"), Some("key"), nFiles = 4))
    assert(spark.read.parquet(dir).count() == 400)

    // explicit zone reader: prunes and stays exact across both batches
    val (kept, total, pruned) =
      SkippingStore.readPrunedOn(spark, dir, "v", 990, 2010)
    assert(total == 8 && kept < 8, s"kept $kept of $total")
    assert(pruned.select($"k").as[Int].collect().sorted.toSeq ==
      (99 to 201).toSeq)

    // transparent rule: plain reads prune on the zone col AND the
    // bloom col — the stream's sidecar maintenance feeds the optimizer
    val z = spark.read.parquet(dir).filter($"v" >= 990 && $"v" <= 2010)
    assert(scannedFiles(z).size < 8)
    assert(z.count() == 103)
    val b = spark.read.parquet(dir).filter($"key" === "h30x321")
    assert(scannedFiles(b).size < 8)
    assert(b.select($"k").as[Int].collect().toSeq == Seq(321))

    // replayed batch: skipped before any write, store unchanged
    assert(!StreamingMerge.applyIndexedBatch(batchDf(200, 400), 1L, dir,
      "k", Seq("k", "v"), Some("key"), nFiles = 4))
    assert(spark.read.parquet(dir).count() == 400)

    // reset id lineage (fresh checkpoint over an old store): refuse
    val ex = intercept[IllegalStateException] {
      StreamingMerge.applyIndexedBatch(batchDf(0, 200), 0L, dir,
        "k", Seq("k", "v"), Some("key"), nFiles = 4)
    }
    assert(ex.getMessage.contains("diverged"))

    // compaction completes the lifecycle: fewer files, both sidecars
    // rebuilt against the new layout, every pruning path still engaged
    val (was, now) = SkippingStore.compactIndexed(spark, dir, "k",
      targetBytes = 1L << 30)
    assert(was == 8 && now == 1, s"$was -> $now")
    assert(spark.read.parquet(dir).count() == 400) // metadata-count path
    assert(SkippingStore.metadataCount(spark, dir).contains(400L))
    val (kept2, total2, pruned2) =
      SkippingStore.readPrunedOn(spark, dir, "v", 990, 2010)
    assert(total2 == 1 && kept2 == 1)
    assert(pruned2.count() == 103)
    val b2 = spark.read.parquet(dir).filter($"key" === "h30x321")
    assert(b2.select($"k").as[Int].collect().toSeq == Seq(321))
    // and the stream can keep appending after the rewrite
    assert(StreamingMerge.applyIndexedBatch(batchDf(400, 450), 2L, dir,
      "k", Seq("k", "v"), Some("key"), nFiles = 1))
    assert(SkippingStore.metadataCount(spark, dir).contains(450L))
  }
}
