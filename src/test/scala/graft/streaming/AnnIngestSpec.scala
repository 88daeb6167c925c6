package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest into the IVF postings store: every applied batch
  * must leave the store servable with partition pruning intact, under
  * the same frozen index and the shared replay gate. */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vec(i: Int): Seq[Float] =
    Seq.tabulate(8)(d => ((i * 31 + d * 7) % 19 - 9).toFloat / 10f)

  private def batchDf(from: Int, until: Int): DataFrame =
    (from until until).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("riderCols ingest keeps the clustered sidecar current per batch") {
    import graft.sinks.SkippingStore
    val root = java.nio.file.Files.createTempDirectory("anningr").toString
    val (ixDir, dir) = (s"$root/ix", s"$root/store")
    def withBucket(df: DataFrame) =
      df.withColumn("bucket", ($"vec_id" % 3).cast("int"))
    val base = withBucket(batchDf(0, 64))
    val index = Similarity.trainIvf(base, "vec_id", "embedding", 4)
    Similarity.saveIndex(spark, index, ixDir)
    assert(StreamingMerge.applyAnnBatch(base, 0L, dir, ixDir, Seq("bucket")))
    assert(StreamingMerge.applyAnnBatch(withBucket(batchDf(64, 128)), 1L,
      dir, ixDir, Seq("bucket")))
    // the sidecar covers every file of both batches (coverage check is
    // the assertion: a gap would make the load throw)
    val sc = SkippingStore.loadMultiSidecar(spark, dir, relative = true)
    assert(sc.isDefined && sc.get.byCol.contains("bucket"))
    assert(sc.get.byCol("bucket").size ==
      SkippingStore.listDataFileRelPaths(spark, dir).size)
    // filtered serve across the maintained store is exact
    val qv = vec(9)
    val got = Similarity.ivfStoreTopK(spark, dir, "vec_id", "embedding",
      qv, index, k = 5, nprobe = 4, excludeId = Some(9L),
      where = Some($"bucket" === 1))
    val want = withBucket(batchDf(0, 128))
      .filter($"vec_id" =!= 9L && $"bucket" === 1)
      .select($"vec_id",
        round(graft.functions.VectorFunctions
          .cosine_sim($"embedding", typedLit(qv)), 6).as("sim"))
      .orderBy($"sim".desc, $"vec_id").limit(5)
    assert(got.collect().toSeq == want.collect().toSeq)
    // crash window: data appended + marker committed, sidecar write
    // lost — the REPLAY of that batch heals the sidecar instead of
    // skipping past the gap
    Similarity.ivfStoreAppend(
      withBucket(batchDf(128, 160)).withColumn("_applied_batch", lit(2L)),
      "vec_id", "embedding", index, dir)
    assert(scala.util.Try(
      SkippingStore.loadMultiSidecar(spark, dir, relative = true)).isFailure,
      "fixture: the sidecar must be torn before the replay")
    assert(!StreamingMerge.applyAnnBatch(withBucket(batchDf(128, 160)), 2L,
      dir, ixDir, Seq("bucket")), "replay must be skipped (data landed)")
    val healed = SkippingStore.loadMultiSidecar(spark, dir, relative = true)
    assert(healed.isDefined && healed.get.byCol("bucket").size ==
      SkippingStore.listDataFileRelPaths(spark, dir).size,
      "the replayed batch must heal the torn sidecar")
  }

  test("streamed batches keep the store servable; replay gate holds") {
    val root = java.nio.file.Files.createTempDirectory("anning").toString
    val (ixDir, dir) = (s"$root/ix", s"$root/store")
    val base = batchDf(0, 64)
    val index = Similarity.trainIvf(base, "vec_id", "embedding", 4)
    Similarity.saveIndex(spark, index, ixDir)

    assert(StreamingMerge.applyAnnBatch(batchDf(0, 64), 0L, dir, ixDir))
    assert(StreamingMerge.applyAnnBatch(batchDf(64, 128), 1L, dir, ixDir))
    assert(spark.read.parquet(dir).count() == 128)

    // serve across both batches: equals brute-force within probed cells
    val qv = vec(5)
    val got = Similarity.ivfStoreTopK(spark, dir, "vec_id", "embedding",
      qv, index, k = 5, nprobe = 4, excludeId = Some(5L))
    // nprobe = all cells -> exact top-5 over the full 128-vector corpus
    val all = batchDf(0, 128).filter($"vec_id" =!= 5L)
      .select($"vec_id",
        round(graft.functions.VectorFunctions
          .cosine_sim($"embedding", typedLit(qv)), 6).as("sim"))
      .orderBy($"sim".desc, $"vec_id").limit(5)
    assert(got.collect().toSeq == all.collect().toSeq)

    // a selective probe prunes partitions (scan metric, AQE-aware)
    val narrow = Similarity.ivfStoreTopK(spark, dir, "vec_id", "embedding",
      qv, index, k = 5, nprobe = 1)
    val cells = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    val totalFiles = graft.plans.PlanProbe.scannedFileCount(
      spark.read.parquet(dir).select($"vec_id"))
    assert(cells > 1, s"need a multi-cell store, got $cells")
    assert(graft.plans.PlanProbe.scannedFileCount(narrow) < totalFiles)

    // replayed batch: skipped before any write, store unchanged
    assert(!StreamingMerge.applyAnnBatch(batchDf(64, 128), 1L, dir, ixDir))
    assert(spark.read.parquet(dir).count() == 128)

    // reset id lineage (fresh checkpoint over an old store): refuse
    val ex = intercept[IllegalStateException] {
      StreamingMerge.applyAnnBatch(batchDf(0, 64), 0L, dir, ixDir)
    }
    assert(ex.getMessage.contains("diverged"))

    // compaction heals small-files decay: one file per cell, identical
    // serving results, replay gate still armed, stream keeps appending
    val beforeServe = Similarity.ivfStoreTopK(spark, dir, "vec_id",
      "embedding", qv, index, k = 5, nprobe = 4, excludeId = Some(5L))
      .collect().toSeq
    val (was, now) = Similarity.compactIvfStore(spark, dir)
    assert(was > cells && now == cells, s"$was files -> $now (cells=$cells)")
    val afterServe = Similarity.ivfStoreTopK(spark, dir, "vec_id",
      "embedding", qv, index, k = 5, nprobe = 4, excludeId = Some(5L))
      .collect().toSeq
    assert(afterServe == beforeServe)
    intercept[IllegalStateException] {
      StreamingMerge.applyAnnBatch(batchDf(0, 64), 0L, dir, ixDir)
    }
    assert(StreamingMerge.applyAnnBatch(batchDf(128, 140), 2L, dir, ixDir))
    assert(spark.read.parquet(dir).count() == 140)
  }
}
