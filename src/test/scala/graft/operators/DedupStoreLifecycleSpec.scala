package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted-signature-store dedup lifecycle (q142 + VERDICT r5 #8):
  * batches append, compaction rewrites the store smaller, and — the
  * invariant that matters — compaction NEVER changes what counts as a
  * duplicate.
  */
class DedupStoreLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Seq[Long], textOf: Long => String) =
    ids.map(i => (i, textOf(i))).toDF("doc_id", "text")

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isFile) (if (f.getName.endsWith(".parquet")) 1 else 0)
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
    walk(new java.io.File(dir))
  }

  test("ingest batches, compact: file count drops, duplicates detected unchanged") {
    val base = java.nio.file.Files.createTempDirectory("dedupstore").toString
    val store = s"$base/sigs"
    // every token carries i, so distinct docs share NO 3-shingles
    // (Jaccard 0 — no LSH false positives to muddy the counts)
    def fresh(i: Long) =
      (0 until 10).map(w => s"tok${i}x$w").mkString(" ")

    // batch 1: all novel (store doesn't exist yet) -> zero duplicates
    val (n1, d1, _) = Dedup.ingestBatch(
      docs(0L until 10L, fresh), "doc_id", "text", store, s"$base/dupes1")
    assert(n1 == 10 && d1 == 0)
    // batch 2: 5 repeats of batch-1 texts + 5 novel -> 5 duplicates
    val (n2, d2, _) = Dedup.ingestBatch(
      docs(10L until 20L, i => if (i < 15) fresh(i - 10) else fresh(i)),
      "doc_id", "text", store, s"$base/dupes2")
    assert(n2 == 10 && d2 == 5)
    val dupes2 = spark.read.parquet(s"$base/dupes2")
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    // exact-copy texts hit on ALL bands, canonical match is the original
    assert(dupes2.map(_._1) == (10L until 15L) &&
      dupes2.forall { case (id, bands, first) => bands == 2 && first == id - 10 })

    // a probe batch AGAINST the store (no append): results must be
    // byte-identical across compaction
    val probe = docs(100L until 110L, i => fresh(i - 100)) // all dups of batch 1
    def probeDupes(): Seq[(Long, Long, Long)] =
      Dedup.incrementalDuplicates(
          Dedup.bandSignatures(probe, "doc_id", "text", 3, 8, 4),
          spark.read.parquet(store))
        .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    val before = probeDupes()
    assert(before.size == 10)

    val filesBefore = parquetFiles(store)
    // huge target -> one output file; two appends must have left more
    val (_, after) = graft.sinks.StoreMaintenance.compact(spark, store, 1L << 30)
    assert(filesBefore > after && after == 1,
      s"expected compaction to shrink $filesBefore files to 1, got $after")
    assert(probeDupes() == before, "compaction changed duplicate detection")

    // lifecycle continues across the compacted store, --compact path:
    // batch 3 repeats batch-2's novel docs and compacts inline
    val (n3, d3, files3) = Dedup.ingestBatch(
      docs(20L until 25L, i => fresh(i - 5)), "doc_id", "text",
      store, s"$base/dupes3", compactTargetBytes = Some(1L << 30))
    assert(n3 == 5 && d3 == 5 && files3 == 1)
  }

  test("streamed dedup ingest == sequential batch ingest, replay-safe") {
    val base = java.nio.file.Files.createTempDirectory("dedupstream").toString
    def fresh(i: Long) = (0 until 10).map(w => s"tok${i}x$w").mkString(" ")
    val batch1 = docs(0L until 10L, fresh)
    val batch2 = docs(10L until 20L,
      i => if (i < 15) fresh(i - 10) else fresh(i)) // 5 dups, 5 novel

    // reference: the sequential batch lifecycle
    Dedup.ingestBatch(batch1, "doc_id", "text", s"$base/batchstore", s"$base/bd1")
    Dedup.ingestBatch(batch2, "doc_id", "text", s"$base/batchstore", s"$base/bd2")

    // streamed: the same two drops through the file-watch lifecycle
    val inDir = s"$base/in"
    new java.io.File(inDir).mkdirs()
    batch1.coalesce(1).write.parquet(s"$inDir/drop1")
    val q = graft.streaming.StreamingMerge.dedupIngest(spark,
      s"$inDir/*", batch1.schema, s"$base/streamstore", s"$base/sdupes",
      s"$base/ckpt")
    try {
      q.processAllAvailable()
      batch2.coalesce(1).write.parquet(s"$inDir/drop2")
      q.processAllAvailable()
    } finally q.stop()

    def sigSet(dir: String) = spark.read.parquet(dir)
      .select($"doc_id", $"band", $"bucket")
      .as[(Long, Int, String)].collect().toSet
    assert(sigSet(s"$base/streamstore") == sigSet(s"$base/batchstore"))
    def dupSet(dir: String) = spark.read.parquet(dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(dupSet(s"$base/sdupes/batch_1") == dupSet(s"$base/bd2") &&
      dupSet(s"$base/bd2").size == 5)

    // replaying the last micro-batch must be a no-op
    val sigsBefore = sigSet(s"$base/streamstore")
    assert(!graft.streaming.StreamingMerge.applyDedupBatch(
      batch2, 1L, s"$base/streamstore", s"$base/sdupes"))
    assert(sigSet(s"$base/streamstore") == sigsBefore)

    // a RESET id lineage (fresh/wiped checkpoint over the old store —
    // batch ids restart at 0 below the store's high-water mark) must
    // refuse loudly, not silently skip new data or double-apply history
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamingMerge.applyDedupBatch(
        batch2, 0L, s"$base/streamstore", s"$base/sdupes")
    }
    assert(e.getMessage.contains("lifetimes diverged"))
    assert(sigSet(s"$base/streamstore") == sigsBefore)
  }
}
