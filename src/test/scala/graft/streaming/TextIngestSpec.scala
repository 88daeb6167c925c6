package graft.streaming

import graft.SparkSpec
import graft.operators.{Curation, TextIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Streaming ingest into the BM25 text postings store: every applied
  * batch must leave the store serving EXACT full-corpus BM25 (df,
  * avgdl, N include the batch), under the frozen bucket layout and the
  * shared replay gate; replays heal lost sidecar/stats work and never
  * double-count corpus stats.
  */
class TextIngestSpec extends SparkSpec {
  import spark.implicits._

  private val words = Seq("ash", "birch", "cedar", "elm", "fir", "hazel",
    "larch", "maple", "oak", "pine", "rowan", "willow")

  // per-doc seed: batchDf(0,30) ∪ batchDf(30,60) == batchDf(0,60)
  private def batchDf(from: Long, until: Long): DataFrame =
    (from until until).map { i =>
      val rnd = new Random(i)
      val n = 5 + rnd.nextInt(7)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")

  private def rows(df: DataFrame) =
    df.select($"doc_id", $"n_terms", $"score")
      .as[(Long, Long, Double)].collect().toSeq

  test("per-batch ingest serves exact BM25; replays skip without double-count") {
    val root = java.nio.file.Files.createTempDirectory("textingest").toString
    val dir = s"$root/store"
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    val terms = Seq("oak", "fir")
    val want = rows(Curation.bm25TopK(batchDf(0, 60), "doc_id", "text",
      terms, 10))
    assert(rows(TextIndex.topK(spark, dir, terms, 10)) == want,
      "the streamed store must serve the full-corpus scan answer")
    // legitimate at-least-once replay: skipped, stats not double-counted
    assert(!StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2), "replay must be skipped")
    val (n, _, nb) = TextIndex.readStats(spark, dir)
    assert(n == 60L && nb == 4,
      s"replay must not double-count corpus stats: n=$n nb=$nb")
    assert(rows(TextIndex.topK(spark, dir, terms, 10)) == want,
      "a skipped replay must not change serves")
    // ids going BACKWARD = checkpoint/store mismatch: refuse loudly
    intercept[IllegalStateException] {
      StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
        nBuckets = 4, filesPerBucket = 2)
    }
  }

  test("replay heals a crash between the data append and sidecar/stats work") {
    import graft.sinks.SkippingStore
    val root = java.nio.file.Files.createTempDirectory("textheal").toString
    val dir = s"$root/store"
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(StreamingMerge.applyTextBatch(batchDf(30, 50), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    // tear the post-append sidecar state back to the crash window:
    // batch 1's data + marker landed, but the zone extension and the
    // stats row were lost
    val keep = spark.read.parquet(s"$dir/_corpus_stats")
      .filter($"bid" =!= 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    graft.sinks.HadoopSwap.deleteRecursive(spark, s"$dir/_corpus_stats")
    keep.toSeq.toDF("bid", "n", "sdl", "nbuckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_corpus_stats")
    graft.sinks.HadoopSwap.deleteRecursive(spark, s"$dir/_zonemap_multi")
    assert(TextIndex.readStats(spark, dir)._1 == 30L,
      "fixture: batch 1's stats row must be torn before the replay")
    // the replay skips (data landed) AND heals both sidecars
    assert(!StreamingMerge.applyTextBatch(batchDf(30, 50), 1L, dir,
      nBuckets = 4, filesPerBucket = 2), "replay must be skipped")
    val (n, _, _) = TextIndex.readStats(spark, dir)
    assert(n == 50L, s"heal must re-add exactly the lost stats row: n=$n")
    val sc = SkippingStore.loadMultiSidecar(spark, dir, relative = true)
    assert(sc.isDefined && sc.get.byCol("w").size ==
      SkippingStore.listDataFileRelPaths(spark, dir).size,
      "heal must re-cover every data file")
    val terms = Seq("cedar", "pine")
    assert(rows(TextIndex.topK(spark, dir, terms, 10)) ==
      rows(Curation.bm25TopK(batchDf(0, 50), "doc_id", "text", terms, 10)),
      "the healed store must serve the full-corpus scan answer")
    // a second replay finds nothing to heal and stays idempotent
    assert(!StreamingMerge.applyTextBatch(batchDf(30, 50), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(TextIndex.readStats(spark, dir)._1 == 50L)
  }

  test("compaction preserves gate markers and stats bids mid-stream") {
    val root = java.nio.file.Files.createTempDirectory("textcmp").toString
    val dir = s"$root/store"
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    val (was, now) = TextIndex.compact(spark, dir, filesPerBucket = 2)
    assert(now < was, s"decayed store must shrink: $was -> $now")
    // the gate survived the rewrite: a replay of batch 1 still skips
    // (and stays a no-op, because its stats bid survived too)
    assert(!StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2),
      "compaction must not reset the replay gate")
    assert(TextIndex.readStats(spark, dir)._1 == 60L,
      "compaction + replay must not skew corpus stats")
    // and the stream continues: batch 2 applies normally
    assert(StreamingMerge.applyTextBatch(batchDf(60, 70), 2L, dir,
      nBuckets = 4, filesPerBucket = 2))
    val terms = Seq("elm", "rowan")
    assert(rows(TextIndex.topK(spark, dir, terms, 10)) ==
      rows(Curation.bm25TopK(batchDf(0, 70), "doc_id", "text", terms, 10)),
      "the compacted-then-extended store must serve the full corpus")
  }

  test("tombstones compose with the stream: masks persist across batches, replays, and the gate") {
    val root = java.nio.file.Files.createTempDirectory("textingestdel").toString
    val dir = s"$root/store"
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2))
    // mid-stream takedown of two already-ingested docs
    assert(TextIndex.delete(spark, dir, Seq(3L, 7L).toDF("doc_id"),
      "doc_id") == 2L)
    // later batches keep applying (no id overlap with the tombstones)
    assert(StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    val terms = Seq("oak", "fir")
    val want = rows(Curation.bm25TopK(
      batchDf(0, 60).filter(!$"doc_id".isin(3L, 7L)),
      "doc_id", "text", terms, 10))
    assert(rows(TextIndex.topK(spark, dir, terms, 10)) == want,
      "the streamed store must serve the survivors exactly")
    // an at-least-once replay neither resurrects nor double-counts
    assert(!StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(rows(TextIndex.topK(spark, dir, terms, 10)) == want,
      "a skipped replay must not disturb the tombstone mask")
    assert(TextIndex.readStats(spark, dir)._1 == 58L,
      "live doc count must reflect batches minus tombstones")
    // a NEW batch colliding with a pending tombstone refuses loudly
    // BEFORE any write — the stream surfaces the conflict instead of
    // silently shadowing the takedown
    intercept[IllegalArgumentException] {
      StreamingMerge.applyTextBatch(batchDf(3, 4), 2L, dir,
        nBuckets = 4, filesPerBucket = 2)
    }
    assert(rows(TextIndex.topK(spark, dir, terms, 10)) == want,
      "the refused batch must leave the store untouched")
  }
  test("positional streaming ingest: phrase serves stay exact; replays heal the marker") {
    val root = java.nio.file.Files.createTempDirectory("posingest").toString
    val dir = s"$root/store"
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2, positional = true))
    assert(StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2, positional = true))
    assert(TextIndex.isPositional(spark, dir))
    def phrase() = TextIndex.phraseSearch(spark, dir, Seq("oak", "fir"))
      .as[(Long, Long)].collect().toSeq.sorted
    val want = Curation.phraseSearch(batchDf(0, 60), "doc_id", "text",
      Seq("oak", "fir")).as[(Long, Long)].collect().toSeq.sorted
    assert(phrase() == want,
      "the streamed positional store must serve the corpus-scan adjacency")
    // replay skips; stats not double-counted
    assert(!StreamingMerge.applyTextBatch(batchDf(30, 60), 1L, dir,
      nBuckets = 4, filesPerBucket = 2, positional = true))
    assert(TextIndex.readStats(spark, dir)._1 == 60L)
    // crash window: batch 2's data landed but the stats row was lost
    // AND (worse) the positional marker vanished — the replay heals
    // both, and the store serves the 90-doc answer
    assert(StreamingMerge.applyTextBatch(batchDf(60, 90), 2L, dir,
      nBuckets = 4, filesPerBucket = 2, positional = true))
    val fs = graft.sinks.HadoopSwap.fs(spark, dir)
    val statFiles = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/_corpus_stats"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getModificationTime)
    assert(fs.delete(statFiles.last.getPath, false)) // lose batch 2's row
    assert(fs.delete(
      new org.apache.hadoop.fs.Path(s"$dir/_positional"), false))
    assert(!StreamingMerge.applyTextBatch(batchDf(60, 90), 2L, dir,
      nBuckets = 4, filesPerBucket = 2, positional = true),
      "the replayed batch heals, never re-appends data")
    assert(TextIndex.isPositional(spark, dir),
      "the heal must restore the positional marker")
    assert(TextIndex.readStats(spark, dir)._1 == 90L)
    assert(phrase() == Curation.phraseSearch(batchDf(0, 90), "doc_id",
      "text", Seq("oak", "fir")).as[(Long, Long)].collect().toSeq.sorted)
  }
}
