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

  test("streamed appends maintain the vocab sidecar: extensions are " +
      "batch-only, replays heal lost vocab rows, folds keep the gate") {
    val root = java.nio.file.Files.createTempDirectory("textvocab").toString
    val dir = s"$root/store"
    def recompute(d: DataFrame): Seq[(String, Long)] =
      d.select($"doc_id", explode(split($"text", "\\s+")).as("w"))
        .distinct().groupBy($"w").agg(count(lit(1)).as("df"))
        .orderBy($"w").as[(String, Long)].collect().toSeq
    def vocabRows(): Seq[(String, Long)] =
      TextIndex.vocabulary(spark, dir)
        .orderBy($"w").as[(String, Long)].collect().toSeq
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2))
    TextIndex.buildVocab(spark, dir)
    assert(StreamingMerge.applyTextBatch(batchDf(30, 45), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(StreamingMerge.applyTextBatch(batchDf(45, 60), 2L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(vocabRows() == recompute(batchDf(0, 60)),
      "streamed batch-only extensions must land the union's exact df")
    // expansion-served BM25 == the scan answer on the full corpus
    val exp = TextIndex.expandPrefix(spark, dir, "p")
    assert(rows(TextIndex.wildcardTopK(spark, dir, "p", 10)) ==
      rows(Curation.bm25TopK(batchDf(0, 60), "doc_id", "text", exp, 10)))
    // legitimate replay: skipped, vocab not double-counted
    assert(!StreamingMerge.applyTextBatch(batchDf(45, 60), 2L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(vocabRows() == recompute(batchDf(0, 60)))
    // crash window: batch 2's data + stats landed but its vocab rows
    // were lost — tear them, then the replay's heal must re-extend
    val keep = spark.read.parquet(s"$dir/_vocab")
      .filter($"bid" =!= 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    graft.sinks.HadoopSwap.deleteRecursive(spark, s"$dir/_vocab")
    keep.toSeq.toDF("bid", "w", "df")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_vocab")
    assert(vocabRows() != recompute(batchDf(0, 60)),
      "fixture: batch 2's vocab rows must be torn before the replay")
    assert(!StreamingMerge.applyTextBatch(batchDf(45, 60), 2L, dir,
      nBuckets = 4, filesPerBucket = 2), "replay must be skipped")
    assert(vocabRows() == recompute(batchDf(0, 60)),
      "the heal must re-extend exactly the lost batch")
    // fold mid-stream, then another batch and its replay: the folded
    // bid high-water mark keeps the replay guard answering
    assert(graft.sinks.SidecarFold.foldIfDecayed(spark, s"$dir/_vocab", 1)(
      _.groupBy($"w").agg(max($"bid").as("bid"), sum($"df").as("df"))
        .select($"bid", $"w", $"df")))
    assert(StreamingMerge.applyTextBatch(batchDf(60, 70), 3L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(!StreamingMerge.applyTextBatch(batchDf(60, 70), 3L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(vocabRows() == recompute(batchDf(0, 70)),
      "post-fold appends and replays must stay exactly-once")
  }

  test("compaction inside the lost-vocab-row window: the rebuilt " +
      "vocab's hwm covers every stats-applied batch, so the replay " +
      "does not re-extend df the rebuild already counted") {
    val root = java.nio.file.Files.createTempDirectory("textvcmp").toString
    val dir = s"$root/store"
    def recompute(d: DataFrame): Seq[(String, Long)] =
      d.select($"doc_id", explode(split($"text", "\\s+")).as("w"))
        .distinct().groupBy($"w").agg(count(lit(1)).as("df"))
        .orderBy($"w").as[(String, Long)].collect().toSeq
    def vocabRows(): Seq[(String, Long)] =
      TextIndex.vocabulary(spark, dir)
        .orderBy($"w").as[(String, Long)].collect().toSeq
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2))
    TextIndex.buildVocab(spark, dir)
    assert(StreamingMerge.applyTextBatch(batchDf(30, 45), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(StreamingMerge.applyTextBatch(batchDf(45, 60), 2L, dir,
      nBuckets = 4, filesPerBucket = 2))
    // the healBatch crash window: batch 2's data + stats row landed
    // but its vocab extension was lost …
    val keep = spark.read.parquet(s"$dir/_vocab")
      .filter($"bid" =!= 2L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    graft.sinks.HadoopSwap.deleteRecursive(spark, s"$dir/_vocab")
    keep.toSeq.toDF("bid", "w", "df")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_vocab")
    // … and compaction runs BEFORE the redelivery: the rebuild counts
    // batch 2's docs from the rewritten postings, so its bid stamp
    // must cover batch 2 (stats hwm), not just the torn vocab's max
    TextIndex.compact(spark, dir, filesPerBucket = 2)
    assert(vocabRows() == recompute(batchDf(0, 60)),
      "the rebuild itself must land the exact corpus df")
    assert(!StreamingMerge.applyTextBatch(batchDf(45, 60), 2L, dir,
      nBuckets = 4, filesPerBucket = 2), "replay must be skipped")
    assert(vocabRows() == recompute(batchDf(0, 60)),
      "the redelivered batch must not re-extend df the compaction " +
        "rebuild already counted")
    // the stream continues normally past the healed window
    assert(StreamingMerge.applyTextBatch(batchDf(60, 70), 3L, dir,
      nBuckets = 4, filesPerBucket = 2))
    assert(vocabRows() == recompute(batchDf(0, 70)))
  }

  test("streamed appends maintain the block-max sidecar: pruned serves " +
      "stay exact mid-stream, torn coverage heals at serve time") {
    val root = java.nio.file.Files.createTempDirectory("textbmx").toString
    val dir = s"$root/store"
    def check(terms: Seq[String], upto: Long): Unit = {
      assert(rows(TextIndex.topKPruned(spark, dir, terms, 10)) ==
        rows(Curation.bm25TopK(batchDf(0, upto), "doc_id", "text",
          terms, 10)),
        s"pruned serve must equal the scan answer at $upto docs")
      assert(!TextIndex.lastPruneStats.get.delegated)
    }
    assert(StreamingMerge.applyTextBatch(batchDf(0, 30), 0L, dir,
      nBuckets = 4, filesPerBucket = 2))
    TextIndex.buildBlockStats(spark, dir)
    assert(StreamingMerge.applyTextBatch(batchDf(30, 45), 1L, dir,
      nBuckets = 4, filesPerBucket = 2))
    check(Seq("oak", "fir"), 45)
    // crash window: batch 2's data landed but the blockmax extension
    // was lost — coverage tears by WHOLE FILES (each extension lands
    // atomically as one parquet job; a crash loses it entirely, never
    // half a file's rows), then the next pruned serve must re-cover
    // (file-coverage heal) and stay exact
    assert(StreamingMerge.applyTextBatch(batchDf(45, 60), 2L, dir,
      nBuckets = 4, filesPerBucket = 2))
    val live = graft.sinks.SkippingStore
      .listDataFileRelPaths(spark, dir).toSet
    val keep = spark.read.parquet(s"$dir/_blockmax")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .filter(t => live(t._1))
    val keepFiles = {
      val fs = keep.map(_._1).distinct
      fs.take(fs.length / 2).toSet
    }
    val torn = keep.filter(t => keepFiles(t._1))
    graft.sinks.HadoopSwap.deleteRecursive(spark, s"$dir/_blockmax")
    torn.toSeq.toDF("file", "w", "cnt", "maxtf", "mindl", "maxdl",
        "sumtf")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_blockmax")
    check(Seq("cedar", "pine"), 60)
    check(Seq("oak"), 60)
    // replays add nothing (coverage-keyed idempotence)
    assert(!StreamingMerge.applyTextBatch(batchDf(45, 60), 2L, dir,
      nBuckets = 4, filesPerBucket = 2))
    check(Seq("oak", "fir"), 60)
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
  test("positional stream crosses the fold threshold mid-stream: sidecars stay bounded, concurrent phrase readers exact across the folds") {
    // vocabulary split makes the concurrent assertion deterministic:
    // docs 0-39 carry the probed phrase, docs 40-69 use a DISJOINT
    // vocabulary — so the phrase answer is FIXED while late batches
    // append and the `_corpus_stats`/`_doclen` folds fire (threshold
    // 64 is crossed at batch ~64 of 70), and a reader racing an
    // in-flight append can only ever see postings that cannot move
    // its answer. phraseSearch reads corpus stats only for the frozen
    // bucket count, so it exercises the fold-heal read path on every
    // serve without depending on n/sdl mid-bump.
    val root = java.nio.file.Files.createTempDirectory("posfold").toString
    val dir = s"$root/store"
    def early(i: Long) = (i, s"alpha beta gamma w$i")
    def late(i: Long) = (i, s"zeta eta theta z$i")
    (0L until 40L).foreach { i =>
      assert(StreamingMerge.applyTextBatch(Seq(early(i)).toDF("doc_id", "text"),
        i, dir, nBuckets = 4, filesPerBucket = 1, positional = true))
    }
    val want = TextIndex.phraseSearch(spark, dir, Seq("alpha", "beta"))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(want == (0L until 40L).map(i => (i, 1L)),
      "fixture: every early doc carries exactly one phrase occurrence")
    // concurrent readers hammer the store while the stream crosses
    // the fold threshold: every serve must be EXACT — a fold-swap
    // window read heals and answers, never errors, never drops docs
    @volatile var stop = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val readers = (1 to 2).map(_ => new Thread(() => {
      while (!stop) {
        try {
          val got = TextIndex.phraseSearch(spark, dir, Seq("alpha", "beta"))
            .as[(Long, Long)].collect().toSeq.sorted
          if (got != want)
            failures.add(s"phrase drifted under fold/append: $got")
        } catch {
          case e: Throwable => failures.add(s"reader threw: $e")
        }
      }
    }))
    readers.foreach(_.start())
    try {
      (40L until 70L).foreach { i =>
        assert(StreamingMerge.applyTextBatch(Seq(late(i)).toDF("doc_id", "text"),
          i, dir, nBuckets = 4, filesPerBucket = 1, positional = true))
      }
    } finally {
      stop = true
      readers.foreach(_.join(60000))
    }
    assert(failures.isEmpty, s"concurrent serves must stay exact: " +
      s"${failures.toArray.take(3).mkString("; ")}")
    // the folds really fired mid-stream: 70 one-file appends, bounded
    // sidecar file counts at the end
    val fs = graft.sinks.HadoopSwap.fs(spark, dir)
    def filesIn(side: String) = fs.listStatus(
        new org.apache.hadoop.fs.Path(side))
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    assert(filesIn(s"$dir/_corpus_stats") <= 64,
      "the stats sidecar must have folded mid-stream")
    assert(filesIn(s"$dir/_doclen") <= 64,
      "the doclen sidecar must have folded mid-stream")
    // after the storm: stats exact, phrase unchanged, AND the unified
    // ranking serves answer from the same positional store
    assert(TextIndex.readStats(spark, dir)._1 == 70L)
    assert(TextIndex.phraseSearch(spark, dir, Seq("alpha", "beta"))
      .as[(Long, Long)].collect().toSeq.sorted == want)
    val corpus = ((0L until 40L).map(early) ++ (40L until 70L).map(late))
      .toDF("doc_id", "text")
    assert(rows(TextIndex.topK(spark, dir, Seq("alpha", "zeta"), 10)) ==
      rows(Curation.bm25TopK(corpus, "doc_id", "text",
        Seq("alpha", "zeta"), 10)),
      "post-fold BM25 from the positional store must equal the scan path")
    // the replay gate survived the folds: the last bid still skips
    // (its stats row was swallowed into the fold's hwm row)
    assert(!StreamingMerge.applyTextBatch(Seq(late(69L)).toDF("doc_id", "text"),
      69L, dir, nBuckets = 4, filesPerBucket = 1, positional = true))
    assert(TextIndex.readStats(spark, dir)._1 == 70L)
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
