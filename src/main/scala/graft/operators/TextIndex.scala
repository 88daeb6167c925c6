package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted full-text postings store + store-served Okapi BM25 — the
  * text-retrieval sibling of the IVF postings store
  * ([[Similarity.ivfStoreBuild]]). [[Curation.bm25TopK]] re-tokenizes
  * and re-scans the corpus per query: the right shape for one ad-hoc
  * ranking, the wrong one for a retrieval SERVICE — at 100 TB every
  * query would pay a full corpus pass for a handful of terms.
  *
  * Here tokenization is paid ONCE at [[build]]: postings
  * `(w, doc_id, tf, dl)` land partitioned by
  * `tb = pmod(xxhash64(w), nBuckets)` and range-clustered by
  * `(tb, w)`, with the standard `_zonemap_multi` rider sidecar on `w`
  * ([[graft.sinks.SkippingStore.indexPartitioned]]) and a one-row
  * `_corpus_stats` sidecar `(n, sdl, nbuckets)` holding the exact
  * BIGINT document count and token-count sum. A [[topK]] serve then
  * composes THREE prunes before any posting is scored: partition
  * pruning opens only the query terms' buckets, the transparent zone
  * rule ([[graft.plans.ZonePruneRule]]) skips w-range-mismatched files
  * INSIDE them, and the residual `w IN (…)` rides parquet pushdown in
  * the survivors. Corpus stats come from the sidecar and are inlined
  * as literals (no stats frame, no join), so scoring touches terms'
  * postings only — never the corpus.
  *
  * Scoring math is [[Curation.bm25TopK]]'s verbatim (idf and per-term
  * contributions rounded to 6 decimals, summed as DECIMAL(28,6), avgdl
  * from the exact BIGINT sum), so a store-served answer is bit-stable
  * with the scan-everything path and with the SQL oracle. `df` is
  * derivable from the READ postings alone — a term's postings live
  * entirely inside its bucket — so no global df table is maintained.
  *
  * Lifecycle mirrors the IVF store: [[append]] tokenizes only the
  * batch, appends into the same `tb=` layout (the bucket hash is
  * frozen in `_corpus_stats` — re-deriving it would orphan every
  * existing posting), extends the zone sidecar over the new files
  * only, and bumps the corpus stats; serve needs no rebuild. Appends
  * decay file counts per bucket exactly like the IVF lists;
  * [[graft.sinks.StoreMaintenance]]-style compaction applies
  * unchanged (rewrite clustered by (tb, w), re-index, swap).
  */
object TextIndex {

  /** [[Curation.bm25TopK]]'s tokenizer, verbatim — the store and the
    * scan-everything path must agree on `dl` or scores drift. */
  private val TOK = "\\s+"

  private def statsPath(dir: String) = s"$dir/_corpus_stats"

  /** Per-(doc, term) postings with the frozen bucket key. */
  private def postings(docs: DataFrame, idCol: String, textCol: String,
                       nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        split(col(textCol), TOK).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(xxhash64(col("w")), lit(nBuckets)).cast("int"))

  /** Exact corpus stats over ALL docs (matching [[Curation.bm25TopK]]'s
    * `stats` aggregate): document count and BIGINT token-count sum. */
  private def docStats(docs: DataFrame, idCol: String,
                       textCol: String): (Long, Long) = {
    val r = docs
      .select(size(split(col(textCol), TOK)).cast("long").as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** `_corpus_stats` is APPEND-ONLY: one row `(bid, n, sdl, nbuckets)`
    * per build/append (bid = -1 for batch-API writes, the micro-batch
    * id for streaming ingest), summed at read. Appending a row instead
    * of rewriting a total kills the read-modify-write (no lost update
    * between concurrent appenders) and makes the streaming replay-heal
    * idempotent: a replayed batch re-adds its row only if its bid is
    * absent. Ordering contract: data files land BEFORE the stats row,
    * so a crash in between leaves a servable store whose scores lag
    * the tail batch — never a stats row describing postings that
    * don't exist (streaming replays heal the gap; see [[healBatch]]). */
  private def appendStatsRow(spark: SparkSession, dir: String, bid: Long,
                             n: Long, sdl: Long, nBuckets: Int): Unit = {
    import spark.implicits._
    Seq((bid, n, sdl, nBuckets)).toDF("bid", "n", "sdl", "nbuckets")
      .coalesce(1).write.mode("append").parquet(statsPath(dir))
  }

  /** Whether batch `bid`'s stats row already landed (the replay-heal
    * guard; bid-row reads prune to one tiny sidecar column). */
  private def statsRowExists(spark: SparkSession, dir: String,
                             bid: Long): Boolean =
    graft.sinks.HadoopSwap.exists(spark, statsPath(dir)) &&
      spark.read.parquet(statsPath(dir))
        .filter(col("bid") === bid).limit(1).count() > 0

  /** The store's `(n, sdl, nbuckets)` — total docs, total tokens
    * (summed over every applied batch's row), and the frozen bucket
    * count every append and serve must reuse. */
  private[graft] def readStats(spark: SparkSession,
                               dir: String): (Long, Long, Int) = {
    val df = spark.read.parquet(statsPath(dir))
    val nbs = df.select(col("nbuckets")).distinct()
      .collect().map(_.getInt(0))
    require(nbs.length == 1,
      s"${statsPath(dir)}: inconsistent bucket counts ${nbs.mkString(",")}")
    val r = df.agg(sum(col("n")), sum(col("sdl"))).head()
    (r.getLong(0), r.getLong(1), nbs.head)
  }

  /** Build the postings store: one tokenize pass, range-clustered by
    * (tb, w) into ~`nBuckets × filesPerBucket` files so each bucket's
    * files cover narrow term ranges (file-level w-zones stay
    * selective), w-zone sidecar, corpus-stats sidecar. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            storeDir: String, nBuckets: Int,
            filesPerBucket: Int = 1,
            marker: Option[Long] = None): Unit = {
    require(nBuckets >= 1 && filesPerBucket >= 1,
      "need at least one bucket and one file per bucket")
    val spark = docs.sparkSession
    val post = postings(docs, idCol, textCol, nBuckets)
    marker.fold(post)(b => post.withColumn("_applied_batch", lit(b)))
      .repartitionByRange(nBuckets * filesPerBucket, col("tb"), col("w"))
      .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
      .write.partitionBy("tb").mode("overwrite").parquet(storeDir)
    graft.sinks.SkippingStore.indexPartitioned(spark, storeDir, Seq("w"))
    val (n, sdl) = docStats(docs, idCol, textCol)
    appendStatsRow(spark, storeDir, marker.getOrElse(-1L), n, sdl, nBuckets)
  }

  /** Append a document batch: tokenize ONLY the batch, land postings
    * into the same frozen-bucket layout, extend the w-zone sidecar
    * over the new files only, bump `(n, sdl)`. Existing postings are
    * untouched — the batched cost is the batch's, like
    * [[Similarity.ivfStoreAppend]]. */
  def append(newDocs: DataFrame, idCol: String, textCol: String,
             storeDir: String, filesPerBucket: Int = 1,
             marker: Option[Long] = None): Unit = {
    require(filesPerBucket >= 1, "need at least one file per bucket")
    val spark = newDocs.sparkSession
    require(!isPositional(spark, storeDir),
      s"$storeDir is a positional store — append with appendPositional")
    val (_, _, nb) = readStats(spark, storeDir)
    val post = postings(newDocs, idCol, textCol, nb)
    marker.fold(post)(b => post.withColumn("_applied_batch", lit(b)))
      .repartitionByRange(nb * filesPerBucket, col("tb"), col("w"))
      .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
      .write.partitionBy("tb").mode("append").parquet(storeDir)
    graft.sinks.SkippingStore.indexPartitioned(spark, storeDir, Seq("w"))
    val (n1, sdl1) = docStats(newDocs, idCol, textCol)
    appendStatsRow(spark, storeDir, marker.getOrElse(-1L), n1, sdl1, nb)
  }

  /** Streaming replay-heal ([[graft.streaming.StreamingMerge]]): batch
    * `batchId`'s DATA is in the store (the `_applied_batch` gate said
    * so) but a crash may have lost the sidecar work that follows the
    * data append — re-extend the w-zone sidecar over any unmapped
    * files and re-add the batch's stats row iff its bid is absent.
    * Idempotent; the batch frame is the stream's redelivery, identical
    * by the checkpoint contract, so the recomputed stats row equals
    * the lost one. `nBuckets` comes from the ingest's configuration
    * (the frozen layout) for the corner where the stats sidecar
    * doesn't exist yet at all (crash inside the very first build). */
  private[graft] def healBatch(batch: DataFrame, idCol: String,
                               textCol: String, storeDir: String,
                               batchId: Long, nBuckets: Int): Unit = {
    val spark = batch.sparkSession
    graft.sinks.SkippingStore.indexPartitioned(spark, storeDir, Seq("w"))
    if (!statsRowExists(spark, storeDir, batchId)) {
      val nb =
        if (graft.sinks.HadoopSwap.exists(spark, statsPath(storeDir)))
          readStats(spark, storeDir)._3
        else nBuckets
      require(nb == nBuckets,
        s"healBatch($storeDir): ingest configured $nBuckets buckets but " +
          s"the store froze $nb — checkpoint and store are not a pair")
      val (n, sdl) = docStats(batch, idCol, textCol)
      appendStatsRow(spark, storeDir, batchId, n, sdl, nb)
    }
  }

  /** Compact the postings store: rewrite every bucket re-clustered by
    * (tb, w) into ~`nBuckets × filesPerBucket` files, REBUILD the
    * w-zone sidecar over the new files, carry the corpus stats over
    * verbatim (compaction moves postings, never changes N/Σdl/the
    * bucket hash), and swap rename-aside ([[graft.sinks.HadoopSwap]];
    * object stores route through a VersionedStore manifest commit
    * instead, same caveat as the IVF store). Heals [[append]]'s
    * one-file-per-bucket-per-batch decay AND restores narrow per-file
    * w ranges — append files span each batch's whole term range, so
    * their zones are wide and the zone rule can't skip them; after
    * compaction single-term serves are back to ~1/filesPerBucket of
    * their bucket. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, storeDir: String,
              filesPerBucket: Int = 1): (Int, Int) = {
    require(filesPerBucket >= 1, "need at least one file per bucket")
    import graft.sinks.{HadoopSwap, SkippingStore}
    val (_, _, nb) = readStats(spark, storeDir)
    val before = SkippingStore.listDataFileRelPaths(spark, storeDir).size
    val tmp = storeDir + "_compact_tmp"
    val aside = storeDir + "_compact_old"
    HadoopSwap.deleteRecursive(spark, tmp)
    HadoopSwap.deleteRecursive(spark, aside)
    // mergeSchema: batch-API files carry no _applied_batch column while
    // streaming-ingested files do — the rewrite must preserve every
    // marker (null for batch rows) or compaction would reset the gate
    spark.read.option("mergeSchema", "true").parquet(storeDir)
      .repartitionByRange(nb * filesPerBucket, col("tb"), col("w"))
      .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
      .write.partitionBy("tb").mode("overwrite").parquet(tmp)
    SkippingStore.indexPartitioned(spark, tmp, Seq("w"))
    // stats rows carry VERBATIM (bids included): totals are unchanged
    // by construction, and a streaming replay arriving right after the
    // swap still finds its bid row — the heal guard survives
    spark.read.parquet(statsPath(storeDir))
      .coalesce(1).write.mode("overwrite").parquet(statsPath(tmp))
    // the positional marker is part of the layout — carry it or the
    // compacted store would silently refuse phrase serves
    if (isPositional(spark, storeDir)) writeMarker(spark, tmp)
    HadoopSwap.swapInto(spark, tmp, storeDir, aside)
    (before, SkippingStore.listDataFileRelPaths(spark, storeDir).size)
  }

  // ------------------------------------------------------------------
  // POSITIONAL postings — the phrase-search extension of the store.
  // [[graft.operators.Curation.phraseSearch]] (q193) re-tokenizes the
  // whole corpus per query, exactly the shape this store exists to
  // kill: here each posting carries its sorted in-document position
  // list `(tb, w, doc_id, tf, dl, pos)`, so exact adjacency is served
  // from the terms' buckets alone — same bucket hash, same (tb, w)
  // clustering, same w-zone sidecar and corpus-stats discipline as
  // the bag-of-terms store. Tokenization matches phraseSearch
  // verbatim (whitespace split, empty tokens dropped, 0-based
  // posexplode positions); tf/dl derive from the SAME filtered token
  // stream so the positional store is internally consistent. A
  // `_positional` marker file keeps the two posting schemas from
  // silently mixing: [[append]] refuses a positional store and
  // [[appendPositional]] refuses a bag-of-terms one.

  private def positionalMarker(dir: String) = s"$dir/_positional"

  private def writeMarker(spark: SparkSession, dir: String): Unit = {
    val fs = graft.sinks.HadoopSwap.fs(spark, dir)
    fs.create(new org.apache.hadoop.fs.Path(positionalMarker(dir)), true)
      .close()
  }

  private[graft] def isPositional(spark: SparkSession, dir: String): Boolean =
    graft.sinks.HadoopSwap.exists(spark, positionalMarker(dir))

  /** Per-(doc, term) postings with the frozen bucket key AND the
    * sorted position list — [[Curation.phraseSearch]]'s tokenizer,
    * verbatim, so store-served adjacency is bit-stable with the
    * scan-everything path. */
  private def positionalPostings(docs: DataFrame, idCol: String,
                                 textCol: String,
                                 nBuckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        filter(split(col(textCol), TOK), w => length(w) > 0).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .select(col("doc_id"), col("dl"),
        posexplode(col("toks")).as(Seq("p", "w")))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("p"))).as("pos"))
      .withColumn("tb", pmod(xxhash64(col("w")), lit(nBuckets)).cast("int"))

  /** Build the positional postings store — [[build]]'s layout with the
    * position list riding each posting. */
  def buildPositional(docs: DataFrame, idCol: String, textCol: String,
                      storeDir: String, nBuckets: Int,
                      filesPerBucket: Int = 1): Unit = {
    require(nBuckets >= 1 && filesPerBucket >= 1,
      "need at least one bucket and one file per bucket")
    val spark = docs.sparkSession
    positionalPostings(docs, idCol, textCol, nBuckets)
      .repartitionByRange(nBuckets * filesPerBucket, col("tb"), col("w"))
      .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
      .write.partitionBy("tb").mode("overwrite").parquet(storeDir)
    writeMarker(spark, storeDir)
    graft.sinks.SkippingStore.indexPartitioned(spark, storeDir, Seq("w"))
    val (n, sdl) = docStats(docs, idCol, textCol)
    appendStatsRow(spark, storeDir, -1L, n, sdl, nBuckets)
  }

  /** Append a batch to a positional store — batch-only tokenize,
    * frozen bucket hash, sidecar extension, stats bump; the
    * [[append]] cost model with positions. */
  def appendPositional(newDocs: DataFrame, idCol: String, textCol: String,
                       storeDir: String, filesPerBucket: Int = 1): Unit = {
    require(filesPerBucket >= 1, "need at least one file per bucket")
    val spark = newDocs.sparkSession
    require(isPositional(spark, storeDir),
      s"$storeDir is a bag-of-terms store — append with TextIndex.append")
    val (_, _, nb) = readStats(spark, storeDir)
    positionalPostings(newDocs, idCol, textCol, nb)
      .repartitionByRange(nb * filesPerBucket, col("tb"), col("w"))
      .sortWithinPartitions(col("tb"), col("w"), col("doc_id"))
      .write.partitionBy("tb").mode("append").parquet(storeDir)
    graft.sinks.SkippingStore.indexPartitioned(spark, storeDir, Seq("w"))
    val (n1, sdl1) = docStats(newDocs, idCol, textCol)
    appendStatsRow(spark, storeDir, -1L, n1, sdl1, nb)
  }

  /** Store-served EXACT phrase search — bit-stable with
    * [[graft.operators.Curation.phraseSearch]] over the store's
    * documents, without touching a document: reads only the phrase
    * terms' buckets (partition pruning on the writer's own hash, like
    * [[topK]]) and the w-zone-surviving files inside them, then
    * intersects shifted position lists per document —
    * `pos(w_i) - i` across the phrase — so a surviving position IS a
    * phrase start. Joins are postings-list-sized; the corpus never
    * appears in the plan. Returns (doc_id, n_occurrences), matching
    * docs only. */
  def phraseSearch(spark: SparkSession, storeDir: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "a 1-token phrase is a plain term lookup")
    require(isPositional(spark, storeDir),
      s"$storeDir carries no positions — build with buildPositional")
    import spark.implicits._
    val (_, _, nb) = readStats(spark, storeDir)
    val terms = phrase.distinct
    val buckets = terms.toDF("w")
      .select(pmod(xxhash64(col("w")), lit(nb)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val post = spark.read.parquet(storeDir)
      .filter(col("tb").isin(buckets: _*))
      .filter(col("w").isin(terms: _*))
      .select(col("w"), col("doc_id"), col("pos"))
    val first = post.filter(col("w") === phrase.head)
      .select(col("doc_id"), col("pos").as("acc"))
    val matched = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (w, i)) =>
        acc.join(post.filter(col("w") === w)
            .select(col("doc_id"),
              transform(col("pos"), p => p - i).as("shifted")),
            Seq("doc_id"))
          .select(col("doc_id"),
            array_intersect(col("acc"), col("shifted")).as("acc"))
          .filter(size(col("acc")) > 0)
    }
    matched.select(col("doc_id"),
      size(col("acc")).cast("long").as("n_occurrences"))
  }

  /** SELECTIVE compaction: rewrite only the term buckets whose file
    * count exceeds `maxFilesPerBucket` — append decay is term-skewed
    * (a batch's heavy terms land more files in their buckets), so at
    * scale healing the decayed buckets must not rewrite the rest of
    * the postings. Delegates to the generic partitioned-store pass
    * ([[graft.sinks.SkippingStore.compactPartitionsSelective]]):
    * decayed buckets re-cluster by (tb, w, doc_id) into
    * ~`filesPerBucket` files each, untouched buckets keep their
    * paths and mtimes, the w-zone sidecar is reconciled (replaced
    * files' rows dropped, fresh rows over only the new files), and
    * `_corpus_stats` is untouched — compaction moves postings, never
    * changes N/Σdl/the bucket hash. Serves are bit-identical across
    * it. Returns (rewritten bucket dirs, filesBefore, filesAfter). */
  def compactSelective(spark: SparkSession, storeDir: String,
                       maxFilesPerBucket: Int,
                       filesPerBucket: Int = 1): (Seq[String], Int, Int) =
    graft.sinks.SkippingStore.compactPartitionsSelective(
      spark, storeDir, "tb", maxFilesPerBucket, filesPerBucket,
      extraSortCols = Seq("doc_id"))

  /** Store-served BM25 top-k for a driver-held term set — bit-stable
    * with `Curation.bm25TopK(corpus, …)` over the store's documents.
    * Reads only the query terms' buckets (partition pruning; the
    * bucket keys come from the engine evaluating the writer's own
    * hash over the terms-sized frame, never a driver
    * reimplementation), then only the w-zone-surviving files inside
    * them. The only broadcast is the terms-sized `df` table (q133's
    * documented model-state family); the sidecar's corpus stats are
    * driver-held longs, so `n`/`avgdl` inline as literals through the
    * SAME round/divide expressions the scan path evaluates — constant
    * folding runs the identical Catalyst math once at plan time. */
  def topK(spark: SparkSession, storeDir: String, terms: Seq[String],
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "need at least one query term")
    import spark.implicits._
    val (n, sdl, nb) = readStats(spark, storeDir)
    val buckets = terms.toDF("w")
      .select(pmod(xxhash64(col("w")), lit(nb)).cast("int").as("tb"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val tf = spark.read.parquet(storeDir)
      .filter(col("tb").isin(buckets: _*))
      .filter(col("w").isin(terms: _*))
    // a term's postings live entirely inside its bucket, so df over the
    // READ postings is the exact corpus df
    val dfT = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val avgdl = round(lit(sdl).cast("double") / lit(n), 6)
    tf.join(broadcast(dfT), Seq("w"))
      .withColumn("idf", round(
        log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)), 6))
      .withColumn("c", round(
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / avgdl)),
        6).cast("decimal(28,6)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("c")).cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
