package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale corpus curation.
  *
  * Scale extensions beyond the reference's relational dedup (SURVEY.md
  * §2.5 A5 `DISTINCT`, §2.6 W1 window-dedup): exact content hashing,
  * MinHash+LSH banding, SimHash, and n-gram Jaccard — the standard
  * near-duplicate toolkit for training-data pipelines.
  *
  * Determinism: all hashing is md5-based (not `hash()`/`xxhash64`) so a
  * SQL oracle can reproduce results byte-for-byte. The MinHash family is
  * "lexicographic min of md5(seed:shingle)" — a valid min-wise independent
  * family, and portable to any engine with md5.
  *
  * Scale notes: every step is a shuffle on either doc_id or
  * shingle/bucket; no driver-side state. At 100 TB the shingle explode is
  * the big intermediate — it flows straight into partial aggregation
  * (min per doc) so the map-side combiner keeps shuffle volume at
  * O(docs × numHashes), not O(tokens). LSH banding makes candidate
  * generation O(collisions) instead of O(n²).
  */
object Dedup {

  /** Tokenize + distinct word n-gram shingles: (doc_id, shingle).
    * Dedup happens per doc with `array_distinct` BEFORE the explode —
    * (doc_id, shingle) pairs are then globally unique by construction,
    * so no shuffle is spent on a `distinct()` (map-only operator). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(0, size(toks) - $n), i -> " +
          (0 until n).map(j => s"toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")") + "))"
      )).as("shingle"))
  }

  /** Exact dedup: group identical content by md5, keep the smallest id.
    * (SURVEY.md A5 as content-hash dedup.) */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: numHashes lexicographic-min md5 values per doc,
    * from an exploded (doc_id, shingle) frame — shuffles shingles into a
    * groupBy. Prefer [[minhashSignatureDirect]] where the input is the
    * document table itself. */
  def minhashSignature(sh: DataFrame, numHashes: Int): DataFrame =
    sh.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("0:"), col("shingle")))).as("h0"),
      (1 until numHashes).map(i =>
        min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i")): _*)

  /** Map-only MinHash: tokenize -> shingle array -> one-pass native
    * [[graft.functions.MinHashMd5]] expression per row. Identical output
    * to [[minhashSignature]] over [[shingles]], with zero shuffles —
    * the 100 TB-shaped plan (signatures reduce each doc to numHashes
    * strings before anything wide happens). */
  /** The shared tokenize step: (doc_id, toks) with at least n tokens. */
  private def tokens(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)

  /** The distinct word-n-gram array expression over `toks` — the ONE
    * definition of this engine's shingling, shared by MinHash, the
    * Jaccard inverted index, and the prefix-filtered join (their
    * identical-output contracts depend on identical tokenization). */
  private def shingleArr(n: Int) = expr(
    s"array_distinct(transform(sequence(0, size(toks) - $n), i -> " +
      (0 until n).map(j => s"toks[i + $j]").mkString("concat_ws(' ', ", ", ", ")") + "))")

  /** Checkpointed compact per-doc shingle arrays: (doc_id, sh_arr) —
    * one row per doc, materialized once because sizes, df caps, and
    * both self-join sides re-derive from it. */
  private def shingleArrayBase(docs: DataFrame, idCol: String, textCol: String,
                               n: Int): DataFrame =
    tokens(docs, idCol, textCol, n)
      .select(col("doc_id"), shingleArr(n).as("sh_arr"))
      .localCheckpoint()

  /** MinHash signature columns (h0..h{n-1}) from a (doc_id, sh_arr)
    * frame — the from-arrays half of [[minhashSignatureDirect]], shared
    * with [[lshRecall]] so a caller that already holds the shingle
    * arrays never re-tokenizes. */
  private def minhashFromArrays(base: DataFrame, numHashes: Int): DataFrame = {
    val sig = base.select(col("doc_id"),
      graft.functions.VectorFunctions.minhash_md5(col("sh_arr"), numHashes).as("sig"))
    sig.select(col("doc_id") +:
      (0 until numHashes).map(i => element_at(col("sig"), i + 1).as(s"h$i")): _*)
  }

  def minhashSignatureDirect(docs: DataFrame, idCol: String, textCol: String,
                             n: Int, numHashes: Int): DataFrame =
    minhashFromArrays(
      tokens(docs, idCol, textCol, n).select(col("doc_id"), shingleArr(n).as("sh_arr")),
      numHashes)

  private def lshBands(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    // the signature frame feeds numBands branches and both join sides —
    // checkpoint once so the shingle+minhash pipeline runs once, not 2·b×
    val s = sig.localCheckpoint()
    (0 until numBands).map { b =>
      val slots = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      s.select(col("doc_id"), lit(b).as("band"), md5(concat(slots: _*)).as("bucket"))
    }.reduce(_ unionByName _)
  }

  /** The (doc_id, band, bucket) band-signature frame as a public entry
    * point — the unit an LSH signature STORE persists. An append-only
    * corpus keeps this frame on disk keyed by (band, bucket) (bucketed
    * layout at cluster scale), so arriving batches are deduped against
    * the whole history by [[incrementalDuplicates]] without ever
    * re-signaturing old documents. */
  def bandSignatures(docs: DataFrame, idCol: String, textCol: String,
                     n: Int, numHashes: Int, rowsPerBand: Int): DataFrame =
    lshBands(minhashSignatureDirect(docs, idCol, textCol, n, numHashes),
      numHashes, rowsPerBand)

  // ------------------------------------------------------------------
  // Tombstoned deletes for the signature store — the takedown shape for
  // continuous-crawl dedup: a removed document's signatures must stop
  // flagging future near-dups (otherwise a takedown keeps its whole
  // near-dup cluster out of the corpus forever), and the removal must
  // not rewrite the store (O(deleted) event, not O(corpus)). Same
  // sidecar discipline as the text/IVF postings stores: one atomic
  // `_tombstones` append, reads anti-join the deleted-ids-sized set,
  // physical purge rides the compaction the store needs anyway.

  private def sigTombPath(dir: String) = s"$dir/_tombstones"

  private def readSigTombstones(spark: org.apache.spark.sql.SparkSession,
                                dir: String): Option[DataFrame] = {
    // fold-crash heal FIRST: a tombstone sidecar parked under a fold
    // aside must never read as "no deletes" (silent resurrection)
    graft.sinks.SidecarFold.restoreAside(spark, sigTombPath(dir))
    if (!graft.sinks.HadoopSwap.exists(spark, sigTombPath(dir))) None
    else Some(spark.read.parquet(sigTombPath(dir))
      .select(col("doc_id")).distinct())
  }

  /** The signature store's LIVE rows — every reader goes through this
    * (never a raw `spark.read.parquet(storeDir)`), so a tombstoned
    * doc's signatures are invisible the instant the delete lands.
    * mergeSchema keeps the streaming `_applied_batch` marker across
    * mixed batch/streaming files. */
  def readSignatureStore(spark: org.apache.spark.sql.SparkSession, storeDir: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(storeDir)
    readSigTombstones(spark, storeDir).fold(raw)(tb =>
      raw.join(tb, Seq("doc_id"), "left_anti"))
  }

  /** DELETE documents' signatures from the store: append their ids to
    * the `_tombstones` sidecar (one coalesced file — atomic
    * visibility). Already-tombstoned ids are skipped; unknown ids are
    * accepted (they mask nothing and vanish at the next purge).
    * Returns the number of ids newly tombstoned. Purge via
    * [[purgeSignatureStore]] or [[ingestBatch]]'s compact arm — NOT
    * via the generic [[graft.sinks.StoreMaintenance.compact]], whose
    * whole-dir swap would drop the sidecar without purging the rows. */
  def signatureStoreDelete(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                           ids: DataFrame, idCol: String): Long = {
    val want0 = ids.select(col(idCol).as("doc_id")).distinct()
    val want = readSigTombstones(spark, storeDir)
      .fold(want0)(tb => want0.join(tb, Seq("doc_id"), "left_anti"))
      .persist()
    try {
      val nDel = want.count()
      if (nDel > 0L) {
        want.coalesce(1).write.mode("append").parquet(sigTombPath(storeDir))
        // fold-on-threshold: every store read anti-joins this sidecar —
        // thousands of one-file deletes must stay a bounded read. The
        // fold rewrites through the read-side distinct (same set).
        graft.sinks.SidecarFold.foldIfDecayed(spark,
          sigTombPath(storeDir), 64)(
          _.select(col("doc_id")).distinct())
      }
      nDel
    } finally { want.unpersist(); () }
  }

  /** Compact the signature store into ≈ `targetBytes`-sized files AND
    * physically purge any tombstoned rows, clearing the sidecar in the
    * same atomic swap (the rewrite lands in a temp sibling with no
    * `_tombstones`, so readers see masked-then-purged, never a
    * resurrection). mergeSchema preserves the streaming replay markers
    * across mixed batch/streaming files — a compaction must never
    * reset the gate. Returns (filesBefore, filesAfter). */
  def purgeSignatureStore(spark: org.apache.spark.sql.SparkSession, storeDir: String,
                          targetBytes: Long): (Int, Int) = {
    import graft.sinks.{HadoopSwap, StoreMaintenance}
    val before = HadoopSwap.parquetFileCount(spark, storeDir)
    val bytes = HadoopSwap.dirBytes(spark, storeDir)
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    StoreMaintenance.overwriteViaSwap(
      readSignatureStore(spark, storeDir).repartition(nFiles), storeDir)
    (before, HadoopSwap.parquetFileCount(spark, storeDir))
  }

  /** Incremental (delta-vs-store) dedup: for each incoming doc, the
    * number of its bands whose bucket already exists in the signature
    * store, plus the smallest matching store doc id as the canonical
    * prior copy. Docs with no hit are absent — callers anti-join to
    * admit novel documents.
    *
    * Scale notes: the join key is (band, bucket); with the store laid
    * out bucketed on that key only the DELTA shuffles — the historical
    * side streams from its buckets. Cost per batch is proportional to
    * the batch, not the corpus, which is what makes continuous-crawl
    * dedup feasible at 100 TB. */
  def incrementalDuplicates(incoming: DataFrame, store: DataFrame): DataFrame =
    incoming.select(col("doc_id"), col("band"), col("bucket"))
      .join(store.select(col("band"), col("bucket"),
        col("doc_id").as("store_doc")), Seq("band", "bucket"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("band")).as("n_bands_hit"),
        min(col("store_doc")).as("first_match"))

  /** One batch of the persisted-store dedup lifecycle (the q142 shape
    * productionized, `cli:dedupingest`): report duplicates of `docs`
    * against the signature store at `storeDir` (written to `dupesOut`),
    * append the NOVEL documents' signatures to the store, and — when
    * `compactTargetBytes` is set — rewrite the store into
    * ~target-sized files via [[graft.sinks.StoreMaintenance.compact]].
    * A year of per-batch appends otherwise decays into a small-file
    * store whose (band, bucket) join pays per-file open cost; periodic
    * compaction restores scan efficiency and NEVER changes results
    * (row set is preserved — spec'd). The dupes report is materialized
    * BEFORE the append, so a batch never matches its own signatures.
    * Returns (batchDocs, duplicateDocs, storeFilesAfter). */
  def ingestBatch(docs: DataFrame, idCol: String, textCol: String,
                  storeDir: String, dupesOut: String,
                  compactTargetBytes: Option[Long] = None,
                  n: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 4,
                  markerBatch: Option[Long] = None)
      : (Long, Long, Int) = {
    val spark = docs.sparkSession
    val sigs = bandSignatures(docs.select(col(idCol).as("doc_id"),
      col(textCol).as("text")), "doc_id", "text", n, numHashes, rowsPerBand)
      .persist()
    try {
      val p = new org.apache.hadoop.fs.Path(storeDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val exists = fs.exists(p)
      // a batch re-using a TOMBSTONED id would have its new signatures
      // silently masked by the pending tombstone — fail loud before any
      // write (the text/IVF append discipline); purge-then-reingest is
      // the resurrection path
      if (exists) readSigTombstones(spark, storeDir).foreach { tb =>
        val clash = sigs.select(col("doc_id")).distinct()
          .join(tb, Seq("doc_id"), "left_semi").limit(1).count()
        require(clash == 0L,
          s"$storeDir: batch re-uses tombstoned doc ids — purge " +
            "(purgeSignatureStore / the compact arm) first")
      }
      val store0 =
        if (exists) readSignatureStore(spark, storeDir)
        else sigs.limit(0) // first batch: empty store, same schema
      incrementalDuplicates(sigs, store0)
        .write.mode("overwrite").parquet(dupesOut)
      val dupIds = spark.read.parquet(dupesOut).select(col("doc_id"))
      val novel = sigs.join(dupIds, Seq("doc_id"), "left_anti")
      // the streamed lifecycle stamps appended rows with the micro-batch
      // id so its replay gate can skip redelivered batches
      markerBatch.fold(novel)(b => novel.withColumn("_applied_batch", lit(b)))
        .write.mode("append").parquet(storeDir)
      val after = compactTargetBytes match {
        // the tombstone-aware purge (NOT the generic compactor, whose
        // whole-dir swap would drop the sidecar without purging rows)
        case Some(t) => purgeSignatureStore(spark, storeDir, t)._2
        case None => -1
      }
      (docs.count(), dupIds.count(), after)
    } finally { sigs.unpersist(); () }
  }

  /** LSH bands: hash groups of `rowsPerBand` signature slots into bucket
    * keys; docs sharing any (band, bucket) become candidate pairs.
    *
    * `maxBucket` caps bucket membership before the self-join: a bucket of
    * d docs emits d² pairs, so one degenerate bucket (empty documents,
    * shared boilerplate) goes quadratic on a 100 TB corpus. Over-full
    * buckets are dropped whole — their members are, by construction,
    * near-identical en masse and better handled by exact dedup first;
    * [[oversizedLshBuckets]] reports exactly what was skipped. Pass
    * `Long.MaxValue` for the exact (uncapped) semantics. */
  def lshCandidates(sig: DataFrame, numHashes: Int, rowsPerBand: Int,
                    maxBucket: Long = 1000): DataFrame = {
    val bands = lshBands(sig, numHashes, rowsPerBand)
    val kept =
      if (maxBucket == Long.MaxValue) bands
      else bands.join(
        bands.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxBucket).select(col("band"), col("bucket")),
        Seq("band", "bucket"), "left_semi")
    val a = kept.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = kept.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Accounting for [[lshCandidates]]' cap: the (band, bucket, df) rows
    * whose membership exceeded `maxBucket` and were skipped. */
  def oversizedLshBuckets(sig: DataFrame, numHashes: Int, rowsPerBand: Int,
                          maxBucket: Long): DataFrame =
    lshBands(sig, numHashes, rowsPerBand)
      .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxBucket)

  /** Pairwise n-gram Jaccard via an inverted shingle index: only pairs
    * sharing at least one shingle are materialized.
    *
    * `maxDf` caps shingle document frequency before the self-join — a
    * shingle in d docs contributes d² candidate pairs, so one boilerplate
    * shingle across a 100 TB corpus would otherwise dominate the shuffle
    * (the standard stopword-shingle guard). Sizes are computed BEFORE the
    * cap so the Jaccard denominator stays exact. The default is finite —
    * exact all-pairs semantics is the thing you must explicitly opt into
    * with `Long.MaxValue`, not the thing you get by forgetting a knob. */
  def jaccardPairs(shingles: DataFrame, minJaccard: Double,
                   maxDf: Long = 1000): DataFrame = {
    // reused by sizes + both self-join sides: materialize the inverted
    // index once instead of re-running tokenize/explode/distinct 3×
    val sh = shingles.localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    jaccardCore(sh, sizes, minJaccard, maxDf)
  }

  /** Shared pair-scoring core: df cap -> inverted-index self-join ->
    * intersection counts -> Jaccard with exact (pre-cap) sizes. */
  private def jaccardCore(sh: DataFrame, sizes: DataFrame,
                          minJaccard: Double, maxDf: Long): DataFrame = {
    val rare =
      if (maxDf == Long.MaxValue) sh
      else sh.join(
        sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select(col("shingle")),
        Seq("shingle"), "left_semi")
    // the self-join only needs shingle EQUALITY, not the strings: 64-bit
    // keys shrink both shuffle sides (~20% on the bench). Same accuracy
    // class as the md5-keyed exact dedup: a cross-shingle collision
    // (p ≈ n²/2⁶⁵ per corpus) could inflate one intersection count.
    val hashed = rare.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val inter = hashed.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(hashed.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Asymmetric shingle CONTAINMENT pairs — the quote/boilerplate-wrap
    * detector Jaccard structurally misses: a short doc fully quoted
    * inside a long one has |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0.
    * Returns both directions (`cont_a` = share of A's shingles found
    * in B, `cont_b` symmetric) for pairs where EITHER clears
    * `minContainment`. Same inverted-index core, df cap, and exact
    * pre-cap sizes as [[jaccardPairsFromDocs]] — candidate generation
    * is identical, only the score differs, so the 100 TB cost model
    * carries over unchanged. */
  def containmentPairsFromDocs(docs: DataFrame, idCol: String, textCol: String,
                               n: Int, minContainment: Double,
                               maxDf: Long = 1000): DataFrame = {
    val base = shingleArrayBase(docs, idCol, textCol, n)
    val sizes = base.select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_sh"))
    val sh = base.select(col("doc_id"), explode(col("sh_arr")).as("shingle"))
    val rare = sh.join(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select(col("shingle")),
      Seq("shingle"), "left_semi")
    val hashed = rare.select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
    val inter = hashed.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(hashed.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), Seq("doc_b"))
      .withColumn("cont_a", col("n_inter").cast("double") / col("n_a"))
      .withColumn("cont_b", col("n_inter").cast("double") / col("n_b"))
      .filter(col("cont_a") >= minContainment || col("cont_b") >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("cont_a"), col("cont_b"))
  }

  /** [[jaccardPairs]] straight from the document table: the per-doc
    * shingle count comes from `size(array_distinct(...))` BEFORE the
    * explode — map-only — so the only aggregations left are the df cap
    * and the pair intersection counts. One fewer shuffle and one fewer
    * checkpoint consumer than the generic (doc_id, shingle) entry
    * point; identical output. */
  def jaccardPairsFromDocs(docs: DataFrame, idCol: String, textCol: String,
                           n: Int, minJaccard: Double,
                           maxDf: Long = 1000): DataFrame = {
    // checkpoint the COMPACT per-doc array form (one row per doc), not
    // the exploded occurrence stream — sizes, the df cap, and both
    // self-join sides all re-derive from it with cheap in-memory ops
    val base = shingleArrayBase(docs, idCol, textCol, n)
    val sizes = base.select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_sh"))
    val sh = base.select(col("doc_id"), explode(col("sh_arr")).as("shingle"))
    jaccardCore(sh, sizes, minJaccard, maxDf)
  }

  /** Exact Jaccard pairs via AllPairs/PPJoin prefix filtering — same
    * output as [[jaccardPairsFromDocs]] with no df cap, far fewer
    * candidates. Each doc's shingles are globally ordered rare-first
    * (corpus df asc, then shingle); only the first
    * `n − floor(t·n) + 1` shingles are indexed. Theorem (Bayardo et
    * al., WWW'07): two sets with Jaccard ≥ t must share an element in
    * both prefixes under any common total order, so joining prefixes
    * loses nothing; `floor` (not `ceil`) keeps the bound safe against
    * FP jitter. Rare-first ordering pushes boilerplate shingles to the
    * suffix, so a shingle in d docs contributes ~0 candidates instead
    * of d² — the exactness-preserving answer to the quadratic hot-key
    * problem the df cap only truncates away.
    *
    * Stages: df count (partial agg), per-doc re-sort (one shuffle of
    * occurrences), prefix self-join (small), then exact verification
    * by `array_intersect` on the two docs' full shingle arrays. Every
    * stage is bounded; no all-pairs step anywhere. */
  /** The per-doc prefix under a global order: rare-first (corpus df
    * asc — strongest pruning, costs one df pass + regroup shuffle) or
    * md5-hash order (map-only from the array — weaker pruning, zero
    * extra shuffle). Both are valid total orders, so both are exact;
    * rare-first wins when boilerplate shingles dominate (the 100 TB
    * case), hash order wins when the extra pass outweighs the pruning
    * (smaller corpora, flat df distributions). */
  private def prefixFrame(base: DataFrame, minJaccard: Double,
                          rareFirst: Boolean): DataFrame =
    if (rareFirst) {
      val occ = base.select(col("doc_id"), explode(col("sh_arr")).as("shingle"))
      val df = occ.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      occ.join(df, Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("shingle")))).as("sorted"))
        .select(col("doc_id"), size(col("sorted")).cast("long").as("n_sh"),
          expr(s"slice(transform(sorted, x -> x.shingle), 1, " +
            s"size(sorted) - floor($minJaccard * size(sorted)) + 1)").as("prefix"))
    } else
      base.select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_sh"),
        expr(s"slice(transform(sort_array(transform(sh_arr, s -> struct(md5(s) AS k, s AS s))), x -> x.s), 1, " +
          s"size(sh_arr) - floor($minJaccard * size(sh_arr)) + 1)").as("prefix"))

  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, minJaccard: Double,
                         rareFirst: Boolean = true): DataFrame = {
    val base = shingleArrayBase(docs, idCol, textCol, n)
    val prefixes = prefixFrame(base, minJaccard, rareFirst)
    val pocc = prefixes.select(col("doc_id"), col("n_sh"),
      explode(col("prefix")).as("shingle"))
    val cands = pocc.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"), col("shingle"))
      .join(pocc.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"), col("shingle")),
        Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      // length filter: J <= min/max, so a matching pair needs min >= t*max
      .filter(col("n_a").cast("double") >= lit(minJaccard) * col("n_b") - lit(1e-9) &&
        col("n_b").cast("double") >= lit(minJaccard) * col("n_a") - lit(1e-9))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .join(base.select(col("doc_id").as("doc_a"), col("sh_arr").as("arr_a")), Seq("doc_a"))
      .join(base.select(col("doc_id").as("doc_b"), col("sh_arr").as("arr_b")), Seq("doc_b"))
      .withColumn("n_inter", size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs: sign-bucket LSH (1 bit per
    * leading dim) generates candidates, the native fused cosine
    * ([[graft.functions.CosineSimilarity]]) confirms. Only same-bucket
    * pairs materialize — the shuffle is O(candidates), not O(n²).
    *
    * `maxBucket` guards the degenerate-bucket quadratic blowup (e.g. a
    * mass of all-zero embeddings signing into one bucket); over-full
    * buckets are dropped whole, `Long.MaxValue` restores exact
    * semantics. */
  def embeddingNearDups(emb: DataFrame, idCol: String, embCol: String,
                        bits: Int, minSim: Double,
                        maxBucket: Long = 10000): DataFrame = {
    val all = emb.select(col(idCol).as("vec_id"), col(embCol).as("e"),
      concat((1 to bits).map(i =>
        when(element_at(col(embCol), i) >= 0f, "1").otherwise("0")): _*).as("bucket"))
    val bucketed =
      if (maxBucket == Long.MaxValue) all
      else all.join(
        all.groupBy(col("bucket")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxBucket).select(col("bucket")),
        Seq("bucket"), "left_semi")
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"), col("e").as("e_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"), col("e").as("e_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosine_sim(col("e_a"), col("e_b")), 6))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** SimHash fingerprint over distinct words, `bits` wide (<= 32: one hex
    * nibble of md5 per bit keeps the oracle portable). Bit j is set when
    * the majority of word-hashes have nibble j's high bit set. */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits <= 32, "one md5 nibble per bit")
    val words = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), "\\s+")).as("w"))
      .distinct()
    val sums = words.groupBy(col("doc_id")).agg(
      expr(s"sum(CASE WHEN substring(md5(w), 1, 1) IN " +
        "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)").as("s0"),
      (1 until bits).map(j =>
        expr(s"sum(CASE WHEN substring(md5(w), ${j + 1}, 1) IN " +
          "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END)").as(s"s$j")): _*)
    sums.select(col("doc_id"),
      concat((0 until bits).map(j =>
        when(col(s"s$j") >= 0, "1").otherwise("0")): _*).as("simhash"))
  }

  /** Segment-level exact dedup (the paragraph-dedup family): documents
    * are cut into non-overlapping `windowTokens`-token segments and
    * every segment that already occurred anywhere in the corpus — by
    * content hash, first occurrence = lowest (doc_id, idx) — is
    * flagged. Near-duplicate docs that exact-dedup misses still share
    * verbatim runs; this removes the runs themselves (the Dolma /
    * CCNet paragraph-dedup recipe, with fixed token windows standing
    * in for paragraph boundaries when the text has none).
    *
    * Returns (doc_id, seg_idx, segment, dup) — callers filter `!dup`
    * and reassemble, or aggregate per doc for audit. Scale shape:
    * segmentation is map-only ([[Curation.chunk]] with stride =
    * window); the only shuffle keys on the segment hash, and the
    * per-hash window touches collision groups (tiny) — equivalent to
    * an arg-min self-marking, volume O(segments). */
  def segmentDedup(docs: DataFrame, idCol: String, textCol: String,
                   windowTokens: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("doc_id"), col("seg_idx"))
    Curation.chunk(docs, idCol, textCol, windowTokens, windowTokens)
      .select(col("doc_id"), col("chunk_idx").as("seg_idx"),
        col("chunk").as("segment"), md5(col("chunk")).as("h"))
      .withColumn("dup", row_number().over(w) > 1)
      .drop("h")
  }

  /** LSH candidate-quality eval: how many of the MinHash+LSH candidate
    * pairs are TRUE near-duplicates by exact shingle Jaccard — the
    * precision metric that tunes (numHashes, rowsPerBand) before a
    * corpus-wide dedup run, the recall@k of the dedup family. Exact
    * Jaccard is computed ONLY for candidate pairs (intersection join
    * over the candidates' distinct shingles — work scales with
    * candidates, not the corpus). Returns one row:
    * (n_candidates, n_true, precision). */
  def lshPrecision(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, numHashes: Int, rowsPerBand: Int,
                   jaccardThreshold: Double,
                   maxBucket: Long = 1000): DataFrame = {
    val cand = lshCandidates(
      minhashSignatureDirect(docs, idCol, textCol, n, numHashes),
      numHashes, rowsPerBand, maxBucket)
    // sizes and BOTH intersection-join sides reuse the shingle frame —
    // materialize it once (the jaccardPairs checkpoint rule) instead of
    // paying the tokenize+explode three times
    val sh = shingles(docs, idCol, textCol, n).localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    val jac = cand
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .join(inter, Seq("doc_a", "doc_b"), "left_outer")
      .select((coalesce(col("n_inter"), lit(0L)).cast("double") /
        (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L)))).as("jac"))
    jac.agg(count(lit(1)).as("n_candidates"),
        sum(when(col("jac") >= jaccardThreshold, 1).otherwise(0))
          .cast("long").as("n_true"))
      .select(col("n_candidates"), col("n_true"),
        when(col("n_candidates") > 0,
          round(col("n_true").cast("double") / col("n_candidates"), 6))
          .as("precision"))
  }

  /** The complement of [[lshPrecision]]: of the TRUE near-duplicate
    * pairs (exact shingle Jaccard ≥ threshold, df-capped like q29),
    * the fraction the MinHash+LSH candidate generation actually
    * surfaced — missed true pairs are duplicates that would survive a
    * dedup run. Together the two metrics tune the band geometry:
    * precision says how much verification work is wasted, recall says
    * how much duplication leaks through. One row:
    * (n_true, n_found, recall). */
  def lshRecall(docs: DataFrame, idCol: String, textCol: String,
                n: Int, numHashes: Int, rowsPerBand: Int,
                jaccardThreshold: Double, maxDf: Long = 1000,
                maxBucket: Long = 1000): DataFrame = {
    // ONE tokenize+shingle pass feeds BOTH pipelines (the lshPrecision
    // sharing discipline): the truth side's sizes and inverted index
    // AND the candidate side's MinHash signatures all derive from the
    // same checkpointed per-doc shingle arrays — identical rows to the
    // former jaccardPairsFromDocs + minhashSignatureDirect pair, one
    // full corpus pass cheaper.
    val base = shingleArrayBase(docs, idCol, textCol, n)
    val sizes = base.select(col("doc_id"), size(col("sh_arr")).cast("long").as("n_sh"))
    val sh = base.select(col("doc_id"), explode(col("sh_arr")).as("shingle"))
    val truePairs = jaccardCore(sh, sizes, jaccardThreshold, maxDf)
      .select(col("doc_a"), col("doc_b"))
    val cand = lshCandidates(
      minhashFromArrays(base, numHashes),
      numHashes, rowsPerBand, maxBucket)
    val found = truePairs.join(cand, Seq("doc_a", "doc_b"), "left_semi")
    truePairs.agg(count(lit(1)).as("n_true"))
      .crossJoin(found.agg(count(lit(1)).as("n_found")))
      .select(col("n_true"), col("n_found"),
        when(col("n_true") > 0,
          round(col("n_found").cast("double") / col("n_true"), 6))
          .as("recall"))
  }

  /** Rebuild documents after [[segmentDedup]] — the reassembly half of
    * paragraph-level dedup (CCNet-style: drop repeated paragraphs, keep
    * the rest of the document in order). Duplicate segments vanish,
    * survivors re-join in segment order; documents that lose every
    * segment are omitted (nothing left to emit). One partial/final
    * aggregate keyed on the doc id — the fan-in mirror of the map-only
    * segmentation, so the whole drop-and-rebuild costs two linear
    * shuffles at any corpus size. Returns
    * (doc_id, n_kept, n_dropped, text). */
  def reassembleDeduped(segs: DataFrame): DataFrame =
    segs.groupBy(col("doc_id"))
      .agg(
        sum(when(!col("dup"), 1).otherwise(0)).cast("long").as("n_kept"),
        sum(when(col("dup"), 1).otherwise(0)).cast("long").as("n_dropped"),
        // collect only surviving segments (collect_list skips the CASE's
        // nulls), order deterministically by seg_idx, then re-join
        expr("array_join(transform(array_sort(collect_list(" +
          "CASE WHEN NOT dup THEN struct(seg_idx, segment) END)), " +
          "s -> s.segment), ' ')").as("text"))
      .filter(col("n_kept") > 0)

  /** Exact duplicate-SPAN detection (the Lee et al. 2022 "Deduplicating
    * Training Data" exact-substring recipe, windowed): every n-token
    * SLIDING window whose hash appears in ≥ 2 documents is a duplicated
    * span, and the per-doc audit reports how many spans and how many
    * distinct token positions they cover. Segment dedup ([[segmentDedup]])
    * sees only aligned chunks; sliding spans catch verbatim runs at ANY
    * offset — the cross-doc boilerplate/contamination signal.
    *
    * The published recipe builds a suffix array; the distributed
    * re-expression is an inverted span-hash index: explode n-gram
    * windows (linear in tokens, NOT quadratic — each position starts
    * exactly one span), count distinct docs per hash with a partial
    * two-phase aggregate, semi-join the duplicated hashes back, and
    * expand coverage positions (fan-out n per duplicated span, bounded).
    * Every shuffle is linear in token count.
    *
    * Returns (doc_id, n_tokens, n_dup_spans, n_dup_tokens, dup_frac) —
    * one row per doc with ≥ n tokens, zeros when nothing duplicates. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int): DataFrame = {
    val base = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .localCheckpoint() // reused: spans (twice via semi-join) + per-doc sizes
    val spans = base.select(col("doc_id"),
      explode(expr(s"transform(sequence(1, size(toks) - $n + 1), i -> " +
        s"named_struct('pos', i, 'sp', md5(concat_ws(' ', slice(toks, i, $n)))))")).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.sp").as("sp"))
    val dupHashes = spans.groupBy(col("sp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("sp"))
    val dup = spans.join(dupHashes, Seq("sp"), "left_semi")
    val perDocSpans = dup.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"))
    val perDocCover = dup
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + $n - 1)")).as("tp"))
      .dropDuplicates("doc_id", "tp")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_tokens"))
    base.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(perDocSpans, Seq("doc_id"), "left_outer")
      .join(perDocCover, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
      .withColumn("dup_frac",
        round(col("n_dup_tokens").cast("double") / col("n_tokens"), 6))
  }

  /** Edit-distance verification of candidate pairs — the OTHER standard
    * near-dup verify (Jaccard measures set overlap; Levenshtein catches
    * reordered/lightly-edited copies that shingle sets miss, the
    * BigCode/StarCoder dedup recipe). For each (doc_a, doc_b) candidate
    * pair: normalized edit distance over the first `prefixLen` chars,
    * with `dup` flagged at `maxRatio`. Returns every candidate with its
    * evidence (doc_a, doc_b, dist, edit_ratio, dup) — callers filter.
    *
    * Scale shape: work is CANDIDATE-bounded (the LSH caps upstream are
    * the proof — never all-pairs), two doc-keyed joins fetch the texts.
    * The prefix cap bounds the O(len²) per-pair DP the way production
    * dedup does: a pair that diverges in its first `prefixLen` chars is
    * not a near-duplicate, and a 1 GB outlier doc cannot stall a task.
    * Levenshtein is exact integer arithmetic — engine-reproducible. */
  def editDistanceGate(docs: DataFrame, idCol: String, textCol: String,
                       candidates: DataFrame, maxRatio: Double,
                       prefixLen: Int = 1000): DataFrame = {
    require(prefixLen > 0, "prefixLen must be positive")
    val pfx = substring(col(textCol), 1, prefixLen)
    val a = docs.select(col(idCol).as("doc_a"), pfx.as("ta"))
    val b = docs.select(col(idCol).as("doc_b"), pfx.as("tb"))
    candidates.select(col("doc_a"), col("doc_b"))
      .join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("ta"), col("tb")).cast("long").as("dist"),
        greatest(length(col("ta")), length(col("tb"))).as("maxlen"))
      .select(col("doc_a"), col("doc_b"), col("dist"),
        round(col("dist").cast("double") / col("maxlen"), 6).as("edit_ratio"))
      .withColumn("dup", col("edit_ratio") <= maxRatio)
  }

  /** Robust winnowing fingerprints (the MOSS local fingerprinting
    * algorithm, Schleimer/Wilkerson/Aiken SIGMOD'03): hash every
    * POSITIONAL word `k`-gram, slide a window of `w` consecutive
    * hashes, and keep each window's minimum — ties broken toward the
    * LEFTMOST position. The selected set is the document fingerprint;
    * it guarantees any shared run of `k + w - 1` tokens between two
    * documents yields at least one common fingerprint (the property
    * min/max sampling like [[graft.queries.Pipeline]] q36 cannot give),
    * at expected density 2/(w+1).
    *
    * Determinism & oracle form: the window minimum is taken over the
    * STRING `md5(gram) || lpad(pos, 10, '0')` — md5 hex is fixed-width,
    * so lexicographic order on the concatenation is exactly (hash,
    * position) order, giving the leftmost-min tie-break without struct
    * comparison, identically in any engine with md5.
    *
    * Scale shape: tokenize + gram expansion are map-only; the only
    * shuffle is the per-document window (partitioned by doc id — never
    * global), and the output is fingerprint-sized (~2/(w+1) of grams).
    * Incomplete trailing windows are excluded (`pos <= n_grams - w`),
    * the standard winnowing contract. */
  def winnow(docs: DataFrame, idCol: String, textCol: String,
             k: Int, w: Int): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val gram = (0 until k).map(j => s"toks[i + $j]")
      .mkString("concat_ws(' ', ", ", ", ")")
    val grams = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), "\\s+").as("toks"))
      .filter(size(col("toks")) >= k + w - 1) // at least one complete window
      .select(col("doc_id"), posexplode(
        expr(s"transform(sequence(0, size(toks) - $k), i -> $gram)")))
      .toDF("doc_id", "pos", "gram")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    grams
      .withColumn("key",
        concat(md5(col("gram")), lpad(col("pos").cast("string"), 10, "0")))
      .withColumn("n_grams", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .withColumn("sel", min(col("key")).over(win.rowsBetween(0, w - 1)))
      .filter(col("pos") <= col("n_grams") - w)
      .select(col("doc_id"), col("sel")).distinct()
      .select(col("doc_id"),
        substring(col("sel"), 1, 32).as("fp"),
        expr("CAST(substring(sel, 33, 10) AS BIGINT)").as("pos"))
  }
}
