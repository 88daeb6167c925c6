package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental merge over a file-watch stream (SURVEY.md §2.10: the
  * reference is batch-only; this is the Spark-native upgrade — GAF/GFF3
  * drops land in a directory, each micro-batch runs the same anti-join
  * merge the batch loader uses, via `foreachBatch`).
  *
  * The store lives as parquet; each batch reads the current store,
  * anti-joins the new rows, and appends only the novel ones — the
  * staging-table merge made continuous. Append mode keeps this safe for
  * re-delivered files (duplicate rows are filtered by the anti-join).
  */
object StreamingMerge {

  /** Start a file-watch merge: new files under `inDir` (matching
    * `schema`) are anti-joined on `keys` against the parquet store at
    * `storeDir` and appended. Returns the running query; callers stop it
    * (or `processAllAvailable` for a synchronous drain). */
  def fileWatchMerge(spark: SparkSession, inDir: String,
                     schema: org.apache.spark.sql.types.StructType,
                     storeDir: String, keys: Seq[String]):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inDir)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val novel =
          if (graft.sinks.HadoopSwap.exists(batch.sparkSession, storeDir)) {
            val live = batch.sparkSession.read.parquet(storeDir)
            batch.dropDuplicates(keys)
              .join(live.select(keys.map(col): _*).dropDuplicates(), keys, "left_anti")
          } else batch.dropDuplicates(keys)
        novel.write.mode("append").parquet(storeDir)
      }
      .start()
  }

  /** CDC-style continuous merge: each micro-batch carries an `opCol`
    * marker per row — `I`/`U` upsert, `D` delete — and the parquet
    * store is rewritten to reflect it, the streaming completion of the
    * batch merge DAG's upsert + prune semantics (SURVEY.md §2.10: the
    * reference's incrementality IS merge semantics).
    *
    * Within one batch the LAST marker per key wins (ordered by
    * `seqCol` — CDC logs carry a sequence/LSN). The rewrite is
    * set-based: store ANTI batch-keys ∪ batch-survivors; no
    * row-at-a-time mutation. Idempotent under redelivery: re-applying
    * a batch yields the same store. */
  def cdcMerge(spark: SparkSession, inDir: String,
               schema: org.apache.spark.sql.types.StructType,
               storeDir: String, keys: Seq[String], opCol: String,
               seqCol: String):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inDir)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(seqCol).desc)
        val latest = batch
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val survivors = latest.filter(col(opCol) =!= "D")
          .drop(opCol, seqCol)
        val merged =
          if (graft.sinks.HadoopSwap.exists(batch.sparkSession, storeDir)) {
            val live = batch.sparkSession.read.parquet(storeDir).localCheckpoint()
            live.join(latest.select(keys.map(col): _*), keys, "left_anti")
              .unionByName(survivors)
          } else survivors
        merged.write.mode("overwrite").parquet(storeDir)
      }
      .start()
  }

  /** Streaming materialized-view maintenance: each micro-batch's rows
    * are partial-aggregated ([[graft.operators.IncrementalAgg]]) and
    * folded into the parquet partial store — the store always equals
    * the full aggregate over every row ever streamed, but each refresh
    * touches only (delta ∪ key-cardinality partials), never the
    * history. Decimal-exact partials make the fold order-insensitive,
    * so micro-batch boundaries can't change the result.
    *
    * foreachBatch is at-least-once: a batch whose store write landed but
    * whose stream checkpoint didn't commit is REPLAYED on restart, and a
    * blind re-fold would double-count it. The store therefore carries
    * the id of the last folded batch in an `_applied_batch` column —
    * written in the same parquet commit as the data, so the
    * skip-if-already-applied gate can't drift from the store contents.
    * The gate makes restarts exactly-once per checkpoint lineage
    * (batch ids restart at 0 if the stream's checkpoint dir is wiped —
    * pair store and checkpoint lifetimes). */
  /** `checkpointDir` is REQUIRED and must live exactly as long as the
    * store: the replay gate keys on micro-batch ids, which only stay
    * monotonic across restarts when the stream resumes from a durable
    * checkpoint (an ephemeral temp checkpoint resets ids to 0 and the
    * gate would silently skip every genuinely new batch — the failure
    * [[applyAggBatch]] now detects and refuses loudly). */
  def aggMaintain(spark: SparkSession, inDir: String,
                  schema: org.apache.spark.sql.types.StructType,
                  storeDir: String, keys: Seq[String], valueCol: String,
                  checkpointDir: String):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inDir)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyAggBatch(batch, batchId, storeDir, keys, valueCol): Unit
      }
      .start()
  }

  /** Continuous-crawl dedup: document drops under `inDir` run the
    * persisted-signature-store lifecycle ([[graft.operators.Dedup
    * .ingestBatch]], the q142/dedupingest shape) per micro-batch —
    * duplicates land under `dupesDir/batch_<id>`, novel signatures
    * append to the store stamped with the batch id. Batch/stream
    * parity and replay safety are spec'd (DedupStoreLifecycleSpec).
    *
    * `checkpointDir` is REQUIRED and pairs lifetimes with the store
    * (see [[aggMaintain]]): batch ids must keep climbing across
    * restarts or the `_applied_batch` gate cannot tell a replay from
    * new data. A reset lineage (fresh checkpoint over an old store) is
    * detected and refused loudly rather than silently skipped. */
  def dedupIngest(spark: SparkSession, inDir: String,
                  schema: org.apache.spark.sql.types.StructType,
                  storeDir: String, dupesDir: String,
                  checkpointDir: String):
      org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyDedupBatch(batch, batchId, storeDir, dupesDir): Unit
      }
      .start()

  /** Exactly-once streaming ingest into a snapshot-versioned store
    * ([[graft.sinks.VersionedStore]]): each micro-batch commits as one
    * append version TAGGED with its batch id, and the tag travels
    * inside the atomic manifest rename — so unlike the `_applied_batch`
    * column gate, the replay gate and the data commit are literally the
    * same filesystem operation and cannot drift. A crash after the data
    * append but before the manifest rename leaves only orphan files no
    * snapshot references (vacuum sweeps them); the replayed batch then
    * commits cleanly. Downstream readers pin versions, so they never
    * see a torn batch.
    *
    * `checkpointDir` is REQUIRED and pairs lifetimes with the store
    * (see [[aggMaintain]]): a reset micro-batch-id lineage is detected
    * from the tags and refused loudly. */
  def versionedIngest(spark: SparkSession, inDir: String,
                      schema: org.apache.spark.sql.types.StructType,
                      storeDir: String, checkpointDir: String,
                      nFiles: Int = 4):
      org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyVersionedBatch(batch, batchId, storeDir, nFiles): Unit
      }
      .start()

  /** Streaming ingest into an INDEXED [[graft.sinks.SkippingStore]]:
    * each micro-batch appends zone-sorted data files AND extends the
    * `_zonemap_multi` (and optionally `keycol`-marked `_bloommap`)
    * sidecars incrementally — so the store stays prunable, by the
    * explicit readers and by the transparent
    * [[graft.plans.ZonePruneRule]], while the stream runs. Sidecar
    * maintenance per batch scans only the batch's NEW files
    * (appendMulti/bloomAppend), so indexing cost is batch-sized, never
    * store-sized.
    *
    * Replay safety: rows carry `_applied_batch` in the same append
    * (the [[dedupIngest]] gate); `checkpointDir` is REQUIRED and pairs
    * lifetimes with the store ([[aggMaintain]]). Crash between the
    * data append and the sidecar extension leaves unmapped files;
    * every pruned reader then REFUSES loudly (the coverage check)
    * rather than silently dropping rows, and the next applied batch
    * heals the hole — appendMulti/bloomAppend index every unmapped
    * file, not just their own. */
  def indexedIngest(spark: SparkSession, inDir: String,
                    schema: org.apache.spark.sql.types.StructType,
                    storeDir: String, checkpointDir: String,
                    sortCol: String, statsCols: Seq[String],
                    bloomCol: Option[String] = None, nFiles: Int = 4):
      org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIndexedBatch(batch, batchId, storeDir, sortCol, statsCols,
          bloomCol, nFiles): Unit
      }
      .start()

  /** Streaming ingest into an IVF POSTINGS store
    * ([[graft.operators.Similarity.ivfStoreBuild]]/Append): each
    * micro-batch assigns its vectors against the FROZEN index at
    * `indexDir` (map-only argmin — no retrain, so existing postings
    * stay valid) and appends them `partitionBy(cell)`, keeping the
    * serving path's partition pruning intact while the stream runs —
    * the embedding-pipeline shape where a trained index serves
    * queries while new corpus embeddings arrive continuously.
    *
    * Replay safety: rows carry `_applied_batch` in the same append
    * (the shared gate); `checkpointDir` is REQUIRED and pairs
    * lifetimes with the store ([[aggMaintain]]). The batch frame must
    * carry `vec_id` and `embedding` (the embeddings-table
    * convention, as [[dedupIngest]] fixes doc_id/text). */
  def annIngest(spark: SparkSession, inDir: String,
                schema: org.apache.spark.sql.types.StructType,
                storeDir: String, checkpointDir: String,
                indexDir: String,
                riderCols: Seq[String] = Nil):
      org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyAnnBatch(batch, batchId, storeDir, indexDir, riderCols): Unit
      }
      .start()

  /** Streaming ingest into the BM25 text postings store
    * ([[graft.operators.TextIndex]]): each micro-batch of
    * (doc_id, text) documents tokenizes ONCE into the store's frozen
    * term-bucket layout (batch-sized cost, existing postings
    * untouched), extends the w-zone sidecar over the new files only,
    * and appends its own `_corpus_stats` row — so BM25 serves stay
    * exact (df/avgdl/N include every applied batch) while the stream
    * runs. The corpus-indexing shape: a retrieval service stays live
    * while crawl batches arrive continuously.
    *
    * Replay safety: postings carry `_applied_batch` in the same
    * append (the shared gate); `checkpointDir` is REQUIRED and pairs
    * lifetimes with the store. A crash between the data append and
    * the sidecar/stats work leaves a servable-but-lagging store; the
    * replayed batch HEALS both (zone extension over unmapped files,
    * stats row re-added iff its bid is absent) instead of skipping
    * past the gap. */
  def textIngest(spark: SparkSession, inDir: String,
                 schema: org.apache.spark.sql.types.StructType,
                 storeDir: String, checkpointDir: String,
                 nBuckets: Int = 64, filesPerBucket: Int = 1,
                 positional: Boolean = false):
      org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(inDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyTextBatch(batch, batchId, storeDir, nBuckets,
          filesPerBucket, positional): Unit
      }
      .start()

  /** One text-store commit, replay-safe; factored out so the
    * idempotence contract is directly testable. Returns false when
    * the batch was already applied (after healing — see
    * [[graft.operators.TextIndex.healBatch]]); refuses loudly on a
    * reset id lineage ([[replayGateSkips]]). */
  def applyTextBatch(batch: DataFrame, batchId: Long, storeDir: String,
                     nBuckets: Int, filesPerBucket: Int = 1,
                     positional: Boolean = false): Boolean = {
    import graft.operators.TextIndex
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val exists = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(p)
    if (!exists) {
      if (positional)
        TextIndex.buildPositional(batch, "doc_id", "text", storeDir,
          nBuckets, filesPerBucket, marker = Some(batchId))
      else
        TextIndex.build(batch, "doc_id", "text", storeDir, nBuckets,
          filesPerBucket, marker = Some(batchId))
      return true
    }
    if (replayGateSkips(spark, storeDir, batchId)) {
      TextIndex.healBatch(batch, "doc_id", "text", storeDir, batchId,
        nBuckets, positional)
      return false // replayed batch (data landed; sidecars healed)
    }
    if (positional)
      TextIndex.appendPositional(batch, "doc_id", "text", storeDir,
        filesPerBucket, marker = Some(batchId))
    else
      TextIndex.append(batch, "doc_id", "text", storeDir, filesPerBucket,
        marker = Some(batchId))
    true
  }

  /** One postings-store commit, replay-safe; factored out so the
    * idempotence contract is directly testable. Returns false when the
    * batch was already applied; refuses loudly on a reset id lineage
    * ([[replayGateSkips]]). The index loads per batch — it is a
    * cell-count-sized artifact, and re-reading it means an index
    * RETRAIN mid-stream (new artifact at `indexDir`) would corrupt
    * the store's lists, so retrains must pair with a store rebuild.
    *
    * `riderCols` non-empty maintains the clustered store's
    * relative-path zone sidecar per batch
    * ([[graft.sinks.SkippingStore.indexPartitioned]] — only unmapped
    * files scan). The extension runs on the REPLAY path too: a crash
    * between the data append and the sidecar write leaves the sidecar
    * stale (the transparent rule falls back, correct), and the
    * replayed batch heals it instead of skipping past the gap. */
  def applyAnnBatch(batch: DataFrame, batchId: Long, storeDir: String,
                    indexDir: String,
                    riderCols: Seq[String] = Nil): Boolean = {
    import graft.operators.Similarity
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val exists = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(p)
    val index = Similarity.loadIndex(spark, indexDir)
    val marked = batch.withColumn("_applied_batch", lit(batchId))
    def extendSidecar(): Unit =
      if (riderCols.nonEmpty)
        graft.sinks.SkippingStore.indexPartitioned(spark, storeDir, riderCols)
    if (!exists) {
      Similarity.ivfStoreBuild(marked, "vec_id", "embedding", index, storeDir)
    } else {
      if (replayGateSkips(spark, storeDir, batchId)) {
        extendSidecar() // heal a crash between data append and sidecar write
        return false // replayed batch
      }
      Similarity.ivfStoreAppend(marked, "vec_id", "embedding", index, storeDir)
    }
    extendSidecar()
    true
  }

  /** One indexed-store commit, replay-safe; factored out so the
    * idempotence contract is directly testable. Returns false when the
    * batch was already applied; refuses loudly on a reset id lineage
    * ([[replayGateSkips]]). */
  def applyIndexedBatch(batch: DataFrame, batchId: Long, storeDir: String,
                        sortCol: String, statsCols: Seq[String],
                        bloomCol: Option[String], nFiles: Int): Boolean = {
    import graft.sinks.SkippingStore
    val spark = batch.sparkSession
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val exists = p.getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(p)
    val marked = batch.withColumn("_applied_batch", lit(batchId))
    if (!exists) {
      SkippingStore.writeMulti(marked, sortCol, statsCols, storeDir, nFiles)
      bloomCol.foreach(c => SkippingStore.bloomIndex(spark, storeDir, c))
    } else {
      if (replayGateSkips(spark, storeDir, batchId))
        return false // replayed batch
      SkippingStore.appendMulti(marked, sortCol, storeDir, nFiles)
      bloomCol.foreach(c => SkippingStore.bloomAppend(spark, storeDir, c))
    }
    true
  }

  /** One versioned-ingest commit, replay-safe; factored out so the
    * idempotence contract is directly testable. Returns false when the
    * batch's tag already heads the store (the one legitimate
    * at-least-once replay); refuses loudly on a reset id lineage. */
  def applyVersionedBatch(batch: DataFrame, batchId: Long, storeDir: String,
                          nFiles: Int): Boolean = {
    import graft.sinks.VersionedStore
    VersionedStore.lastTag(batch.sparkSession, storeDir) match {
      case Some(last) if batchId == last => false // replayed batch
      case Some(last) if batchId < last => throw new IllegalStateException(
        s"versioned ingest: store $storeDir is at batch tag $last but the " +
          s"stream delivered batch $batchId — checkpoint and store " +
          "lifetimes diverged (wiped/ephemeral checkpoint over an old " +
          "store). Restore the original checkpointDir or rebuild the store.")
      case _ =>
        VersionedStore.commit(batch, storeDir, nFiles, tag = Some(batchId))
        true
    }
  }

  /** The `_applied_batch` replay gate shared by [[applyDedupBatch]] and
    * [[applyAggBatch]]: the highest batch id recorded in the parquet
    * store at `storeDir`, or None when the store (or the marker column
    * — stores written before the gate existed) is absent. Store
    * existence goes through the path's own Hadoop FileSystem (local,
    * file:, hdfs, s3a all behave), and the read merges file schemas so
    * a marker written by ANY file is seen even if another writer
    * appended marker-less rows. The aggregate prunes to the single
    * marker column — the scan reads one RLE-compressed long column,
    * not the store. (It is NOT a footer-only read: parquet sits on the
    * V1 source path by default and mergeSchema precludes aggregate
    * pushdown besides, so do not size restart budgets assuming an
    * O(files) metadata read.) */
  private def lastAppliedBatch(spark: SparkSession,
                               storeDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val live = spark.read.option("mergeSchema", "true").parquet(storeDir)
    if (!live.columns.contains("_applied_batch")) None
    else live.select(col("_applied_batch")).agg(max(col("_applied_batch")))
      .collect().headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
  }

  /** The shared replay gate decision: `batchId == max` is the ONE
    * legitimate at-least-once replay (store written, checkpoint commit
    * lost) and skips silently; `batchId < max` means micro-batch ids
    * went BACKWARD, which a healthy checkpoint lineage cannot produce —
    * the stream restarted from a fresh/wiped checkpoint over an old
    * store, where silent skipping loses every new batch and blind
    * applying double-counts the re-delivered history. Refuse loudly:
    * the operator must restore the paired checkpoint or rebuild the
    * store. */
  private def replayGateSkips(spark: SparkSession, storeDir: String,
                              batchId: Long): Boolean =
    lastAppliedBatch(spark, storeDir) match {
      case Some(max) if batchId == max => true
      case Some(max) if batchId < max => throw new IllegalStateException(
        s"replay gate: store $storeDir has _applied_batch=$max but the " +
          s"stream delivered batch $batchId — checkpoint and store " +
          "lifetimes diverged (wiped/ephemeral checkpoint over an old " +
          "store). Restore the original checkpointDir or rebuild the store.")
      case _ => false
    }

  /** One streamed dedup ingest, replay-safe: appended signature rows
    * carry `_applied_batch` IN the same append (so the gate and the
    * data commit atomically); a redelivered batch (marker at
    * `batchId`) is skipped before any write, and a batch replayed
    * after a crash-before-append re-writes the SAME per-batch dupes
    * report (overwrite), never double-reporting. Returns false when
    * skipped; refuses loudly on a reset id lineage
    * ([[replayGateSkips]]). */
  def applyDedupBatch(batch: DataFrame, batchId: Long, storeDir: String,
                      dupesDir: String): Boolean = {
    val spark = batch.sparkSession
    if (replayGateSkips(spark, storeDir, batchId))
      return false // replayed batch
    graft.operators.Dedup.ingestBatch(batch, "doc_id", "text", storeDir,
      s"$dupesDir/batch_$batchId", markerBatch = Some(batchId))
    true
  }

  /** One aggMaintain fold, replay-safe; factored out so the idempotence
    * contract is directly testable. Returns false when the batch was
    * already applied and skipped. */
  def applyAggBatch(batch: DataFrame, batchId: Long, storeDir: String,
                    keys: Seq[String], valueCol: String): Boolean = {
    import graft.operators.IncrementalAgg
    val delta = IncrementalAgg.partial(batch, keys, valueCol)
    val spark = batch.sparkSession
    val storeP = new org.apache.hadoop.fs.Path(storeDir)
    val storeExists = storeP.getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(storeP)
    val merged =
      if (storeExists) {
        if (replayGateSkips(spark, storeDir, batchId))
          return false // replayed batch
        val live = spark.read.parquet(storeDir).localCheckpoint()
        IncrementalAgg.merge(Seq(live.drop("_applied_batch"), delta), keys)
      } else delta
    // write-to-sibling-then-swap: a crash mid-overwrite must not leave a
    // partial store whose max(_applied_batch) == batchId — the replay
    // gate would then skip the very batch that repairs it
    graft.sinks.StoreMaintenance.overwriteViaSwap(
      merged.withColumn("_applied_batch", lit(batchId)), storeDir)
    true
  }
}
