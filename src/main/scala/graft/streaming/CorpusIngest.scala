package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus ingest: the batch curation pipeline (quality gate
  * -> exact dedup -> split assignment) composed over a document STREAM.
  * New files dropped into the watch directory flow through the same
  * declarative transforms the batch queries verify (q34/q27/q45
  * semantics), with dedup state bounded by the watermark.
  *
  * Scale notes: the gate and split are map-only; dedup is
  * `dropDuplicatesWithinWatermark` on the content hash, so state is
  * (arrival rate × delay), not corpus size. The parquet sink appends
  * exactly-once per micro-batch; a restart replays from the source
  * checkpoint with the same hashes deduped again — idempotent output.
  */
object CorpusIngest {

  /** The shared transform — callers hand in a batch or stream frame
    * with (ts, doc_id, text) and get gated, deduped, split-labelled
    * rows. Thresholds mirror the q34/q46 quality gate. */
  def curate(docs: DataFrame, tsCol: String = "ts",
             minTokens: Int = 20, maxTokens: Int = 1000,
             delay: String = "1 hour"): DataFrame = {
    val gated = docs
      .withColumn("n_tokens", size(split(col("text"), "\\s+")))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
      // hash the NFC form: composed and decomposed encodings of the same
      // text are the same document (codegen'd expression, ASCII rows
      // take the identity fast path — see functions/UnicodeNormalize)
      .withColumn("content_hash",
        md5(graft.functions.UnicodeNormalize(col("text"), "NFC")))
    // the watermarked dedup operator is stream-only. The stream arm
    // keeps the FIRST arrival per hash; the batch arm must pick the same
    // survivor for parity, and dropDuplicates keeps an arbitrary row —
    // so the batch form is a deterministic arg-min on (ts, doc_id), the
    // batch definition of "first arrival".
    val deduped =
      if (docs.isStreaming)
        gated.withWatermark(tsCol, delay)
          .dropDuplicatesWithinWatermark("content_hash")
      else {
        val all = gated.columns
        gated
          .groupBy(col("content_hash"))
          .agg(min_by(struct(all.toIndexedSeq.map(col): _*),
            struct(col(tsCol), col("doc_id"))).as("r"))
          .select(col("r.*"))
      }
    deduped.withColumn("split",
        when(expr("substring(content_hash, 1, 1)") < "c", "train")
          .when(expr("substring(content_hash, 1, 1)") < "e", "val")
          .otherwise("test"))
  }
}
