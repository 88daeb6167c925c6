package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension (SURVEY.md §2.10: the reference is
  * batch-only; this is the Spark-native upgrade path for incremental
  * loads — file-watch on drops, watermarked windows, stateful sessions).
  */
object EventStream {

  /** Windowed aggregation transform — same logic runs batch (q37) or
    * streaming; callers hand in either `read` or `readStream` frames. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Run the hourly aggregation as a real stream over a parquet dir and
    * collect the result synchronously (memory sink) — the smoke path the
    * spec drives. */
  def runBatchAsStream(spark: SparkSession, dir: String, schema: org.apache.spark.sql.types.StructType,
                       name: String): DataFrame = {
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = hourlyCounts(stream)
      .writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName(name)
      .start()
    // always stop: a query left running after a failure wedges the
    // shared session (and every later test in the suite)
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  case class Event(user_id: Long, ts_us: Long, event_type: String)
  /** [[Event]] plus its derived event-time column (encoder-visible —
    * the generated deserializer can't access a private class). */
  case class EventTs(user_id: Long, ts_us: Long, event_type: String,
      event_ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Int)
  case class SessionOut(user_id: Long, n_events: Int, duration_us: Long)

  private val GapUs = 1800L * 1000 * 1000 // 30-minute session gap
  private val GapMs = 1800L * 1000

  /** Stateful per-user sessionization via flatMapGroupsWithState — the
    * streaming form of operators.Sessionize (30-minute gap). A session
    * is EMITTED when a later event's gap closes it (append semantics).
    * The running session is O(1) state per key, and the aggregate state
    * is BOUNDED: an event-time timeout evicts each key once the
    * watermark passes gap-after-last-event, emitting the final session
    * on the way out — without it every user_id ever seen would hold
    * state forever. Memory per invocation is one micro-batch's per-key
    * slice (sorted locally). A late cross-batch event inside the gap
    * merges without moving `last` backward (max), so durations are
    * never negative. Batch runs have no watermark: timeouts don't
    * apply and trailing sessions stay unemitted, the documented batch
    * contract. */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .withWatermark("event_ts", "30 minutes")
      .as[EventTs]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed gap-after-last: the session can never be
            // extended — emit it and free the key's state
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.n, s.last - s.start))
          } else {
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            val sorted = rows.toArray.sortBy(_.ts_us)
            var s = state.getOption.orNull
            for (e <- sorted) {
              if (s == null) s = SessionState(e.ts_us, e.ts_us, 1)
              else if (e.ts_us - s.last > GapUs) {
                closed += SessionOut(user, s.n, s.last - s.start)
                s = SessionState(e.ts_us, e.ts_us, 1)
              } else s = SessionState(s.start, math.max(s.last, e.ts_us), s.n + 1)
            }
            if (s != null) {
              state.update(s)
              // timeout must stay ahead of the current watermark; batch
              // has no watermark and throws — trailing sessions simply
              // stay in (discarded) batch state, as documented
              try state.setTimeoutTimestamp(
                math.max(s.last / 1000L + GapMs, state.getCurrentWatermarkMs + 1))
              catch { case _: UnsupportedOperationException => () }
            }
            closed.iterator
          }
      }
  }

  /** Stream-stream interval join: each click joins the same user's view
    * events from the preceding 10 minutes (attribution). Both sides
    * carry watermarks AND the join has a time-range bound, so each
    * side's buffered state expires as the watermark advances — the only
    * stream-stream join shape whose state stays bounded at scale. The
    * same transform runs batch-side for parity testing. */
  def clickAttribution(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "20 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "20 minutes")
    clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("c_ts"), col("v_ts"))
  }

  /** Streaming exact dedup — the incremental form of
    * [[graft.operators.Dedup.exact]]: rows whose content hash was
    * already seen within the watermark delay are dropped.
    * `dropDuplicatesWithinWatermark` expires each hash's state once the
    * watermark passes it, so state is bounded by (arrival rate × delay),
    * not corpus size — the only viable shape for an unbounded 100 TB/day
    * ingest stream. Exactly-once file sinks make the result equivalent
    * to batch dedup over any window shorter than the delay. */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
                  delay: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash") // synthetic key: keep the caller's schema
}
