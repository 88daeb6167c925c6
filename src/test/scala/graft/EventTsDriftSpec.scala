package graft

import org.apache.spark.sql.functions._

/** Guard against timestamp-type drift in the events testdata: the
  * parquet `ts` column has shifted between timestamp-with-zone and
  * tz-less `timestamp[us]` (which Spark 4 reads as TIMESTAMP_NTZ —
  * `unix_micros` rejects it, the round-5 q7/q8/q43 casualty). Every
  * event-family query must produce IDENTICAL output on a TIMESTAMP and
  * a TIMESTAMP_NTZ events frame, so the next silent testdata/reader
  * change breaks this spec instead of the driver's correctness gate.
  * (Identity holds because the session timezone is pinned to UTC.)
  */
class EventTsDriftSpec extends SparkSpec {

  private val eventQueries = Seq(
    "q7_gaps", "q8_sessionize", "q37_timewindow",
    "q43_funnel", "q66_attribution", "q89_asof", "q174_event_anomaly")

  // two copies of the events table differing ONLY in the ts type
  private lazy val (tzDir, ntzDir) = {
    val base = java.nio.file.Files.createTempDirectory("tsdrift")
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val tz = base.resolve("tz").toString
    val ntz = base.resolve("ntz").toString
    ev.withColumn("ts", col("ts").cast("timestamp"))
      .write.parquet(s"$tz/events.parquet")
    ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.parquet(s"$ntz/events.parquet")
    (tz, ntz)
  }

  for (q <- eventQueries)
    test(s"$q is timestamp-type agnostic (TZ vs NTZ events)") {
      val onTz = SparkEntry.queries(q)(spark, tzDir).collect().map(_.toString).toSeq
      val onNtz = SparkEntry.queries(q)(spark, ntzDir).collect().map(_.toString).toSeq
      assert(onTz.nonEmpty, s"$q returned no rows")
      assert(onTz == onNtz, s"$q output differs between TIMESTAMP and TIMESTAMP_NTZ")
    }
}
