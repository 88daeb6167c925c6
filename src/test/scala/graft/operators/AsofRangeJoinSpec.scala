package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Model-based checks for the as-of join (tagged-union window form) and
  * the binned range join: on random inputs both must produce exactly the
  * rows a brute-force scan produces.
  */
class AsofRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- as-of

  /** Brute-force backward as-of: latest right (ts, payload) with
    * r.ts <= l.ts per key; ties by max payload (matches rightOrder). */
  private def bruteBackward(left: Seq[(Int, Long)], right: Seq[(Int, Long, Long)])
      : Set[(Int, Long, Option[Long], Option[Long])] =
    left.map { case (k, ts) =>
      val m = right.filter(r => r._1 == k && r._2 <= ts)
      if (m.isEmpty) (k, ts, None, None)
      else {
        val best = m.maxBy(r => (r._2, r._3))
        (k, ts, Some(best._3), Some(best._2))
      }
    }.toSet

  test("backward as-of equals brute force on random inputs") {
    val rnd = new Random(7)
    for (trial <- 1 to 4) {
      val left = Seq.fill(60)((rnd.nextInt(5), rnd.nextInt(40).toLong))
      val right = Seq.fill(40)((rnd.nextInt(5), rnd.nextInt(40).toLong, rnd.nextInt(1000).toLong))
      val got = AsofJoin.backward(
          left.toDF("k", "ts"), right.toDF("k", "ts", "payload"),
          Seq("k"), "ts", rightOrder = Seq("payload"))
        .select(col("k"), col("ts"), col("payload"), col("asof_ts"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toSet
      assert(got == bruteBackward(left, right), s"trial $trial")
    }
  }

  test("forward as-of picks the earliest at-or-after right row") {
    val left = Seq((1, 10L), (1, 15L), (2, 5L)).toDF("k", "ts")
    val right = Seq((1, 10L, 100L), (1, 12L, 120L), (1, 14L, 140L)).toDF("k", "ts", "v")
    val got = AsofJoin.forward(left, right, Seq("k"), "ts")
      .select(col("k"), col("ts"), col("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSet
    // ts=10 matches the equal-ts right row (inclusive); ts=15 has none after.
    assert(got == Set((1, 10L, Some(100L)), (1, 15L, None), (2, 5L, None)))
  }

  test("equal-ts right rows: greatest rightOrder wins deterministically") {
    val left = Seq((1, 10L)).toDF("k", "ts")
    val right = Seq((1, 10L, 3L), (1, 10L, 9L), (1, 10L, 5L)).toDF("k", "ts", "v")
    val got = AsofJoin.backward(left, right, Seq("k"), "ts", rightOrder = Seq("v"))
      .select(col("v")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(9L))
  }

  test("as-of keeps all left columns and rejects ambiguous payloads") {
    val left = Seq((1, 10L, "a")).toDF("k", "ts", "note")
    val right = Seq((1, 9L, "b")).toDF("k", "ts", "note")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.backward(left, right, Seq("k"), "ts")
    }
    assert(e.getMessage.contains("note"))
  }

  // -------------------------------------------------------- range join

  private def bruteRange(points: Seq[(Int, Double)], ivs: Seq[(Int, Double, Double)])
      : Set[(Int, Int)] =
    (for {
      (pid, v) <- points
      (iid, lo, hi) <- ivs
      if v >= lo && v <= hi
    } yield (pid, iid)).toSet

  test("binned range join equals brute force across bin widths") {
    val rnd = new Random(11)
    val points = (1 to 200).map(i => (i, rnd.nextDouble() * 100 - 50))
    val ivs = (1 to 30).map { i =>
      val lo = rnd.nextDouble() * 100 - 50
      (i, lo, lo + rnd.nextDouble() * 20)
    }
    val want = bruteRange(points, ivs)
    for (width <- Seq(0.5, 7.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(
          points.toDF("pid", "v"), "v",
          ivs.toDF("iid", "lo", "hi"), "lo", "hi", width)
        .select(col("pid"), col("iid")).collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      assert(got.length == got.toSet.size, s"width $width produced duplicate pairs")
      assert(got.toSet == want, s"width $width")
    }
  }

  test("range join includes both interval endpoints exactly once") {
    val points = Seq((1, 5.0), (2, 10.0), (3, 10.000001), (4, 4.999999)).toDF("pid", "v")
    val ivs = Seq((1, 5.0, 10.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "v", ivs, "lo", "hi", 2.0)
      .select(col("pid")).collect().map(_.getInt(0)).toSet
    assert(got == Set(1, 2))
  }
}
