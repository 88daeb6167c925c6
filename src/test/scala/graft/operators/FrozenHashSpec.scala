package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the driver-side frozen-hash helpers (r16: bucketOf /
  * termProbesLocal / dfSketchProbesLocal) BIT-EQUAL to the engine
  * expressions the writers evaluate (`pmod(xxhash64(...), ...)`).
  * The store layout froze the engine hash; the serve-side local
  * evaluation must agree on every term or serves would open the wrong
  * bucket — a Spark upgrade that changed XxHash64 fails here loudly.
  * Probes cover ASCII, unicode (incl. supplementary planes), the
  * empty string, and long tokens. */
class FrozenHashSpec extends SparkSpec {

  private val terms: Seq[String] = Seq(
    "", "a", "join", "merge", "vector", "stream", "window",
    "ZZ-top_9", "naïve", "héllo wörld", "日本語テキスト", "🙂🚀",
    "🚀tail", "mixed🙂ascii", "x" * 500,
    "term_with_underscores_and_digits_0123456789") ++
    (0 until 64).map(i => s"w$i")

  test("bucketOf == engine pmod(xxhash64(w), nb) for several nb") {
    import spark.implicits._
    for (nb <- Seq(1, 2, 8, 13, 64, 1027)) {
      val engine = terms.toDF("w")
        .select(col("w"),
          pmod(xxhash64(col("w")), lit(nb)).cast("int").as("tb"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      terms.foreach { w =>
        assert(TextIndex.bucketOf(w, nb) == engine(w),
          s"bucketOf('$w', $nb) diverged from the engine hash")
      }
    }
  }

  test("termProbesLocal == engine pmod(xxhash64(w, i), bits)") {
    import spark.implicits._
    val bits = 1L << 17
    val engine = terms.toDF("w")
      .select(col("w"), array((0 until 4).map(i =>
        pmod(xxhash64(col("w"), lit(i)), lit(bits))): _*).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    terms.foreach { w =>
      assert(TextIndex.termProbesLocal(w) == engine(w),
        s"termProbesLocal('$w') diverged from the engine probes")
    }
  }

  test("dfSketchProbesLocal == engine absolute sketch indexes") {
    import spark.implicits._
    val W = 8192L
    val engine = terms.toDF("w")
      .select(col("w"), array((0 until 2).map(d =>
        lit(d * W) + pmod(xxhash64(col("w"), lit(101 + d)), lit(W))): _*)
        .as("ps"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).map(_.toInt)).toMap
    terms.foreach { w =>
      assert(TextIndex.dfSketchProbesLocal(w) == engine(w),
        s"dfSketchProbesLocal('$w') diverged from the engine probes")
    }
  }
}
