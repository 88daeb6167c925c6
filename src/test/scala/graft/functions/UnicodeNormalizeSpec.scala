package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Codegen'd Unicode normalization: NFC composes canonical sequences,
  * NFKC additionally folds compatibility characters; ASCII rows take the
  * identity fast path. */
class UnicodeNormalizeSpec extends SparkSpec {

  private def norm(s: String, form: String): String = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(UnicodeNormalize(col("t"), form).as("n"))
      .head.getString(0)
  }

  test("NFC composes decomposed accents, keeps compatibility ligatures") {
    assert(norm("e\u0301cole", "NFC") == "\u00e9cole")
    assert(norm("\ufb01n", "NFC") == "\ufb01n") // fi ligature survives NFC
  }

  test("NFKC folds ligatures, full-width forms and superscripts") {
    assert(norm("\ufb01n", "NFKC") == "fin")
    assert(norm("\uff28\uff49", "NFKC") == "Hi") // full-width Hi
    assert(norm("x\u00b2", "NFKC") == "x2") // superscript two
  }

  test("ASCII fast path is the identity; nulls propagate") {
    import spark.implicits._
    val df = Seq(Some("plain ascii"), None).toDF("t")
      .select(UnicodeNormalize(col("t"), "NFC").as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("plain ascii"), None))
  }

  test("whole-stage codegen and interpreted paths agree") {
    import spark.implicits._
    val rows = Seq("é", "ﬁ", "ascii", "Ａ́")
    val df = rows.toDF("t")
    val on = df.select(UnicodeNormalize(col("t"), "NFKC").as("n"))
    val codegen = on.collect().map(_.getString(0)).toSeq
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val interp = on.collect().map(_.getString(0)).toSeq
      assert(codegen == interp)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
