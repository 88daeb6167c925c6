package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GenomicFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import GenomicFunctions._

  test("strand encode/decode round-trips (F7)") {
    val df = Seq("+", "-", ".").toDF("s")
    val got = df.select(strandDecode(strandEncode($"s")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("+", "-", "."))
  }

  test("coordinate shift round-trips (F8)") {
    val df = Seq(1, 100, 999).toDF("start")
    val got = df.select(toOneBased(toInterbase($"start")).as("r")).as[Int].collect()
    assert(got.toSeq == Seq(1, 100, 999))
  }

  test("reverse complement is an involution (F5)") {
    val df = Seq("ACGT", "AATTCCGG", "GATTACA").toDF("seq")
    val got = df.select(reverseComplement(reverseComplement($"seq")).as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("ACGT", "AATTCCGG", "GATTACA"))
    assert(df.select(reverseComplement($"seq").as("r")).as[String].collect().head == "ACGT")
  }

  test("60-char wrap inserts newlines every 60 chars (F6)") {
    val long = "A" * 130
    val got = Seq(long).toDF("seq").select(wrap60($"seq").as("r")).as[String].collect().head
    assert(got.split("\n").map(_.length).toSeq == Seq(60, 60, 10))
  }

  test("normalize_id splits prefix:accession with fallback (F1)") {
    val df = Seq("GO:0001", "plainid").toDF("id")
    val got = df.select(normalizeId($"id", "internal").as("n"))
      .select($"n.db", $"n.accession").as[(String, String)].collect().toSeq
    assert(got == Seq(("GO", "0001"), ("internal", "plainid")))
  }

  test("obsolete decoration appends marker only when obsolete (F11)") {
    val df = Seq(("term a", "T:1", 1), ("term b", "T:2", 0)).toDF("name", "acc", "obs")
    val got = df.select(obsoleteDecorate($"name", $"acc", $"obs").as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("term a (obsolete T:1)", "term b"))
  }

  test("pipe split/join round-trips (F1/A7)") {
    val df = Seq("a|b|c").toDF("v")
    assert(df.select(pipeJoin(pipeSplit($"v")).as("r")).as[String].collect().head == "a|b|c")
  }

  test("map translate falls back to default (F16)") {
    val df = Seq("x", "y", "z").toDF("v")
    val got = df.select(mapTranslate($"v", Map("x" -> "1", "y" -> "2"), $"v").as("r"))
      .as[String].collect().toSeq
    assert(got == Seq("1", "2", "z"))
  }

  test("ordered assembly aggregator concatenates by position (O2)") {
    import graft.functions.OrderedAssembly
    val ds = Seq((1L, 2, "CCC"), (1L, 0, "AAA"), (1L, 1, "BBB"), (2L, 0, "X"))
      .toDS()
    val got = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(OrderedAssembly.assemble.toColumn)
      .collect().toMap
    assert(got == Map(1L -> "AAABBBCCC", 2L -> "X"))
  }

  test("cigar reformat (F15)") {
    val got = Seq("12M3I9M").toDF("c").select(cigarToGap($"c").as("r"))
      .as[String].collect().head
    assert(got == "M 12 I 3 M 9")
  }

  test("C-style %.3g: strip zeros, half-even ties, fixed/sci cutover (F10)") {
    // C/Perl printf forms, not Java Formatter's (which keeps trailing
    // zeros and rounds ties half-up)
    assert(GenomicFunctions.g3(1e-30) == "1e-30")
    assert(GenomicFunctions.g3(0.0001) == "0.0001") // x = -4: still fixed
    assert(GenomicFunctions.g3(0.00001) == "1e-05") // x = -5: scientific
    assert(GenomicFunctions.g3(95.5) == "95.5")
    assert(GenomicFunctions.g3(100.0) == "100")
    assert(GenomicFunctions.g3(999.0) == "999")
    assert(GenomicFunctions.g3(1000.0) == "1e+03") // x = 3: scientific
    assert(GenomicFunctions.g3(0.0) == "0")
    // exact binary ties round half-even: 4605000 -> 4.60 -> "4.6";
    // 4615000 -> 4.62
    assert(GenomicFunctions.g3(4605000.0) == "4.6e+06")
    assert(GenomicFunctions.g3(4615000.0) == "4.62e+06")
    assert(GenomicFunctions.g3(-0.000123) == "-0.000123")
    // the Column form matches, null-safe
    val got = Seq(Some(1.7e-29), None).toDF("v")
      .select(formatG3($"v").as("g")).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("1.7e-29"), None))
  }

  test("legacyDate parses only fixed-width dd-MMM-yy; 4-digit years stay null") {
    val got = Seq("01-JAN-95", "30-DEC-69", "05-FEB-04", "01-JAN-1995", "junk", "")
      .toDF("d")
      .select(GenomicFunctions.legacyDate($"d").cast("string").as("p"))
      .as[Option[String]].collect().toSeq
    // POSIX century split: >= 69 -> 19xx, else 20xx; a dd-MMM-yyyy value
    // must NOT silently read '19' as the year (it parsed to 2019 before
    // the width guard) — it stays null, like any other malformed value
    assert(got == Seq(Some("1995-01-01"), Some("1969-12-30"),
      Some("2004-02-05"), None, None, None))
  }
}
