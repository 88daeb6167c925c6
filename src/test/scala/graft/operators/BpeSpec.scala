package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE training specs: golden merge order on a hand-checked corpus,
  * deterministic re-runs, lossless segmentation round-trip, and
  * monotone compression as rules accumulate. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("golden merge order on a hand-checked micro corpus") {
    // words: aaab (x2), ab (x1)
    // round 1 pairs: (a,a) = 2*2 = 4; (a,b) = 2*1 + 1*1 = 3 -> merge (a,a)
    //   aaab -> [aa, a, b] (greedy left-to-right, non-overlapping)
    // round 2 pairs: (aa,a) = 2; (a,b) = 2 + 1 = 3 -> merge (a,b)
    val docs = Seq((1L, "aaab ab"), (2L, "aaab")).toDF("doc_id", "text")
    assert(Bpe.learn(docs, "text", 2) == Seq(("a", "a"), ("a", "b")))
  }

  test("learning is deterministic and stops early when nothing is mergeable") {
    val docs = Seq((1L, "the cat sat on the mat the cat")).toDF("doc_id", "text")
    val m1 = Bpe.learn(docs, "text", 6)
    val m2 = Bpe.learn(docs, "text", 6)
    assert(m1 == m2)
    assert(m1.distinct.size == m1.size, "no merge rule learned twice")
    // a corpus of single-char words has no pairs at all
    assert(Bpe.learn(Seq((1L, "a b c a b")).toDF("doc_id", "text"), "text", 3).isEmpty)
  }

  test("batched learning is byte-identical to the sequential loop") {
    // batchK = 1 IS the sequential algorithm (one collect per merge);
    // the default batch must learn the same table in the same order on
    // real text, where count ties and shared symbols force the safety
    // checks to actually fire
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(60)
    val sequential = Bpe.learn(docs, "text", 48, batchK = 1)
    val batched = Bpe.learn(docs, "text", 48)
    assert(batched == sequential)
    assert(sequential.size == 48)
  }

  test("tokenize round-trips losslessly and compresses monotonically") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(40)
    val merges = Bpe.learn(docs, "text", 8)
    assert(merges.size == 8, "real text supports at least 8 merge rounds")
    val toks = Bpe.tokenize(docs, "doc_id", "text", merges)
    // concatenating a word's tokens reproduces the word, every time
    assert(toks.filter(concat_ws("", col("tokens")) =!= col("word")).count() == 0)
    // more rules => fewer or equal total symbols, strictly fewer overall
    def totalSyms(n: Int): Long =
      Bpe.tokenize(docs, "doc_id", "text", merges.take(n))
        .agg(sum(size(col("tokens")))).as[Long].head()
    val sizes = Seq(0, 4, 8).map(totalSyms)
    assert(sizes == sizes.sorted.reverse, s"monotone compression: $sizes")
    assert(sizes.last < sizes.head, "8 merges must actually compress")
  }

  test("mergePair is greedy left-to-right: overlapping runs merge non-overlapping") {
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    // only pair is (a,a); one merge turns aaaa -> [aa, aa], aaa -> [aa, a]
    val toks = Bpe.tokenize(docs, "doc_id", "text", Seq(("a", "a")))
      .orderBy(col("pos")).select(col("tokens")).as[Seq[String]].collect()
    assert(toks.toSeq == Seq(Seq("aa", "aa"), Seq("aa", "a")))
  }
}
