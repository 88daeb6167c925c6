package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("transitive closure computes all ancestor paths with distances") {
    // chain 4 -> 2 -> 1 and 3 -> 1
    val edges = Seq((4L, 2L), (2L, 1L), (3L, 1L)).toDF("child", "parent")
    val got = Closure.transitiveClosure(edges)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((4L, 2L, 1), (2L, 1L, 1), (3L, 1L, 1), (4L, 1L, 2)))
  }

  test("closure keeps one row per PATH (cvtermpath multiplicity) and deep chains") {
    // diamond: 5 -> {3, 4} -> 1 — two distinct length-2 paths 5~>1
    val diamond = Seq((5L, 3L), (5L, 4L), (3L, 1L), (4L, 1L)).toDF("child", "parent")
    val rows = Closure.transitiveClosure(diamond)
      .filter($"child" === 5L && $"ancestor" === 1L).collect()
    assert(rows.length == 2 && rows.forall(_.getInt(2) == 2))
    // chain of 9 (depth not a power of two — exercises the mixed
    // prefix+suffix round of the doubling loop)
    val chain = (1 until 9).map(i => (i.toLong, i.toLong + 1)).toDF("child", "parent")
    val got = Closure.transitiveClosure(chain)
      .as[(Long, Long, Int)].collect()
    assert(got.length == 8 * 9 / 2) // all (i, j>i) pairs
    assert(got.toSet == (for { c <- 1 to 8; a <- c + 1 to 9 }
      yield (c.toLong, a.toLong, a - c)).toSet)
    assert(got.length == got.distinct.length)
  }

  test("sessionize splits on gap threshold per key") {
    val df = Seq(
      (1L, 0L), (1L, 100L), (1L, 5000L), // user 1: two sessions at gap>1000
      (2L, 0L)).toDF("user_id", "t")
    val got = Sessionize.assign(df, Seq($"user_id"), Seq($"t"), $"t", 1000L)
      .select($"user_id", $"t", $"session_id").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == Set((1L, 0L, 1L), (1L, 100L, 1L), (1L, 5000L, 2L), (2L, 0L, 1L)))
  }

  test("exact dedup groups identical content") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(docs, "doc_id", "text")
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("minhash LSH flags near-duplicates but not unrelated docs") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 7) "CHANGED" else s"w$i").mkString(" ")
    val far = (100 to 140).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    val pairs = Dedup.lshCandidates(Dedup.minhashSignature(sh, 8), 8, 4)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("jaccard pairs computes exact overlap ratio") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "z z z z"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 2)
    // doc1 shingles {ab,bc,cd}, doc2 {ab,bc,ce}: inter 2, union 4 -> 0.5
    val got = Dedup.jaccardPairs(sh, 0.4).as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 2L, 0.5)))
  }

  test("jaccard maxDf cap drops boilerplate shingles from candidates") {
    // "x x" appears in all three docs; with maxDf=2 it can't generate
    // candidates, so only the a/b pair (sharing "a b") survives
    val docs = Seq((1L, "a b x x"), (2L, "a b x x"), (3L, "q r x x"))
      .toDF("doc_id", "text")
    val sh = Dedup.shingles(docs, "doc_id", "text", 2)
    val capped = Dedup.jaccardPairs(sh, 0.1, maxDf = 2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 2L)))
    val uncapped = Dedup.jaccardPairs(sh, 0.1)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(uncapped == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("simhash of identical docs matches, differs for unrelated docs") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val got = Dedup.simhash(docs, "doc_id", "text", 16)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
    assert(got(1L).length == 16 && got(1L).forall(c => c == '0' || c == '1'))
  }

  test("cosine top-k ranks by similarity against the query vector") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(1f, 0.1f, 0f)), // closest
      (2L, Array(0f, 1f, 0f)), // orthogonal
      (3L, Array(-1f, 0f, 0f))) // opposite
      .toDF("vec_id", "embedding")
    val got = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 3)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got.head._2 > 0.99)
    assert(got(1)._2 == 0.0)
    assert(got(2)._2 == -1.0)
  }

  test("sign-bucket ANN probes only the query bucket") {
    val emb = Seq(
      (0L, Array(1f, 1f, 1f)),
      (1L, Array(0.9f, 0.8f, 0.7f)), // same bucket (+++)
      (2L, Array(-1f, 1f, 1f))) // different bucket
      .toDF("vec_id", "embedding")
    val got = Similarity.signBucketTopK(emb, "vec_id", "embedding", 0L, 3, 5)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L)) // bucket pruning dropped vec 2
  }
}
