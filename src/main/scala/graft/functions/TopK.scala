package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k typed `Aggregator`: keeps the k best (score desc,
  * id asc) pairs per group.
  *
  * This is the scale-correct per-group top-k. The window form
  * (`row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`)
  * shuffles every scored row to the group's reducer; this aggregator
  * participates in partial aggregation, so each map task ships at most
  * k pairs per group — shuffle volume is O(groups × k × partitions)
  * instead of O(rows). For a k-NN join scoring |corpus| × |queries|
  * pairs that is the difference between a plan that scales and one
  * that re-shuffles the cross product.
  *
  * Ordering matches SQL `ORDER BY score DESC, id` exactly, including
  * NaN: both Spark's `desc` sort and DuckDB rank NaN above every
  * finite value, so the comparator here puts NaN first too (Scala's
  * default Double ordering would sort it last and silently drop
  * NaN-scored rows from the top-k).
  *
  * The buffer is a size-tracked unordered list trimmed whenever it
  * exceeds 2k, so reduce stays amortized O(1) per row — one sort per
  * trim rather than a heap per row (JVM-friendlier for small k).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), (Int, List[(Long, Double)]), Seq[(Long, Double)]] {
  require(k > 0, "k must be positive")

  // score desc with NaN ranked FIRST (the SQL DESC semantics), id asc.
  // (!isNaN, -score, id) ascending: NaN rows sort before finite rows,
  // NaN-vs-NaN compares equal (java.lang.Double.compare) -> id breaks.
  private def best(b: List[(Long, Double)]): List[(Long, Double)] =
    b.sortBy { case (id, s) => (!s.isNaN, -s, id) }.take(k)

  def zero: (Int, List[(Long, Double)]) = (0, Nil)
  def reduce(b: (Int, List[(Long, Double)]), a: (Long, Double)): (Int, List[(Long, Double)]) = {
    val (n, xs) = b
    if (n + 1 > 2 * k) (k, best(a :: xs)) else (n + 1, a :: xs)
  }
  def merge(l: (Int, List[(Long, Double)]), r: (Int, List[(Long, Double)])): (Int, List[(Long, Double)]) = {
    val m = best(l._2 ::: r._2)
    (m.length, m)
  }
  def finish(b: (Int, List[(Long, Double)])): Seq[(Long, Double)] = best(b._2)
  def bufferEncoder: Encoder[(Int, List[(Long, Double)])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, List[(Long, Double)])]()
  def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

/** [[TopKAggregator]] with an opaque long payload per pair. The
  * comparator is IDENTICAL — (score desc, NaN first, id asc); the tag
  * is cargo, never a sort key, so a caller gets the same k rows in the
  * same order as the untagged aggregator plus its annotation. */
final class TopKTaggedAggregator(k: Int)
    extends Aggregator[(Long, Double, Long), (Int, List[(Long, Double, Long)]), Seq[(Long, Double, Long)]] {
  require(k > 0, "k must be positive")

  private def best(b: List[(Long, Double, Long)]): List[(Long, Double, Long)] =
    b.sortBy { case (id, s, _) => (!s.isNaN, -s, id) }.take(k)

  def zero: (Int, List[(Long, Double, Long)]) = (0, Nil)
  def reduce(b: (Int, List[(Long, Double, Long)]),
             a: (Long, Double, Long)): (Int, List[(Long, Double, Long)]) = {
    val (n, xs) = b
    if (n + 1 > 2 * k) (k, best(a :: xs)) else (n + 1, a :: xs)
  }
  def merge(l: (Int, List[(Long, Double, Long)]),
            r: (Int, List[(Long, Double, Long)])): (Int, List[(Long, Double, Long)]) = {
    val m = best(l._2 ::: r._2)
    (m.length, m)
  }
  def finish(b: (Int, List[(Long, Double, Long)])): Seq[(Long, Double, Long)] =
    best(b._2)
  def bufferEncoder: Encoder[(Int, List[(Long, Double, Long)])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, List[(Long, Double, Long)])]()
  def outputEncoder: Encoder[Seq[(Long, Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double, Long)]]()
}

object TopK {
  /** `top_k(id, score)` aggregate column: array of the k best
    * (id, score) structs, score desc / id asc. Explode the result to
    * get one row per hit. */
  /** Inputs must be NON-NULL: the primitive tuple encoder is what keeps
    * the hot aggregation allocation-free (a boxed null-tolerant encoder
    * measured ~3x slower on the kNN join). Callers whose score can be
    * null (e.g. cosine over a nullable embedding) filter first — a free
    * map-side predicate, see Similarity.knnJoin. */
  def top_k(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .apply(id, score)

  /** `top_k_tagged(id, score, tag)`: [[top_k]] with an opaque long
    * payload riding each pair — the tag NEVER participates in the
    * (score desc, id asc) ordering, it just travels with its row.
    * Exists so a serve that needs a per-hit annotation (e.g. BM25's
    * matched-term count) keeps the bounded-aggregator shape instead of
    * re-joining the winners back to the scored frame — that back-join
    * re-shuffles (and under a file-source, re-scans) the whole scored
    * subtree for k rows per group. */
  def top_k_tagged(k: Int)(id: Column, score: Column, tag: Column): Column =
    udaf(new TopKTaggedAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble,
        Encoders.scalaLong))
      .apply(id, score, tag)
}
