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
  * The buffer is an unordered list trimmed whenever it exceeds 2k, so
  * reduce stays amortized O(1) per row with one sort per trim rather
  * than a heap per row (JVM-friendlier for small k).
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {
  require(k > 0, "k must be positive")

  private def best(b: List[(Long, Double)]): List[(Long, Double)] =
    b.sortBy { case (id, s) => (-s, id) }.take(k)

  def zero: List[(Long, Double)] = Nil
  def reduce(b: List[(Long, Double)], a: (Long, Double)): List[(Long, Double)] = {
    val nb = a :: b
    if (nb.length > 2 * k) best(nb) else nb
  }
  def merge(l: List[(Long, Double)], r: List[(Long, Double)]): List[(Long, Double)] =
    best(l ::: r)
  def finish(b: List[(Long, Double)]): Seq[(Long, Double)] = best(b)
  def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()
  def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}

object TopK {
  /** `top_k(id, score)` aggregate column: array of the k best
    * (id, score) structs, score desc / id asc. Explode the result to
    * get one row per hit. */
  def top_k(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .apply(id, score)
}
