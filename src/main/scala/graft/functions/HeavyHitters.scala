package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter summary: a k-counter frequency sketch with
  * the classic guarantee that every item with true frequency
  * > n/(k+1) survives in the summary — in o(n) memory, mergeable, one
  * pass. This is the CANDIDATE pass of the two-pass heavy-hitters
  * recipe ([[graft.operators.Curation.heavyHitters]]): the summary's
  * counts are order-dependent (partial merges happen in shuffle
  * order), so the sketch is never the answer — it bounds the candidate
  * set a second exact, candidate-keyed pass recounts. The FINAL output
  * is deterministic because the guarantee makes the candidate set a
  * superset of the true heavy hitters regardless of merge order.
  *
  * reduce is amortized O(1) (decrement-all is paid by prior
  * increments); merge adds the two summaries and re-trims by the
  * (k+1)-th largest count, which preserves the frequency guarantee
  * (Agarwal et al., "Mergeable Summaries").
  */
final class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, "summary size must be positive")

  private def trim(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val cut = m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, c) => val d = c - cut; if (d > 0) Some(t -> d) else None }
    }

  def zero: Map[String, Long] = Map.empty
  def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
    b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < k => b.updated(tok, 1L)
      case None => b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }
  def merge(l: Map[String, Long], r: Map[String, Long]): Map[String, Long] =
    trim(r.foldLeft(l) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })
  def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
  def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object HeavyHitters {
  /** `mg_candidates(tok)` aggregate: a sorted candidate-token array
    * guaranteed to contain every item with frequency > n/(k+1). */
  def mg_candidates(k: Int)(tok: Column): Column =
    udaf(new MisraGriesAggregator(k), Encoders.STRING).apply(tok)
}
