package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** OR-reduce of probe positions into a fixed-geometry bitset — the
  * aggregation behind the text store's term-presence Bloom filter
  * ([[graft.operators.TextIndex]]). Input is the engine-evaluated
  * probe array for one row (the writer's own hash expressions — this
  * aggregator never re-implements the hash); the buffer is the packed
  * little-endian word array.
  *
  * Shape notes for the 100 TB ingest: the aggregator participates in
  * partial aggregation (each task reduces to one `nWords × 8`-byte
  * buffer, merged once per task), and OR is IDEMPOTENT — so it is
  * safe to `observe` on a frame that feeds `repartitionByRange`,
  * where the range sampler executes the observed stage a second
  * time: double-ORing the same probes changes nothing. That is what
  * lets the term-presence bitset ride the postings write itself
  * instead of costing a separate read-back job. (Contrast `count`:
  * it may only be observed BELOW the first shuffle, where map-stage
  * reuse guarantees exactly-once.)
  */
final class BitsetOrAggregator(nWords: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(nWords > 0, "bitset needs at least one word")

  def zero: Array[Long] = new Array[Long](nWords)

  def reduce(b: Array[Long], probes: Seq[Long]): Array[Long] = {
    if (probes != null) probes.foreach { p =>
      b((p / 64).toInt) |= 1L << (p % 64).toInt
    }
    b
  }

  def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
    var i = 0
    while (i < l.length) { l(i) |= r(i); i += 1 }
    l
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** Sum-reduce of counter indexes into a fixed counter array — the
  * count-min-sketch accumulation behind the text store's per-term df
  * sketch. Input is the engine-evaluated absolute counter-index array
  * for one row; each index bumps its counter by one.
  *
  * NOT idempotent (sums, unlike [[BitsetOrAggregator]]'s OR) — so it
  * may only be observed BELOW the first shuffle, where map-stage reuse
  * guarantees exactly-once execution even under a downstream range
  * sampler. The text ingest attaches it to the one-row-per-document
  * pre-explode frame for exactly that reason. */
final class CounterSumAggregator(nCounters: Int)
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
  require(nCounters > 0, "need at least one counter")

  def zero: Array[Long] = new Array[Long](nCounters)

  def reduce(b: Array[Long], idxs: Seq[Long]): Array[Long] = {
    if (idxs != null) idxs.foreach(i => b(i.toInt) += 1L)
    b
  }

  def merge(l: Array[Long], r: Array[Long]): Array[Long] = {
    var i = 0
    while (i < l.length) { l(i) += r(i); i += 1 }
    l
  }

  def finish(b: Array[Long]): Seq[Long] = b.toSeq

  def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object Bitset {
  /** `bitset_or(nWords)(probes)` — aggregate a probe-position column
    * (array<long>, each in `[0, nWords*64)`) into one packed bitset. */
  def bitset_or(nWords: Int)(probes: Column): Column =
    udaf(new BitsetOrAggregator(nWords)).apply(probes)

  /** `counter_sum(n)(idxs)` — aggregate an absolute counter-index
    * column (array<long>, each in `[0, n)`) into one counter array. */
  def counter_sum(n: Int)(idxs: Column): Column =
    udaf(new CounterSumAggregator(n)).apply(idxs)
}
