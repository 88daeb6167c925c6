package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep per-key PARTIAL aggregates
  * (exact decimal sum + count) and fold new deltas into them instead of
  * re-aggregating the corpus — the materialized-view refresh pattern.
  * At 100 TB this is the difference between touching yesterday's whole
  * fact table and touching today's delta: partials are key-cardinality
  * sized, re-aggregation is one shuffle of (existing partials ∪ delta
  * partials).
  *
  * Sums stay DECIMAL(18,2)-exact until [[finish]], so merging partials
  * in any order or grouping is bit-identical to the full aggregate —
  * the associativity that floats would only approximate.
  */
object IncrementalAgg {

  /** Per-key partial state of `valueCol` over `df`:
    * (keys..., psum DECIMAL(38,2), pcnt LONG). The sum is pinned at
    * max precision so repeated folds ([[merge]]) keep one stable
    * schema — Spark widens decimal sums per level otherwise, and a
    * parquet partial store must not drift types between refreshes.
    *
    * Domain contract: DECIMAL(18,2) is the engine-wide money rule
    * (README "cross-engine determinism") — 16 integral digits, 2
    * fractional. Values outside it fail LOUDLY under Spark 4's ANSI
    * default (an overflow crash beats a silent null-drop undercount),
    * and finer-than-cent scales round half-up at ingestion. For other
    * value domains, cast to the domain's decimal before calling. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,2)").as("psum"),
        count(lit(1)).as("pcnt"))

  /** Fold partial frames together: exact decimal re-aggregation whose
    * result equals [[partial]] over the concatenated inputs. */
  def merge(partials: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "need at least one partial frame")
    partials.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("psum")).cast("decimal(38,2)").as("psum"),
        sum(col("pcnt")).as("pcnt"))
  }

  /** CDC-driven refresh: fold a [[graft.sinks.VersionedStore.rowDiff]]
    * change set into existing partials — `added` rows fold forward,
    * `removed` rows fold as EXACT retractions (negated decimal
    * partials; decimals make retraction exact where float partials
    * would drift), and keys whose row count returns to zero drop out
    * of the store entirely. The refresh touches (change set ∪
    * key-cardinality partials): at 100 TB the view updates at CDC
    * cost, never by re-aggregating a snapshot. */
  def applyChanges(partials: DataFrame, changes: DataFrame, keys: Seq[String],
                   valueCol: String, changeCol: String = "change"): DataFrame = {
    val added = partial(
      changes.filter(col(changeCol) === "added"), keys, valueCol)
    val removed = partial(
        changes.filter(col(changeCol) === "removed"), keys, valueCol)
      .select(keys.map(col) :+
        (-col("psum")).cast("decimal(38,2)").as("psum") :+
        (-col("pcnt")).as("pcnt"): _*)
    merge(Seq(partials, added, removed), keys).filter(col("pcnt") =!= 0)
  }

  /** Final user-facing shape: (keys..., sum_value DOUBLE, n_rows). */
  def finish(merged: DataFrame, keys: Seq[String]): DataFrame =
    merged.select(keys.map(col) :+
      col("psum").cast("double").as("sum_value") :+
      col("pcnt").as("n_rows"): _*)
}
