package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions (SURVEY.md §4 /
  * builder brief): when a handful of hot keys dominate — one organism's
  * chromosome, one boilerplate document cluster — a plain shuffle join
  * puts the hot key's entire row set in one task. Salting splits each
  * fact row into one of `saltBuckets` sub-keys and replicates the
  * (smaller) right side once per bucket, bounding any task at
  * ~1/saltBuckets of the hot key.
  *
  * AQE's skew-join handles most cases automatically
  * (`spark.sql.adaptive.skewJoin.enabled`); explicit salting remains the
  * tool when the skew is in an aggregation key or AQE's split thresholds
  * don't trigger. Salt is derived deterministically from fact-row content
  * (`xxhash64 % buckets`), so retried tasks produce identical output.
  */
object SkewJoin {

  /** Inner equi-join of `facts` to `dims` on `key`, salted. `dims` must
    * be the small/replicable side (it is replicated saltBuckets times —
    * at cluster scale keep it dimension-sized). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 saltBuckets: Int, saltSource: Column): DataFrame = {
    val salted = facts.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets)).cast("int"))
    val replicated = dims
      .withColumn("_salt", explode(lit((0 until saltBuckets).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on
    * (key, salt) — spreading a hot key over saltBuckets tasks — then
    * final aggregate on key. `partials` build the salted stage from
    * ready-made partial aggregates; `finals` fold the partials. */
  def saltedCount(df: DataFrame, key: String, saltBuckets: Int,
                  saltSource: Column): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltSource), lit(saltBuckets)).cast("int"))
      .groupBy(col(key), col("_salt")).agg(count(lit(1)).as("_partial"))
      .groupBy(col(key)).agg(sum(col("_partial")).as("n"))
}
