package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>`). Scale extension (builder brief): brute-force
  * cosine top-k as the exact baseline, and a sign-bucket (1-bit-per-dim
  * LSH) pruned variant as the scale path.
  *
  * All arithmetic is widened to double *before* multiply/accumulate and
  * folds strictly left-to-right (`aggregate`), so an oracle that sums the
  * same order reproduces results bit-for-bit; results are additionally
  * rounded to 6 decimals before ranking to absorb any engine-level
  * reassociation.
  *
  * Scale notes: the query vector rides along via a broadcast cross join
  * (one row), so scoring is map-side only — no shuffle until top-k, which
  * Spark executes as per-partition partial top-k + driver merge
  * (`TakeOrderedAndProject`). The sign-bucket variant turns an O(n) scan
  * per query into an O(n / 2^bits) bucket probe — the IVF pattern.
  */
object Similarity {

  /** Add a `sim` column: rounded cosine similarity of `embCol` vs the
    * single-row query frame `queryVec` (column `qv`), via the native
    * fused expression ([[graft.functions.CosineSimilarity]] — one pass,
    * codegen'd, bit-identical to the composable
    * `aggregate(zip_with(...))` form it replaced). */
  def withCosine(df: DataFrame, queryVec: DataFrame, embCol: String): DataFrame =
    df.crossJoin(broadcast(queryVec))
      .withColumn("sim",
        round(graft.functions.VectorFunctions.cosine_sim(col(embCol), col("qv")), 6))
      .drop("qv")

  /** Exact brute-force cosine top-k against the embedding of `queryId`. */
  def cosineTopK(emb: DataFrame, idCol: String, embCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val qv = emb.filter(col(idCol) === queryId).select(col(embCol).as("qv"))
    withCosine(emb.filter(col(idCol) =!= queryId), qv, embCol)
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Sign-bucket LSH: bucket key = sign bits of the first `bits` dims.
    * Probes only the query's bucket, then exact cosine within it. */
  def signBucketTopK(emb: DataFrame, idCol: String, embCol: String,
                     queryId: Long, bits: Int, k: Int): DataFrame = {
    def bucket(df: DataFrame): DataFrame = df.withColumn("bucket",
      concat((1 to bits).map(i =>
        when(element_at(col(embCol), i) >= 0f, "1").otherwise("0")): _*))
    val all = bucket(emb)
    val q = all.filter(col(idCol) === queryId)
      .select(col(embCol).as("qv"), col("bucket"))
    val candidates = all.filter(col(idCol) =!= queryId)
      .join(broadcast(q.select(col("bucket"))), Seq("bucket"), "left_semi")
    withCosine(candidates, q.select(col("qv")), embCol)
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }
}
