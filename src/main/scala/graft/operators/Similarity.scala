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

  /** IVF (inverted-file) ANN: a coarse quantizer partitions vectors into
    * cells; queries probe only their nearest cell. The real scale path —
    * a 10B-vector index scans one cell (~n/k vectors), not the corpus.
    *
    * Training is one deterministic Lloyd step: centroids initialize from
    * the first `numCells` vectors by id, every vector assigns to its
    * nearest centroid (exact L2², ties to the lowest cell id), and cell
    * means are recomputed per dimension, rounded to 6 decimals. The
    * rounding makes the trained centroids — and therefore assignments,
    * and therefore results — reproducible on any engine regardless of
    * aggregation order.
    */
  /** `nprobe` is the recall knob every real IVF index carries: probe the
    * `nprobe` cells whose trained centroids are nearest the query
    * (ordered by (distance, cell id)). nprobe = 1 reproduces the pure
    * assignment-cell probe; nprobe = numCells degrades gracefully to the
    * exact scan. Cost is O(nprobe · n / numCells) candidates. */
  def ivfTopK(emb: DataFrame, idCol: String, embCol: String,
              queryId: Long, numCells: Int, k: Int, nprobe: Int = 1): DataFrame = {
    // native fused expression ([[graft.functions.L2Distance]]) — the
    // aggregate(zip_with(...)) form it replaced is a higher-order
    // function chain that never enters codegen; semantics (double
    // widening, left-to-right accumulation) are bit-identical
    val l2 = (a: String, b: String) =>
      graft.functions.VectorFunctions.l2_dist(col(a), col(b))
    val init = emb.filter(col(idCol) < numCells)
      .select(col(idCol).cast("int").as("cid"), col(embCol).as("cv"))

    // assignment pass 0: argmin over exact distances (no aggregation-order
    // dependence), lexicographic (d2, cid) tiebreak
    val assign0 = emb.select(col(idCol).as("vid"), col(embCol).as("e"))
      .crossJoin(broadcast(init))
      .withColumn("d2", l2("e", "cv"))
      .groupBy(col("vid"))
      .agg(min(struct(col("d2"), col("cid"))).getField("cid").as("cell0"))

    // Lloyd step: per-dimension means, rounded for cross-engine stability
    val cent1 = emb.select(col(idCol).as("vid"), col(embCol).as("e"))
      .join(assign0, Seq("vid"))
      .select(col("cell0"), posexplode(col("e")).as(Seq("i", "x")))
      .groupBy(col("cell0"), col("i"))
      .agg(round(sum(col("x").cast("double")) / count(lit(1)), 6).as("m"))
      .groupBy(col("cell0"))
      .agg(expr("transform(sort_array(collect_list(struct(i, m))), s -> s.m)").as("cv"))
      .select(col("cell0").as("cid"), col("cv"))
      // numCells rows, broadcast twice (assignment + probe ranking):
      // materialize once so the training pipeline runs once
      .localCheckpoint()

    // assignment pass 1 against trained centroids, for corpus + query
    def assign(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(cent1))
      .withColumn("d2", l2("e", "cv"))
      .groupBy(col("vid"), col("e"))
      .agg(min(struct(col("d2"), col("cid"))).getField("cid").as("cell"))
    val assigned = assign(emb.select(col(idCol).as("vid"), col(embCol).as("e")))
      .localCheckpoint() // reused for query cell + candidate scan

    val qv = emb.filter(col(idCol) === queryId).select(col(embCol).as("e"))
    // the nprobe nearest cells by trained-centroid distance; for
    // nprobe = 1 this is exactly the assignment cell (same tiebreak)
    val probeCells = qv.crossJoin(broadcast(cent1))
      .withColumn("d2", l2("e", "cv"))
      .orderBy(col("d2"), col("cid"))
      .limit(nprobe)
      .select(col("cid").as("cell"))
    val candidates = assigned.filter(col("vid") =!= queryId)
      .join(broadcast(probeCells), Seq("cell"), "left_semi")
    withCosine(candidates, qv.select(col("e").as("qv")), "e")
      .select(col("vid").as(idCol), col("sim"))
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
