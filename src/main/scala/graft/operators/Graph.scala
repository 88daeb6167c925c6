package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking over an edge list — the crawl-curation step
  * that turns the outlink graph ([[Curation.extractLinks]] → q135) into
  * a per-host authority score for frontier prioritization and quality
  * weighting, the role PageRank plays in production crawl pipelines.
  *
  * Scale notes: the edge list is the big, static side — it is shuffled
  * ONCE onto its join key (`src`) and `localCheckpoint`ed, so every
  * round's rank join reuses that partitioning and only the small
  * (node-count-sized) rank frame moves. Each round is one join + one
  * `groupBy(dst)` shuffle; `localCheckpoint` truncates lineage so the
  * plan stays O(1) per round instead of growing by two joins each
  * iteration (the same pattern as [[Components.connectedComponents]]
  * and [[Closure.transitiveClosure]]). Rank state is one double per
  * node — ~16 bytes/node — so a billion-host graph holds ranks in a
  * few executor-GB while the (much larger) edge list never re-shuffles.
  *
  * Dangling mass (nodes with no out-edges) is folded back uniformly
  * each round, so total rank stays 1 and the result matches the power
  * iteration on the stochastic-complete matrix. The dangling sum is a
  * one-scalar aggregate per round over the node-sized rank frame.
  */
object Graph {

  /** Weighted PageRank: `edges` has (src, dst, w) rows (w = edge
    * multiplicity/weight, > 0). Returns (node, pr) for every node that
    * appears as a src or dst, after exactly `iters` power-iteration
    * rounds from the uniform start — a fixed round count keeps the
    * result engine-reproducible (no convergence-threshold FP races).
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val teleport = 1.0 - damping
    // normalized transition fractions, partitioned once on the per-round
    // join key; localCheckpoint pins both the data and its partitioning
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
    val frac = edges.join(outw, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("ow").cast("double")).as("frac"))
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count().toDouble
    // nodes with no outgoing edge: their whole rank is dangling mass
    val sinks = nodes.join(outw.select(col("src").as("node")), Seq("node"),
      "left_anti").localCheckpoint()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("pr"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val dangling = sinks.join(ranks, "node")
        .agg(coalesce(sum(col("pr")), lit(0.0))).head().getDouble(0)
      val contrib = frac
        .join(ranks.select(col("node").as("src"), col("pr")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("pr") * col("frac")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(teleport / n) +
            lit(damping) * (coalesce(col("s"), lit(0.0)) + lit(dangling / n)))
            .as("pr"))
        .localCheckpoint()
      i += 1
    }
    ranks
  }
}
