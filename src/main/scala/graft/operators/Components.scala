package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate *pairs* (LSH / Jaccard / embedding candidates)
  * into duplicate *clusters* so one canonical document per cluster
  * survives. The standard large-scale formulation: iterated min-label
  * propagation to a fixpoint.
  *
  * Scale notes: each round is one shuffle keyed on the node id (the
  * same key every round, so co-partitioning is stable); labels only
  * decrease, and the round count is bounded by the component diameter —
  * duplicate clusters are shallow (stars/cliques from bucket joins), so
  * 2-3 rounds is typical. `localCheckpoint` truncates lineage per round
  * like [[Closure.transitiveClosure]]. For adversarial long-chain
  * graphs the alternating large-star/small-star algorithm halves rounds;
  * dup graphs never need it.
  */
object Components {

  /** Edges as (a, b) node-id pairs (any orientation, dups fine).
    * Returns (id, component) for every node that appears in an edge,
    * where component = the minimum node id reachable — deterministic on
    * any engine. */
  def connectedComponents(edges: DataFrame, maxIters: Int = 32): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      // partition on `b` — the per-round JOIN key (labels arrive keyed by
      // node id = b). localCheckpoint preserves output partitioning, so
      // every round's join reuses this one shuffle of the big static side
      // and only the small label frame exchanges.
      .repartition(col("b"))
      .localCheckpoint()
    var labels = und.groupBy(col("a"))
      .agg(min(col("b")).as("nb"))
      .select(col("a").as("id"), least(col("a"), col("nb")).as("component"))
      .localCheckpoint()
    // labels only ever decrease, so sum(component) is a strictly
    // decreasing potential: an unchanged sum == a fixpoint. The
    // convergence check is then one scan of the checkpointed labels,
    // not a join of consecutive rounds. The potential aggregates as
    // DECIMAL(38,0) — a LongType sum could wrap under non-ANSI
    // semantics for huge id spaces and make "unchanged" unsound.
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(coalesce(sum(col("component").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      // each node adopts the min label among itself and its neighbors
      val next = und
        .join(labels.select(col("id").as("b"), col("component").as("nb_label")),
          Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("nb_label")).as("nb_min"))
        .join(labels, Seq("id"))
        .select(col("id"), least(col("component"), col("nb_min")).as("component"))
        .localCheckpoint()
      val curSum = labelSum(next)
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      labels = next
      iters += 1
    }
    // unconverged labels are indistinguishable from correct output —
    // fail loudly rather than hand back a silently split component
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters rounds " +
        "(component diameter exceeds maxIters — raise it for chain-shaped graphs)")
    labels
  }

  /** Canonical-doc selection: pair candidates -> clusters -> per-cluster
    * keeper (min id). Docs absent from every pair are their own keeper
    * (identity rows are not emitted — callers left-join and coalesce). */
  def duplicateClusters(pairs: DataFrame): DataFrame =
    connectedComponents(
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("component").as("cluster"))
}
