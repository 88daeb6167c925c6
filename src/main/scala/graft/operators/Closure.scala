package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative transitive closure over an edge table.
  *
  * Re-expresses the reference's `cvtermpath` closure load
  * (share/postgresql_transitive.lib:14-47; the reference outsources the
  * closure computation itself to owltools, SURVEY.md §4) as an in-engine
  * semi-naive fixpoint: repeatedly extend the frontier one hop and union.
  *
  * Scale notes: each iteration is one shuffle join keyed on the frontier's
  * `parent` column; `localCheckpoint` truncates lineage so plan size stays
  * O(1) across iterations instead of O(depth). For a DAG of depth d the
  * loop runs d joins — the same asymptotics as semi-naive datalog. On a
  * cluster, co-partition `edges` once and reuse (`repartition(col)`) so
  * only the shrinking frontier reshuffles.
  */
object Closure {

  /** Edges as (child, parent). Returns (child, ancestor, dist), dist >= 1.
    * Assumes an acyclic graph (the reference's ontology DAGs are acyclic;
    * a cycle would loop forever — pass maxIters to bound).
    */
  def transitiveClosure(edges: DataFrame, maxIters: Int = 64): DataFrame = {
    val e = edges.select(col("child"), col("parent")).localCheckpoint()
    var acc = e.withColumn("dist", lit(1))
    var frontier = acc
    var i = 0
    while (i < maxIters && !frontier.isEmpty) {
      // extend every frontier path one hop: (c -> p) + (p -> gp) = (c -> gp)
      frontier = frontier
        .join(e.withColumnRenamed("child", "p").withColumnRenamed("parent", "gp"),
          col("parent") === col("p"))
        .select(col("child"), col("gp").as("parent"), (col("dist") + 1).as("dist"))
        .localCheckpoint()
      acc = acc.unionByName(frontier)
      i += 1
    }
    acc.select(col("child"), col("parent").as("ancestor"), col("dist"))
  }

  /** J7/U2 — closure prune: live `cvtermpath`-shaped rows not present in
    * the freshly computed closure are the delete set
    * (share/postgresql_transitive.lib:50-78's correlated
    * `EXISTS ... EXCEPT` done as a plain EXCEPT). */
  def pruneSet(liveClosure: DataFrame, newClosure: DataFrame): DataFrame =
    liveClosure.except(newClosure.select(liveClosure.columns.toIndexedSeq.map(col): _*))
}
