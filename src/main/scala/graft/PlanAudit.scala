package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or more registry
  * queries (`runMain graft.PlanAudit q133_bm25 …`) — the feedback loop
  * behind PLANS.md. Not part of the driver contract.
  */
object PlanAudit {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}

  /** Column-name sets of every broadcast exchange in a physical plan,
    * recursing through the AQE wrappers (`AdaptiveSparkPlanExec`,
    * `QueryStageExec`) and reused exchanges that hide them from a plain
    * `collect`. The frame a broadcast carries is identified by WHAT it
    * outputs — the contract the broadcast-audit spec checks against its
    * documented dimension/seed/sidecar families. */
  def broadcastOutputs(plan: SparkPlan): Seq[Set[String]] =
    (plan.collect {
      case b: BroadcastExchangeExec => Seq(b.output.map(_.name).toSet)
      case r: ReusedExchangeExec if r.child.isInstanceOf[BroadcastExchangeExec] =>
        Seq(r.output.map(_.name).toSet)
      case a: AdaptiveSparkPlanExec => broadcastOutputs(a.executedPlan)
      case s: QueryStageExec => broadcastOutputs(s.plan)
    }).flatten ++ plan.subqueries.flatMap(broadcastOutputs)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"========== $q ==========")
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
