package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** AQE-aware plan inspection for in-plan proofs (the q195/q201 require
  * pattern): under adaptive execution the real plan hides inside
  * [[AdaptiveSparkPlanExec]]/[[QueryStageExec]], whose children are
  * invisible to a naive `collect` — every aggregate query would look
  * vacuously scan-free. */
object PlanProbe {

  /** Does executing `df` open any file-source scan? Forces execution
    * first so AQE's final plan is the one inspected. */
  def scansFiles(df: DataFrame): Boolean = {
    df.collect(): Unit // finalize AQE
    def find(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case s: QueryStageExec => find(s.plan)
      case _: FileSourceScanExec => true
      case other => other.children.exists(find)
    }
    find(df.queryExecution.executedPlan)
  }
}
