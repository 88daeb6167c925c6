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
    find(df.queryExecution.executedPlan).nonEmpty
  }

  /** How many data files did `df`'s scans actually open? Partition- and
    * file-pruning both land in the scan's `numFiles` metric, so this is
    * the probe for "only the probed partitions were read" proofs. */
  def scannedFileCount(df: DataFrame): Long = {
    df.collect(): Unit // run, so the metrics are populated
    find(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  private def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => find(a.executedPlan)
    case s: QueryStageExec => find(s.plan)
    case sc: FileSourceScanExec => Seq(sc)
    case other => other.children.flatMap(find)
  }
}
