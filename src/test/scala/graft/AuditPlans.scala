package graft

import org.apache.spark.sql.DataFrame

/** Every registry query's DataFrame at sf0.001, built ONCE and shared
  * by the four plan-audit suites (scan pruning, broadcast, cartesian,
  * global window). Building a query's frame EXECUTES its fixture
  * (store builds, appends, serve-side collects inside the query
  * function), so each audit suite used to pay a full registry pass of
  * its own — four passes where one suffices, ~35 minutes of the
  * driver's test budget. The audits only READ the plans
  * (analyzed/sparkPlan off the same cached queryExecution), so sharing
  * the frames changes no assertion — only the suite wall-clock. */
object AuditPlans {
  val sfDir = "/root/testdata/sf0.001"

  lazy val frames: Seq[(String, DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(SparkSpec.session, sfDir)
    }
}
