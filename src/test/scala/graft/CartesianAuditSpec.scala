package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Generalizes the judge's hand-audited anti-pattern sweep the way
  * BroadcastAuditSpec generalized the broadcast-direction finding: a
  * CartesianProductExec in any registry plan is ALWAYS a bug (both
  * sides shuffled-materialized, O(n·m) rows — at 100 TB it never
  * finishes), and a BroadcastNestedLoopJoinExec is only sound when its
  * BUILD side is one of the documented bounded frames (one-row rides,
  * LIMIT-capped pools, seed sets — the [[BoundedFamilies]] registry the
  * broadcast audit shares). Any new non-equi join that slips a
  * corpus-sized frame onto the build side fails here before it fails
  * on a cluster.
  */
class CartesianAuditSpec extends SparkSpec {

  test("no cartesian products; every nested-loop build side is documented") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val nested = scala.collection.mutable.ArrayBuffer[(String, Set[String])]()
    AuditPlans.frames.foreach { case (name, df) =>
      val plan = df.queryExecution.sparkPlan
      plan.foreach {
        case _: CartesianProductExec => offenders += name
        case b: BroadcastNestedLoopJoinExec =>
          val build = b.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => b.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
          }
          nested += (name -> build.output.map(_.name).toSet)
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"cartesian product planned (never survives scale): ${offenders.distinct.mkString(", ")}")
    val allowed = BoundedFamilies.documented ++ BoundedFamilies.nestedLoopOnly
    val undocumented = nested.distinct.filterNot { case (q, cols) =>
      allowed.contains(q -> cols) ||
        // a documented bounded frame may surface with extra projected
        // columns after planning — subset containment keeps the intent
        allowed.exists { case (dq, dcols) => dq == q && dcols.subsetOf(cols) }
    }
    assert(undocumented.isEmpty,
      "nested-loop join with an undocumented build side (corpus-sized? " +
        "bound it or document it in BoundedFamilies): " +
        undocumented.map { case (q, c) => s"$q[${c.toSeq.sorted.mkString(",")}]" }
          .mkString(", "))
    // nested-loop documentation must not outlive the plans it blesses
    val nestedSet = nested.toSet
    val stale = BoundedFamilies.nestedLoopOnly.filterNot(nestedSet)
    assert(stale.isEmpty,
      "stale nestedLoopOnly entries (no such plan anymore): " +
        stale.map { case (q, c) => s"$q[${c.toSeq.sorted.mkString(",")}]" }
          .mkString(", "))
  }
}
