package graft

import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint

/** Codifies VERDICT r6 #2: a FORCED `broadcast()` hint overrides the
  * planner's size statistics, so a hint on a corpus-derived frame is a
  * latent OOM at 100 TB no matter how green the small-SF row is (the r6
  * knnClassify finding). Planner-chosen broadcasts are exempt by
  * construction — AQE only picks them while runtime stats sit under
  * `autoBroadcastJoinThreshold` and falls back to a shuffle join once
  * they don't. Every forced hint in every registry query must therefore
  * belong to a documented bounded family below; anything new fails this
  * spec until it is either un-hinted (let AQE decide) or documented
  * with its boundedness argument.
  */
class BroadcastAuditSpec extends SparkSpec {

  /** Documented forced-broadcast families: family -> (why bounded,
    * query -> the exact column sets it may force-broadcast). */
private val families = BoundedFamilies.families

  test("every forced broadcast hint belongs to a documented bounded family") {
    val actual: Seq[(String, Set[String])] =
      AuditPlans.frames.flatMap { case (name, df) =>
        df.queryExecution.analyzed.collect {
          case h: ResolvedHint if h.hints.strategy.nonEmpty =>
            name -> h.child.output.map(_.name).toSet
        }
      }.distinct
    val documented: Set[(String, Set[String])] = families.flatMap {
      case (_, _, qs) => qs.toSeq.flatMap { case (q, sets) => sets.map(q -> _) }
    }.toSet
    val undocumented = actual.filterNot(documented)
    assert(undocumented.isEmpty,
      "forced broadcast of an undocumented frame (corpus-sized? un-hint it " +
        "and let AQE decide, or document its boundedness in a family): " +
        undocumented.map { case (q, c) => s"$q[${c.toSeq.sorted.mkString(",")}]" }
          .mkString(", "))
    // documentation must not outlive the hints it documents
    val actualSet = actual.toSet
    val stale = documented.filterNot(actualSet)
    assert(stale.isEmpty,
      "stale broadcast-family entries (hint no longer planned): " +
        stale.map { case (q, c) => s"$q[${c.toSeq.sorted.mkString(",")}]" }
          .mkString(", "))
  }
}
