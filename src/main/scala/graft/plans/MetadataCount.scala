package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only `count(*)` over a [[graft.sinks.SkippingStore]] multi
  * sidecar — the Delta/Iceberg manifest-count optimization as an
  * injected Catalyst rule: a bare global count over a plain parquet
  * read of a store whose `_zonemap_multi` carries per-file `nrows`
  * collapses to a [[LocalRelation]] holding the sidecar sum. No data
  * file is opened; at a million-file 100 TB store the count costs one
  * sidecar read instead of a full scan. Registered through
  * [[graft.GraftExtensions]], kill-switched by
  * `spark.graft.metacount.enabled`.
  *
  * Matched shape — deliberately narrow, every condition correctness-
  * bearing:
  *  - global aggregate (no grouping), every aggregate expression a
  *    bare non-distinct, un-filtered `count(1)`/`count(*)` (a
  *    `count(col)` skips nulls, so it must scan);
  *  - the child is the relation under zero or more [[Project]]s (a
  *    Project never changes row count — a Filter does, and does NOT
  *    match);
  *  - V1 parquet relation whose root is the store dir (partitioned
  *    stores qualify: their relative-path sidecar covers every
  *    partition's files, and the bare-count shape excludes partition
  *    filters).
  * The sidecar sum itself ([[graft.sinks.SkippingStore.metadataCount]])
  * refuses when any data file is unmapped (coverage check), a file's
  * recorded counts disagree, or the sidecar predates `nrows` — any
  * refusal or failure falls back to the stock scan, so the rule can
  * only ever remove work, never change an answer. */
case class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.metacount.enabled", "true").toBoolean)
      return plan
    plan.transform {
      case a @ Aggregate(Seq(), aggs, child, _)
          if aggs.nonEmpty && aggs.forall(isBareCount) =>
        stripProjects(child) match {
          case Some(l) =>
            try rewrite(a, l) catch {
              case scala.util.control.NonFatal(_) => a
            }
          case None => a
        }
    }
  }

  private def isBareCount(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _), _) =>
      true
    case _ => false
  }

  private def stripProjects(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        Some(l)
      case Project(_, child) => stripProjects(child)
      case _ => None
    }

  private def rewrite(a: Aggregate, l: LogicalRelation): LogicalPlan = {
    val rel = l.relation.asInstanceOf[HadoopFsRelation]
    // partitioned stores count too: the relative-path sidecar
    // (indexPartitioned) covers every file of every partition, and a
    // bare global count has no partition filter by the matched shape
    if (rel.location.isInstanceOf[PrunedFileIndex]) return a
    val roots = rel.location.rootPaths
    if (roots.length != 1 || roots.head.getName.endsWith(".parquet")) return a
    val dir = roots.head.toString
    graft.sinks.SkippingStore.metadataCount(spark, dir) match {
      case Some(n) =>
        LocalRelation(a.output,
          Seq(InternalRow.fromSeq(a.aggregateExpressions.map(_ => n))))
      case None => a
    }
  }
}
