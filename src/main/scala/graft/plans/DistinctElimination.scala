package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Deduplicate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** DISTINCT elimination over a declared-unique, null-free key — the
  * second constraint-driven rewrite ([[JoinEliminationRule]] is the
  * first): when a store column carries a currently-valid `unique`
  * declaration that recorded ZERO null keys, every row of the store is
  * pairwise distinct on ANY column set containing that key, so a
  * `DISTINCT` / `dropDuplicates` whose key set includes it is a no-op
  * and its whole shuffle disappears from the plan. Null-freedom is
  * load-bearing: SQL equality never matches NULL (uniqueness holds
  * regardless) but GROUPING treats null = null, so two null-keyed rows
  * WOULD collapse under DISTINCT — declarations with nulls, or made
  * before the null count was recorded, never eliminate.
  *
  * Matched shapes:
  *  - `Aggregate` where the aggregate list is exactly bare grouping
  *    attributes (the DISTINCT lowering — any real aggregate function
  *    disqualifies);
  *  - `Deduplicate` (the dropDuplicates lowering) over its keys.
  * In both, the child must strip through alias-only Projects to a
  * single-root, non-partitioned parquet store, and one key must
  * resolve to the declared column. Validity re-checks the stamped
  * file set per query, so an append since declaration falls back.
  * Kill-switched by `spark.graft.distinctelim.enabled`. */
case class DistinctEliminationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.distinctelim.enabled", "true").toBoolean)
      return plan
    plan.transform {
      case a @ Aggregate(groups, aggs, child, _)
          if groups.nonEmpty &&
            groups.forall(_.isInstanceOf[AttributeReference]) &&
            aggs.forall(distinctShaped(_, groups)) =>
        try {
          if (groups.exists(g => uniqueNonNullKey(
              g.asInstanceOf[AttributeReference], child)))
            Project(aggs.map(unwrapFirst), child)
          else a
        } catch { case scala.util.control.NonFatal(_) => a }
      case d @ Deduplicate(keys, child) =>
        try {
          if (keys.exists(k => uniqueNonNullKey(k, child))) child
          else d
        } catch { case scala.util.control.NonFatal(_) => d }
    }
  }

  /** A DISTINCT-like output column: a bare grouping attribute, or the
    * `first(col)` rider dropDuplicates lowers non-key columns to —
    * with single-row groups (what the unique key guarantees),
    * first(x) == x under either ignoreNulls flag. Anything else is a
    * real aggregation and disqualifies the rewrite. */
  private def distinctShaped(e: org.apache.spark.sql.catalyst.expressions.NamedExpression,
                             groups: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Boolean =
    e match {
      case ar: AttributeReference =>
        groups.exists { case g: AttributeReference => g.exprId == ar.exprId; case _ => false }
      case Alias(org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
        org.apache.spark.sql.catalyst.expressions.aggregate.First(_: AttributeReference, _),
        _, false, None, _), _) => true
      case _ => false
    }

  /** Rewrite `first(x)` to `x`, keeping the output attribute identity
    * (name, exprId, qualifier) so nothing upstream re-resolves. */
  private def unwrapFirst(e: org.apache.spark.sql.catalyst.expressions.NamedExpression)
      : org.apache.spark.sql.catalyst.expressions.NamedExpression = e match {
    case al @ Alias(org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression(
      org.apache.spark.sql.catalyst.expressions.aggregate.First(x: AttributeReference, _),
      _, false, None, _), name) =>
      Alias(x, name)(exprId = al.exprId, qualifier = al.qualifier,
        explicitMetadata = al.explicitMetadata)
    case other => other
  }

  /** Does `attr` resolve (alias-only Projects) to a store column with
    * a currently-valid unique + zero-nulls declaration? */
  private def uniqueNonNullKey(attr: Attribute, plan: LogicalPlan): Boolean = {
    def resolve(a: Attribute, p: LogicalPlan): Option[(LogicalRelation, String)] =
      p match {
        case l: LogicalRelation =>
          l.output.find(_.exprId == a.exprId).map(c => (l, c.name))
        case Project(projList, child) =>
          projList.find(_.exprId == a.exprId) match {
            case Some(x: AttributeReference) => resolve(x, child)
            case Some(Alias(x: AttributeReference, _)) => resolve(x, child)
            case _ => None
          }
        case _ => None
      }
    resolve(attr, plan).exists { case (l, colName) =>
      l.relation match {
        case rel: HadoopFsRelation if rel.partitionSchema.isEmpty =>
          val roots = rel.location.rootPaths
          roots.length == 1 && !roots.head.getName.endsWith(".parquet") &&
            graft.sinks.Constraints.verifiedUniqueNoNulls(
              spark, roots.head.toString, colName)
        case _ => false
      }
    }
  }
}
