package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}

/** Transparent zone-map file pruning as a Catalyst optimizer rule —
  * the piece that turns the [[graft.sinks.SkippingStore]] sidecar from
  * an explicit reader API into an ambient property of the session:
  * `spark.read.parquet(store).filter($"x" between (a, b))` opens only
  * the surviving files, with no graft-specific call site, exactly as
  * Delta's data-skipping integrates. Registered through
  * [[graft.GraftExtensions]] (`injectOptimizerRule`).
  *
  * Mechanics: a `Filter` directly over a V1 parquet `LogicalRelation`
  * whose root directory carries a `_zonemap_multi` sidecar has its
  * conjunctive range predicates (attr ⋈ literal, with the numeric-cast
  * shapes type coercion inserts) evaluated against the sidecar
  * driver-side; the relation's file index is replaced by an
  * [[InMemoryFileIndex]] over the surviving files only. The original
  * Filter stays on top as the exact residual, so the rewrite can only
  * ever REMOVE provably-empty files — correctness rides on the zone
  * intersection logic the SkippingStore specs pin down, plus its loud
  * stale-index coverage check.
  *
  * Idempotent under Catalyst's fixed-point batches: once pruned, the
  * recomputed survivor set equals the relation's current file list and
  * the plan returns unchanged. Defensive by construction: any
  * analysis failure (stale sidecar, foreign layout, unexpected plan
  * shape) falls back to the unpruned plan — the rule may only ever
  * make a query faster, never break it. DATE literals are skipped
  * (their internal days encoding does not match the sidecar's
  * epoch-micros widening); timestamp literals carry micros and prune.
  */
case class ZonePruneRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, l: LogicalRelation)
        if l.relation.isInstanceOf[HadoopFsRelation] =>
      try prune(f, cond, l) catch { case scala.util.control.NonFatal(_) => f }
  }

  /** Conjunctive (column, lo, hi) bounds from the filter condition;
    * one entry per comparison — survivor sets intersect across them. */
  private def ranges(cond: Expression): Seq[(String, Option[Any], Option[Any])] = {
    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => Some(a.name)
      case Cast(a: AttributeReference, _, _, _) => Some(a.name)
      case _ => None
    }
    def litVal(e: Expression): Option[Any] = e match {
      case Literal(v, DateType) => None // days encoding ≠ micros widening
      case Literal(v, StringType) => Option(v).map(_.toString)
      case Literal(v, TimestampType) => Option(v) // micros Long
      case Literal(v, TimestampNTZType) => Option(v)
      case Literal(v, _) => Option(v)
      case Cast(Literal(v, StringType), TimestampType, _, _) => None // not folded yet
      case _ => None
    }
    cond match {
      case And(a, b) => ranges(a) ++ ranges(b)
      case GreaterThanOrEqual(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, litVal(v), None))
      case GreaterThan(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, litVal(v), None))
      case LessThanOrEqual(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, None, litVal(v)))
      case LessThan(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, None, litVal(v)))
      case EqualTo(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, litVal(v), litVal(v)))
      // flipped literal-first forms
      case GreaterThanOrEqual(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, None, litVal(v)))
      case GreaterThan(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, None, litVal(v)))
      case LessThanOrEqual(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, litVal(v), None))
      case LessThan(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, litVal(v), None))
      case EqualTo(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
        Seq((attrName(a).get, litVal(v), litVal(v)))
      case _ => Seq.empty
    }
  }

  private def prune(f: Filter, cond: Expression, l: LogicalRelation): LogicalPlan = {
    val rel = l.relation.asInstanceOf[HadoopFsRelation]
    if (rel.partitionSchema.nonEmpty) return f
    val roots = rel.location.rootPaths
    if (roots.isEmpty) return f
    // full read: root IS the store dir; already-pruned read: roots are
    // the surviving data files and the store dir is their parent
    val dir =
      if (roots.length == 1 && !roots.head.getName.endsWith(".parquet"))
        roots.head.toString
      else roots.head.getParent.toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$dir/_zonemap_multi"))) return f
    val bounds = ranges(cond)
    if (bounds.isEmpty) return f
    val survivorSets = bounds.flatMap { case (c, lo, hi) =>
      graft.sinks.SkippingStore.pruneFileNames(spark, dir, c, lo, hi)
    }
    if (survivorSets.isEmpty) return f
    val survivors = survivorSets.map(_.toSet).reduce(_ intersect _)
    val current = rel.location.inputFiles
      .map(p => new Path(p).getName).toSet
    if (survivors == current) return f // fixed point
    val idx = new InMemoryFileIndex(spark,
      survivors.toSeq.sorted.map(n => new Path(s"$dir/$n")),
      Map.empty, Some(rel.dataSchema))
    Filter(cond, l.copy(relation = rel.copy(location = idx)(spark)))
  }
}
