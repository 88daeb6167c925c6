package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sinks.SkippingStore
import graft.sinks.SkippingStore.SidecarMinMax

/** Metadata-only `min`/`max`/`count(col)` (and mixed `count(*)`) over
  * a [[graft.sinks.SkippingStore]] multi sidecar — the companion of
  * [[MetadataCountRule]]: a global aggregate whose every expression is
  * a bare `min(col)`/`max(col)`/`count(col)` on a sidecar-indexed
  * column (or a bare `count(*)`) collapses to a [[LocalRelation]]
  * reduced from the per-file zone stats — `count(col)` skips nulls,
  * answered exactly as sum(nrows - nnulls) when the sidecar carries
  * the null-count stat (older sidecars fall back). Per-file (min, max) already ignore nulls, so
  * the file-level reduction IS the SQL aggregate; no data file opens.
  * Registered through [[graft.GraftExtensions]], kill-switched by
  * `spark.graft.metaminmax.enabled`. Pure-count aggregates stay with
  * [[MetadataCountRule]]; this rule requires at least one min/max.
  *
  * Every condition is correctness-bearing:
  *  - global aggregate (no grouping), no DISTINCT, no FILTER clause,
  *    no Filter below (a filter changes the extrema — it must scan,
  *    though [[ZonePruneRule]] still prunes that scan's files);
  *  - each min/max argument resolves through the intervening
  *    [[Project]]s (alias chains only — a COMPUTED projection bails)
  *    to a physical column of the relation;
  *  - the answer is only produced when the sidecar's widened-double
  *    slot provably round-trips the column's type exactly: int family
  *    and float/double always; long and timestamp-micros only when
  *    |value| < 2^53 (beyond that the double may have rounded); dates
  *    only when the epoch-micros stat sits on an exact day boundary
  *    (it always does under the engine's UTC sessions — a foreign
  *    sidecar written under another timezone falls back); NTZ only in
  *    a UTC session (where wall-clock micros equal unix micros and the
  *    writer's NTZ cast was the identity); strings via the exact
  *    lexicographic string slots. DECIMAL columns never answer from
  *    metadata (the double widening is lossy for them).
  * Any unanswerable piece falls back to the stock scan, so the rule
  * can only ever remove work, never change an answer. */
case class MetadataMinMaxRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.metaminmax.enabled", "true").toBoolean)
      return plan
    plan.transform {
      case a @ Aggregate(Seq(), aggs, child, _)
          if aggs.nonEmpty && aggs.exists(isMinMax) && aggs.forall(supported) =>
        stripProjects(child) match {
          case Some(l) =>
            try rewrite(a, l, child) catch {
              case scala.util.control.NonFatal(_) => a
            }
          case None => a
        }
    }
  }

  private def supported(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(fn, _, false, None, _), _) => fn match {
      case Count(Seq(Literal(_, _)))           => true
      case Count(Seq(_: AttributeReference))   => true
      case Min(_: AttributeReference)          => true
      case Max(_: AttributeReference)          => true
      case _                                   => false
    }
    // count(DISTINCT col): answerable only when the column is declared
    // unique (checked in rewrite) — then distinct non-null values ARE
    // the non-null rows and the nnulls stat answers it
    case Alias(AggregateExpression(
      Count(Seq(_: AttributeReference)), _, true, None, _), _) => true
    case _ => false
  }

  /** At least one aggregate only THIS rule answers — pure count(*)
    * plans stay with [[MetadataCountRule]]. */
  private def isMinMax(e: NamedExpression): Boolean = e match {
    case Alias(AggregateExpression(Min(_) | Max(_), _, _, _, _), _) => true
    case Alias(AggregateExpression(
      Count(Seq(_: AttributeReference)), _, _, _, _), _) => true
    case _ => false
  }

  private def stripProjects(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case l: LogicalRelation if l.relation.isInstanceOf[HadoopFsRelation] =>
        Some(l)
      case Project(_, child) => stripProjects(child)
      case _ => None
    }

  /** Follow `attr` down through alias-only Projects to the relation's
    * own attribute (None when any hop is a computed expression). */
  private def resolveColumn(attr: Attribute, plan: LogicalPlan): Option[Attribute] =
    plan match {
      case l: LogicalRelation => l.output.find(_.exprId == attr.exprId)
      case Project(projList, child) =>
        projList.find(_.exprId == attr.exprId) match {
          case Some(a: AttributeReference)       => resolveColumn(a, child)
          case Some(Alias(a: AttributeReference, _)) => resolveColumn(a, child)
          case _                                 => None
        }
      case _ => None
    }

  private val TwoTo53 = 9007199254740992.0 // 2^53: double-exact integer bound

  private def utcSession: Boolean =
    spark.sessionState.conf.sessionLocalTimeZone == "UTC"

  /** The Catalyst-internal value for one min/max, or None when the
    * sidecar stat cannot provably round-trip the column type. */
  private def internalValue(dt: DataType, st: SidecarMinMax,
                            isMin: Boolean): Option[Any] = dt match {
    case StringType =>
      Some((if (isMin) st.zminStr else st.zmaxStr)
        .map(UTF8String.fromString).orNull)
    case _ =>
      (if (isMin) st.zmin else st.zmax) match {
        case None => dt match { // column entirely null -> SQL null
          case ByteType | ShortType | IntegerType | LongType |
               FloatType | DoubleType | DateType | TimestampType => Some(null)
          case TimestampNTZType if utcSession => Some(null)
          case _ => None
        }
        case Some(v) => dt match {
          case DoubleType  => Some(v)
          case FloatType   => Some(v.toFloat)
          case IntegerType => Some(v.toInt)
          case ShortType   => Some(v.toShort)
          case ByteType    => Some(v.toByte)
          case LongType if math.abs(v) < TwoTo53      => Some(v.toLong)
          case TimestampType if math.abs(v) < TwoTo53 => Some(v.toLong)
          // NTZ wall-clock micros equal unix micros ONLY under UTC —
          // the engine pins every session to UTC (GraftSession), and
          // the sidecar writer's NTZ->timestamp cast is the identity
          // there, so the round trip is exact; any other session
          // timezone falls back to the scan
          case TimestampNTZType
              if utcSession && math.abs(v) < TwoTo53 => Some(v.toLong)
          case DateType if math.abs(v) < TwoTo53 &&
              v.toLong % 86400000000L == 0 =>
            Some((v.toLong / 86400000000L).toInt) // epoch micros -> days
          case _ => None
        }
      }
  }

  private def rewrite(a: Aggregate, l: LogicalRelation,
                      child: LogicalPlan): LogicalPlan = {
    val rel = l.relation.asInstanceOf[HadoopFsRelation]
    // partitioned stores answer too — a partition COLUMN is absent
    // from the sidecar (statFor -> None) and falls back to the scan,
    // while data columns and bare count(*) resolve from the
    // relative-path sidecar exactly as on a flat store
    if (rel.location.isInstanceOf[PrunedFileIndex]) return a
    val roots = rel.location.rootPaths
    if (roots.length != 1 || roots.head.getName.endsWith(".parquet")) return a
    val dir = roots.head.toString
    val stats = scala.collection.mutable.Map.empty[String, Option[SidecarMinMax]]
    def statFor(c: String): Option[SidecarMinMax] =
      stats.getOrElseUpdate(c, SkippingStore.metadataMinMax(spark, dir, c))
    val values = a.aggregateExpressions.map {
      case Alias(AggregateExpression(fn, _, isDistinct, _, _), _) => fn match {
        case Count(Seq(attr: AttributeReference)) =>
          // count(col) skips nulls; count(DISTINCT col) additionally
          // needs a currently-valid unique declaration — then distinct
          // non-null values are exactly the non-null rows
          val c = resolveColumn(attr, child).getOrElse(return a)
          if (isDistinct &&
              !graft.sinks.Constraints.verifiedUnique(spark, dir, c.name))
            return a
          SkippingStore.metadataNonNullCount(spark, dir, c.name)
            .getOrElse(return a)
        case Count(_) =>
          SkippingStore.metadataCount(spark, dir).getOrElse(return a)
        case Min(attr: AttributeReference) =>
          val c = resolveColumn(attr, child).getOrElse(return a)
          internalValue(c.dataType, statFor(c.name).getOrElse(return a),
            isMin = true).getOrElse(return a)
        case Max(attr: AttributeReference) =>
          val c = resolveColumn(attr, child).getOrElse(return a)
          internalValue(c.dataType, statFor(c.name).getOrElse(return a),
            isMin = false).getOrElse(return a)
        case _ => return a
      }
      case _ => return a
    }
    LocalRelation(a.output, Seq(InternalRow.fromSeq(values)))
  }
}
