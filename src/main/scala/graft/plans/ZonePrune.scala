package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{DateType, StringType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Transparent sidecar-driven file pruning as a Catalyst optimizer
  * rule — the piece that turns the [[graft.sinks.SkippingStore]]
  * sidecars from an explicit reader API into an ambient property of
  * the session: `spark.read.parquet(store).filter(...)` opens only the
  * surviving files, with no graft-specific call site, exactly as
  * Delta's data-skipping integrates. Registered through
  * [[graft.GraftExtensions]] (`injectOptimizerRule`).
  *
  * Mechanics: a `Filter` directly over a V1 parquet `LogicalRelation`
  * whose root directory carries a `_zonemap_multi` and/or `_bloommap`
  * sidecar has its conjunctive predicates evaluated against the
  * sidecars driver-side; the relation's file index is replaced by an
  * [[InMemoryFileIndex]] over the surviving files only. Three
  * predicate families prune:
  *  - range comparisons (attr ⋈ literal, either side, with the
  *    numeric-cast shapes type coercion inserts) → zone intersection;
  *  - equality → zone ∩ Bloom (the Bloom side covers hash-scattered
  *    columns zones can't, and only engages when the sidecar's
  *    `keycol` marker proves it indexes that column);
  *  - IN-lists (`In` and the set-converted `InSet`) → the union of the
  *    per-value equality survivor sets;
  *  - startsWith(ASCII prefix) → the string range [prefix, nextPrefix);
  *  - IS NULL / IS NOT NULL → the sidecar's per-file null counts
  *    (files with nnulls = 0 die for IS NULL; all-null files die for
  *    IS NOT NULL — including the implicit isnotnull conjunct Spark
  *    adds beside every comparison);
  *  - arbitrary AND/OR trees over the above: AND intersects (opaque
  *    conjuncts are neutral), OR unions (every disjunct must be
  *    judgeable, or the whole OR is unprunable).
  * The original Filter stays on top as the exact residual, so the
  * rewrite can only ever REMOVE provably-empty files — correctness
  * rides on the zone-intersection and no-false-negative properties the
  * SkippingStore specs pin down, plus its loud stale-index coverage
  * check.
  *
  * Idempotent under Catalyst's fixed-point batches: once pruned, the
  * recomputed survivor set equals the relation's current file list and
  * the plan returns unchanged. Defensive by construction: any
  * analysis failure (stale sidecar, foreign layout, unexpected plan
  * shape) falls back to the unpruned plan — the rule may only ever
  * make a query faster, never break it. DATE literals translate
  * days→session-tz-midnight micros (the exact widening the sidecar
  * writer recorded) and prune zones; timestamp literals carry micros
  * and prune zones too. Neither ever Bloom-probes — the cast would
  * reread the micros as seconds.
  */
case class ZonePruneRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // operational kill-switch (the Delta data-skipping flag shape):
    // spark.graft.zoneprune.enabled=false restores stock planning
    if (!spark.conf.get("spark.graft.zoneprune.enabled", "true").toBoolean)
      return plan
    plan.transform {
      case f @ Filter(cond, l: LogicalRelation)
          if l.relation.isInstanceOf[HadoopFsRelation] =>
        try prune(f, cond, l) catch { case scala.util.control.NonFatal(_) => f }
    }
  }

  /** Per-value survivor computation runs driver-side sidecar jobs —
    * bound the IN-list size so planning stays O(small), the same
    * reasoning as Spark's own optimizer IN thresholds. */
  private val MaxInValues = 32

  private sealed trait Pred
  private case class RangeP(col: String, lo: Option[Any], hi: Option[Any]) extends Pred
  /** `bare` = the attribute appeared WITHOUT a coercion cast. Only
    * bare equalities may consult the Bloom sidecar: when type coercion
    * wrapped the column (`CAST(strcol AS DOUBLE) = 123.0`), the
    * comparison happens in the coerced domain, but the index hashed
    * the RAW column values — probing it with the literal would prune
    * files that DO satisfy the cast-equality ("123" = 123.0). Zones
    * stay safe either way: pruneFileNames type-guards the slot. */
  private case class EqP(col: String, value: Any, bare: Boolean) extends Pred
  private case class InP(col: String, values: Seq[Any], bare: Boolean) extends Pred
  private case class NullP(col: String, wantNull: Boolean) extends Pred

  private def attrName(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, _, _, _) => Some(a.name)
    case _ => None
  }

  private def isBareAttr(e: Expression): Boolean =
    e.isInstanceOf[AttributeReference]

  /** A DATE literal's internal Int-days encoding, translated to the
    * epoch micros the sidecar recorded — the writer widens date
    * columns as `unix_micros(cast(c AS TIMESTAMP))`, i.e. session-tz
    * midnight, so the literal must cross the SAME days→micros boundary
    * (`DateTimeUtils.daysToMicros` is exactly what Cast uses). All
    * widened date values are midnights, so range/equality tests on the
    * translated literal are exact, never lossy. */
  private def dateDaysToMicros(days: Int): Long =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.daysToMicros(days,
      org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
        spark.sessionState.conf.sessionLocalTimeZone))

  private def litVal(e: Expression): Option[Any] = e match {
    case Literal(v, DateType) =>
      Option(v).map(d => java.lang.Long.valueOf(
        dateDaysToMicros(d.asInstanceOf[Int])))
    case Literal(v, StringType) => Option(v).map(_.toString)
    case Literal(v, TimestampType) => Option(v) // micros Long
    case Literal(v, TimestampNTZType) => Option(v)
    case Literal(v, _) => Option(v)
    case _ => None
  }

  /** The files that might satisfy `cond`, evaluated over the boolean
    * structure: AND intersects (a side the sidecars can't judge is
    * simply neutral), OR unions (BOTH sides must be judgeable — one
    * opaque disjunct could match anywhere). None = cannot prune. */
  private def fileSet(dir: String, cond: Expression,
                      skipNotNull: Set[String]): Option[Set[String]] =
    cond match {
      case And(a, b) =>
        (fileSet(dir, a, skipNotNull), fileSet(dir, b, skipNotNull)) match {
          case (Some(x), Some(y)) => Some(x intersect y)
          case (x, y) => x.orElse(y)
        }
      case org.apache.spark.sql.catalyst.expressions.Or(a, b) =>
        for (x <- fileSet(dir, a, skipNotNull);
             y <- fileSet(dir, b, skipNotNull)) yield x union y
      case leaf =>
        val ps = preds(leaf)
        val sets = ps.flatMap(p => survivors(dir, p, skipNotNull))
        if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }

  /** Columns some comparison/IN/prefix predicate touches anywhere in
    * the condition: their `IS NOT NULL` conjuncts are REDUNDANT for
    * pruning (all-null files already fail every zone test, since null
    * stats fail the range predicate), and Spark plants one implicit
    * isnotnull beside every comparison — evaluating it would add a
    * pure-cost sidecar pass to virtually every store filter (the
    * bench caught +38% on q194). Skipping only loses pruning power on
    * shapes the ranges already covered, never correctness. */
  private def comparisonCols(cond: Expression): Set[String] = cond match {
    case And(a, b) => comparisonCols(a) ++ comparisonCols(b)
    case org.apache.spark.sql.catalyst.expressions.Or(a, b) =>
      comparisonCols(a) ++ comparisonCols(b)
    case leaf => preds(leaf).collect {
      case RangeP(c, _, _) => c
      case EqP(c, _, _) => c
      case InP(c, _, _) => c
    }.toSet
  }

  /** Conjunctive prunable predicates; survivor sets intersect across
    * them. */
  private def preds(cond: Expression): Seq[Pred] = cond match {
    case And(a, b) => preds(a) ++ preds(b)
    case EqualTo(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(EqP(attrName(a).get, litVal(v).get, isBareAttr(a)))
    case EqualTo(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(EqP(attrName(a).get, litVal(v).get, isBareAttr(a)))
    case In(a, list) if attrName(a).isDefined &&
        list.nonEmpty && list.length <= MaxInValues =>
      val vals = list.map(litVal)
      if (vals.forall(_.isDefined))
        Seq(InP(attrName(a).get, vals.flatten, isBareAttr(a)))
      else Seq.empty
    case InSet(a, hset) if attrName(a).isDefined &&
        hset.nonEmpty && hset.size <= MaxInValues =>
      val isDate = a.dataType.isInstanceOf[DateType]
      val vals = hset.toSeq.map {
        case s: UTF8String => s.toString
        case d: java.lang.Integer if isDate => // Int-days → epoch micros
          java.lang.Long.valueOf(dateDaysToMicros(d.intValue()))
        case v => v
      }
      if (vals.forall(_ != null))
        Seq(InP(attrName(a).get, vals, isBareAttr(a)))
      else Seq.empty
    // prefix match as a string range: p <= s < nextPrefix(p), the
    // Delta startsWith translation. The upper bound increments the
    // last char (an all-￿ prefix gets no upper bound); the zone
    // test is inclusive, which can only keep one marginal extra file.
    case StartsWith(a, Literal(p, StringType))
        if attrName(a).isDefined && p != null =>
      val prefix = p.toString
      // ASCII prefixes only: beyond ASCII, the incremented UTF-16
      // bound can disagree with UTF8String's binary order (surrogates,
      // multi-byte edges). URLs, hashes, hosts — the columns this
      // exists for — are ASCII; anything else simply doesn't prune.
      if (prefix.isEmpty || prefix.exists(_ > '~')) Seq.empty
      else {
        val i = prefix.length - 1
        val hi = prefix.substring(0, i) + (prefix.charAt(i) + 1).toChar
        Seq(RangeP(attrName(a).get, Some(prefix), Some(hi)))
      }
    // IS NULL must see the BARE column: IsNull(Cast(a)) also matches
    // rows where the cast fails on non-null input, which a zero-nnulls
    // file can still hold. IsNotNull(Cast(a)) ⊆ IsNotNull(a), so the
    // cast shape stays prunable there.
    case IsNull(a: AttributeReference) =>
      Seq(NullP(a.name, wantNull = true))
    case IsNotNull(a) if attrName(a).isDefined =>
      Seq(NullP(attrName(a).get, wantNull = false))
    case GreaterThanOrEqual(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, litVal(v), None))
    case GreaterThan(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, litVal(v), None))
    case LessThanOrEqual(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, None, litVal(v)))
    case LessThan(a, v) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, None, litVal(v)))
    // flipped literal-first forms
    case GreaterThanOrEqual(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, None, litVal(v)))
    case GreaterThan(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, None, litVal(v)))
    case LessThanOrEqual(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, litVal(v), None))
    case LessThan(v, a) if attrName(a).isDefined && litVal(v).isDefined =>
      Seq(RangeP(attrName(a).get, litVal(v), None))
    case _ => Seq.empty
  }

  /** The files that might satisfy `p`, or None when the sidecars can't
    * say. Equality intersects zone and Bloom evidence when both
    * exist; an IN-list can only prune when EVERY value is prunable
    * (one unprunable value could live anywhere). */
  private def survivors(dir: String, p: Pred,
                        skipNotNull: Set[String]): Option[Set[String]] = p match {
    case RangeP(c, lo, hi) =>
      graft.sinks.SkippingStore.pruneFileNames(spark, dir, c, lo, hi).map(_.toSet)
    case EqP(c, v, bare) =>
      val z = graft.sinks.SkippingStore
        .pruneFileNames(spark, dir, c, Some(v), Some(v)).map(_.toSet)
      // cast-wrapped attrs never touch the Bloom index: the index
      // hashed raw column values, the equality lives in the coerced
      // domain — a probe there invents false negatives (see EqP doc)
      val b = if (bare) graft.sinks.SkippingStore
        .bloomFileNames(spark, dir, c, v).map(_.toSet) else None
      (z, b) match {
        case (Some(x), Some(y)) => Some(x intersect y)
        case (x, y) => x.orElse(y)
      }
    case InP(c, vs, bare) =>
      val sets = vs.map(v => survivors(dir, EqP(c, v, bare), skipNotNull))
      if (sets.exists(_.isEmpty)) None
      else Some(sets.flatten.foldLeft(Set.empty[String])(_ union _))
    case NullP(c, false) if skipNotNull(c) =>
      None // redundant beside a comparison on the same column
    case NullP(c, wantNull) =>
      graft.sinks.SkippingStore
        .nullFileNames(spark, dir, c, wantNull).map(_.toSet)
  }

  private def prune(f: Filter, cond: Expression, l: LogicalRelation): LogicalPlan = {
    val rel = l.relation.asInstanceOf[HadoopFsRelation]
    if (rel.partitionSchema.nonEmpty) return f
    val roots = rel.location.rootPaths
    if (roots.isEmpty) return f
    // only DIRECTORY-rooted reads prune. File-list roots are already a
    // curated subset — this rule's own previous output, or an explicit
    // SkippingStore reader's — and re-deriving their survivor set
    // would re-run the driver-side sidecar jobs on EVERY optimizer
    // pass (measured: +2-3 s per store query in the bench). Skipping
    // them IS the fixed point, for free.
    if (roots.length != 1 || roots.head.getName.endsWith(".parquet")) return f
    val dir = roots.head.toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$dir/_zonemap_multi")) &&
      !fs.exists(new Path(s"$dir/_bloommap"))) return f
    val surviving = fileSet(dir, cond, comparisonCols(cond)) match {
      case Some(s) => s
      case None => return f
    }
    val current = rel.location.inputFiles
      .map(p => new Path(p).getName).toSet
    if (surviving == current) return f // no file provably empty
    val idx = new InMemoryFileIndex(spark,
      surviving.toSeq.sorted.map(n => new Path(s"$dir/$n")),
      Map.empty, Some(rel.dataSchema))
    Filter(cond, l.copy(relation = rel.copy(location = idx)(spark)))
  }
}
