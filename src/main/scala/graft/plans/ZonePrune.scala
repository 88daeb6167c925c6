package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, IsNotNull, IsNull, LessThan, LessThanOrEqual, Literal, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.{DataType, DateType, StringType, TimestampNTZType, TimestampType}
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
  * [[InMemoryFileIndex]] over the surviving files only. The
  * `_zonemap_multi` sidecar is loaded ONCE per relation per optimizer
  * pass ([[graft.sinks.SkippingStore.loadMultiSidecar]]) and every
  * predicate evaluates against the in-memory stats — the
  * per-predicate sidecar re-read this replaced cost a driver-side
  * Spark job per conjunct (the r8 q194 planning-cost regression).
  * Bloom probes stay distributive (a bitset row is 16 KiB × files —
  * never collected). Predicate families that prune:
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
  * Datetime discipline (the silent-wrong-prune minefield):
  *  - A bare DATE column prunes against DATE literals translated
  *    days→session-tz-midnight micros (the exact widening the writer
  *    recorded) — but ONLY when the sidecar's stamped writer time
  *    zone equals the read session's: the widening is zone-dependent,
  *    and a zone delta would shift every boundary file into the void.
  *    Unstamped (pre-tz) or mixed-zone sidecars never date-prune.
  *  - `CAST(tsCol AS DATE) ⋈ DATE'd'` compares whole DAYS of a raw
  *    timestamp column, so the literal widens to the day's closed
  *    micros interval [midnight(d), midnight(d+1)-1] — a point
  *    translation would prune files whose timestamps sit INSIDE the
  *    literal's day. The boundaries use the READ session's zone,
  *    which is exactly what the runtime cast uses, and the stored
  *    timestamp stats are zone-independent — no stamp needed.
  *  - TIMESTAMP literals carry micros and prune timestamp columns
  *    directly (zone-independent both sides).
  *  - TIMESTAMP_NTZ columns never prune transparently: their stats
  *    were shifted by the writer's zone while the column's own values
  *    are wall-clock — the comparison is unsound even same-zone
  *    unless that zone is UTC, so the rule opts out entirely.
  *  - Neither dates nor timestamps ever Bloom-probe — the cast would
  *    reread the micros as seconds.
  *
  * Idempotent under Catalyst's fixed-point batches: once pruned, the
  * recomputed survivor set equals the relation's current file list and
  * the plan returns unchanged. Defensive by construction: any
  * analysis failure (stale sidecar, foreign layout, unexpected plan
  * shape) falls back to the unpruned plan — the rule may only ever
  * make a query faster, never break it.
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

  /** Per-value survivor computation is driver-side — bound the IN-list
    * size so planning stays O(small), the same reasoning as Spark's
    * own optimizer IN thresholds. */
  private val MaxInValues = 32

  /** Everything one optimizer pass needs about a store, resolved ONCE
    * per relation: the in-memory zone sidecar, whether a bloom sidecar
    * exists, and whether the writer's stamped time zone matches this
    * session's (the date-translation soundness gate). */
  private case class Ctx(dir: String,
                         sidecar: Option[graft.sinks.SkippingStore.MultiSidecar],
                         bloom: Option[graft.sinks.SkippingStore.BloomCtx],
                         tzOk: Boolean)

  private sealed trait Pred
  private case class RangeP(col: String, lo: Option[Any], hi: Option[Any]) extends Pred
  /** `bare` = the attribute appeared WITHOUT a coercion cast. Only
    * bare equalities may consult the Bloom sidecar: when type coercion
    * wrapped the column (`CAST(strcol AS DOUBLE) = 123.0`), the
    * comparison happens in the coerced domain, but the index hashed
    * the RAW column values — probing it with the literal would prune
    * files that DO satisfy the cast-equality ("123" = 123.0). Zones
    * stay safe either way: the survivor lookup type-guards the slot. */
  private case class EqP(col: String, value: Any, bare: Boolean) extends Pred
  private case class InP(col: String, values: Seq[Any], bare: Boolean) extends Pred
  private case class NullP(col: String, wantNull: Boolean) extends Pred

  /** The underlying attribute of a (possibly coercion-cast) comparison
    * side, plus whether it appeared bare. */
  private def aside(e: Expression): Option[(AttributeReference, Boolean)] =
    e match {
      case a: AttributeReference => Some((a, true))
      case Cast(a: AttributeReference, _, _, _) => Some((a, false))
      case _ => None
    }

  private def attrName(e: Expression): Option[String] = aside(e).map(_._1.name)

  /** A DATE literal's internal Int-days encoding, translated to epoch
    * micros at this session's zone (`DateTimeUtils.daysToMicros` is
    * exactly what Cast uses). For a bare DATE column this reproduces
    * the sidecar's widening (gated on the writer-zone stamp); for a
    * `CAST(ts AS DATE)` shape it is the day's lower boundary under the
    * runtime cast's own semantics. */
  private def dateDaysToMicros(days: Int): Long =
    org.apache.spark.sql.catalyst.util.DateTimeUtils.daysToMicros(days,
      org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
        spark.sessionState.conf.sessionLocalTimeZone))

  /** Point-exact literal translation for a comparison against a column
    * whose UNDERLYING type is `under` (casts stripped) — None where no
    * sound point translation exists (then nothing is emitted and the
    * shape simply doesn't prune). The `CAST(ts AS DATE)` day-interval
    * widening is handled by [[cmp]] before this is consulted. */
  private def simpleVal(under: DataType, v: Any, vt: DataType,
                        tzOk: Boolean): Option[Any] =
    if (v == null) None
    else (under, vt) match {
      // bare-ish DATE column: stored stats are writer-zone midnights;
      // the translated literal is a read-zone midnight — sound only
      // when the stamp proves the zones equal
      case (DateType, DateType) if tzOk =>
        Some(java.lang.Long.valueOf(dateDaysToMicros(v.asInstanceOf[Int])))
      // CAST(date AS TIMESTAMP) ⋈ ts-literal: runtime cast values ARE
      // the stored stats when zones match; literal micros compare raw
      case (DateType, TimestampType) if tzOk => Some(v)
      case (TimestampType, TimestampType) => Some(v) // micros, zone-free
      // every other datetime-involved combination is unsound (NTZ
      // wall-clock vs shifted stats; seconds-vs-micros long casts;
      // string-domain casts of datetimes) — emit nothing
      case (DateType, _) | (TimestampType, _) | (TimestampNTZType, _) => None
      case (_, DateType) | (_, TimestampType) | (_, TimestampNTZType) => None
      case (_, StringType) => Some(v.toString)
      case _ => Some(v)
    }

  private sealed trait Op
  private case object OpEq extends Op
  private case object OpGe extends Op
  private case object OpGt extends Op
  private case object OpLe extends Op
  private case object OpLt extends Op

  /** Predicates for `attrExpr OP literalExpr` (attr-side orientation —
    * flipped comparisons are normalized by the caller). */
  private def cmp(aE: Expression, vE: Expression, op: Op,
                  tzOk: Boolean): Seq[Pred] = {
    val (attr, bare) = aside(aE) match {
      case Some(s) => s
      case None => return Seq.empty
    }
    val (raw, vt) = vE match {
      case Literal(x, t) => (x, t)
      case _ => return Seq.empty
    }
    if (raw == null) return Seq.empty
    (attr.dataType, vt) match {
      case (TimestampType, DateType) =>
        // CAST(ts AS DATE) ⋈ DATE'd': the predicate constrains whole
        // DAYS of the raw micros column — widen to the day interval
        // [midnight(d), midnight(d+1)-1] at the READ zone (what the
        // runtime cast uses; stored ts stats are zone-independent)
        val d = raw.asInstanceOf[Int]
        def m(x: Int): Long = dateDaysToMicros(x)
        val preds = op match {
          case OpEq => RangeP(attr.name, Some(m(d)), Some(m(d + 1) - 1L))
          case OpGe => RangeP(attr.name, Some(m(d)), None)
          case OpGt => RangeP(attr.name, Some(m(d + 1)), None)
          case OpLe => RangeP(attr.name, None, Some(m(d + 1) - 1L))
          case OpLt => RangeP(attr.name, None, Some(m(d) - 1L))
        }
        Seq(preds)
      case _ =>
        simpleVal(attr.dataType, raw, vt, tzOk) match {
          case None => Seq.empty
          case Some(v) => op match {
            case OpEq => Seq(EqP(attr.name, v, bare))
            // the zone test is inclusive, so strict bounds reuse the
            // non-strict survivor set (at most one marginal extra file)
            case OpGe | OpGt => Seq(RangeP(attr.name, Some(v), None))
            case OpLe | OpLt => Seq(RangeP(attr.name, None, Some(v)))
          }
        }
    }
  }

  /** IN-list predicates. On a `CAST(ts AS DATE)` attribute the
    * per-value point sets are unsound (same widening argument as
    * equality), so the list collapses to its contiguous day-interval
    * HULL — a correct over-approximation. */
  private def inPred(aE: Expression, vals: Seq[(Any, DataType)],
                     tzOk: Boolean): Seq[Pred] = {
    val (attr, bare) = aside(aE) match {
      case Some(s) => s
      case None => return Seq.empty
    }
    if (vals.exists(_._1 == null)) return Seq.empty
    (attr.dataType, aE.dataType) match {
      case (TimestampType, DateType) =>
        val ds = vals.map(_._1).collect { case i: java.lang.Integer => i.intValue }
        if (ds.size != vals.size) Seq.empty
        else Seq(RangeP(attr.name,
          Some(dateDaysToMicros(ds.min)),
          Some(dateDaysToMicros(ds.max + 1) - 1L)))
      case _ =>
        val vs = vals.map { case (v, t) =>
          simpleVal(attr.dataType,
            v match { case s: UTF8String => s.toString; case x => x }, t, tzOk)
        }
        if (vs.exists(_.isEmpty)) Seq.empty
        else Seq(InP(attr.name, vs.flatten, bare))
    }
  }

  /** Columns some comparison/IN/prefix predicate touches anywhere in
    * the condition: their `IS NOT NULL` conjuncts are REDUNDANT for
    * pruning (all-null files already fail every zone test, since null
    * stats fail the range predicate), and Spark plants one implicit
    * isnotnull beside every comparison — evaluating it would add a
    * pure-cost sidecar pass to virtually every store filter (the
    * bench caught +38% on q194). Skipping only loses pruning power on
    * shapes the ranges already covered, never correctness. */
  private def comparisonCols(cond: Expression, tzOk: Boolean): Set[String] =
    cond match {
      case And(a, b) => comparisonCols(a, tzOk) ++ comparisonCols(b, tzOk)
      case org.apache.spark.sql.catalyst.expressions.Or(a, b) =>
        comparisonCols(a, tzOk) ++ comparisonCols(b, tzOk)
      case leaf => preds(leaf, tzOk).collect {
        case RangeP(c, _, _) => c
        case EqP(c, _, _) => c
        case InP(c, _, _) => c
      }.toSet
    }

  /** Conjunctive prunable predicates; survivor sets intersect across
    * them. */
  private def preds(cond: Expression, tzOk: Boolean): Seq[Pred] = cond match {
    case And(a, b) => preds(a, tzOk) ++ preds(b, tzOk)
    case EqualTo(a, v: Literal) if aside(a).isDefined => cmp(a, v, OpEq, tzOk)
    case EqualTo(v: Literal, a) if aside(a).isDefined => cmp(a, v, OpEq, tzOk)
    case In(a, list) if aside(a).isDefined &&
        list.nonEmpty && list.length <= MaxInValues &&
        list.forall(_.isInstanceOf[Literal]) =>
      inPred(a, list.map { case Literal(v, t) => (v, t) }, tzOk)
    case InSet(a, hset) if aside(a).isDefined &&
        hset.nonEmpty && hset.size <= MaxInValues =>
      // set elements carry the EXPRESSION's type (the cast target for
      // a coercion-cast attribute — the InSet hole of ADVICE r8)
      inPred(a, hset.toSeq.map(v => (v, a.dataType)), tzOk)
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
    case GreaterThanOrEqual(a, v: Literal) if aside(a).isDefined =>
      cmp(a, v, OpGe, tzOk)
    case GreaterThan(a, v: Literal) if aside(a).isDefined =>
      cmp(a, v, OpGt, tzOk)
    case LessThanOrEqual(a, v: Literal) if aside(a).isDefined =>
      cmp(a, v, OpLe, tzOk)
    case LessThan(a, v: Literal) if aside(a).isDefined =>
      cmp(a, v, OpLt, tzOk)
    // flipped literal-first forms normalize to attr-side orientation
    case GreaterThanOrEqual(v: Literal, a) if aside(a).isDefined =>
      cmp(a, v, OpLe, tzOk)
    case GreaterThan(v: Literal, a) if aside(a).isDefined =>
      cmp(a, v, OpLt, tzOk)
    case LessThanOrEqual(v: Literal, a) if aside(a).isDefined =>
      cmp(a, v, OpGe, tzOk)
    case LessThan(v: Literal, a) if aside(a).isDefined =>
      cmp(a, v, OpGt, tzOk)
    case _ => Seq.empty
  }

  /** The files that might satisfy `cond`, evaluated over the boolean
    * structure: AND intersects (a side the sidecars can't judge is
    * simply neutral), OR unions (BOTH sides must be judgeable — one
    * opaque disjunct could match anywhere). None = cannot prune. */
  private def fileSet(ctx: Ctx, cond: Expression,
                      skipNotNull: Set[String]): Option[Set[String]] =
    cond match {
      case And(a, b) =>
        (fileSet(ctx, a, skipNotNull), fileSet(ctx, b, skipNotNull)) match {
          case (Some(x), Some(y)) => Some(x intersect y)
          case (x, y) => x.orElse(y)
        }
      case org.apache.spark.sql.catalyst.expressions.Or(a, b) =>
        for (x <- fileSet(ctx, a, skipNotNull);
             y <- fileSet(ctx, b, skipNotNull)) yield x union y
      case leaf =>
        val ps = preds(leaf, ctx.tzOk)
        val sets = ps.flatMap(p => survivors(ctx, p, skipNotNull))
        if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
    }

  // ------------------------------------------------------------------
  // Distributed evaluation — the same predicate algebra as fileSet/
  // survivors, but expressed as per-file boolean aggregates over the
  // sidecar FRAME, for stores whose file count exceeds
  // spark.graft.zoneprune.maxDriverFiles. The columns-sized
  // SidecarMeta makes every "can this predicate prune?" decision
  // up front (slot family, dup corruption, null-stat completeness,
  // tz gate) — those decisions never depend on per-file data — and
  // ONE aggregation job evaluates the boolean structure; only the
  // surviving file names reach the driver. Spark's own double
  // comparison semantics (NaN greatest, -0.0 == 0.0) and binary
  // string order make the cluster-side tests agree exactly with
  // cmpD/cmpS below; the equivalence is pinned by
  // ZonePruneDistributedSpec, which runs both paths over the same
  // stores and predicates.

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{coalesce, col => fcol, lit => flit, max => fmax, when => fwhen}

  /** Registers one per-file boolean aggregate per leaf test and hands
    * back the post-aggregation column that reads it. */
  private class AggReg {
    val aggs = scala.collection.mutable.ArrayBuffer.empty[Column]
    def flag(rowTest: Column, onCol: String): Column = {
      val id = s"_zp${aggs.size}"
      aggs += fmax(fwhen(fcol("col") === flit(onCol),
        coalesce(rowTest, flit(false))).otherwise(flit(false))).as(id)
      fcol(id)
    }
  }

  /** [[zoneSurvivors]]'s per-file test as a row expression — same
    * guards (unindexed column, duplicate stats, slot/bound type
    * mismatch → None), same null behavior (a null stat fails the
    * bound via the coalesce in [[AggReg.flag]]). */
  private def distZoneTest(meta: graft.sinks.SkippingStore.SidecarMeta,
                           reg: AggReg, c: String,
                           lo: Option[Any], hi: Option[Any]): Option[Column] = {
    val cm = meta.cols.getOrElse(c, return None)
    if (cm.dupFiles) return None
    if (cm.anyStr) {
      if (lo.exists(!_.isInstanceOf[String]) ||
          hi.exists(!_.isInstanceOf[String])) return None
      val tests = lo.map(v => fcol("zmax_str") >= flit(v.toString)).toSeq ++
        hi.map(v => fcol("zmin_str") <= flit(v.toString)).toSeq
      Some(reg.flag(tests.reduceOption(_ && _).getOrElse(flit(true)), c))
    } else {
      def num(v: Any): Option[Double] = v match {
        case n: Number => Some(n.doubleValue)
        case _ => None
      }
      val loD = lo.map(num); val hiD = hi.map(num)
      if (loD.exists(_.isEmpty) || hiD.exists(_.isEmpty)) return None
      val tests = loD.flatten.map(v => fcol("zmax") >= flit(v)).toSeq ++
        hiD.flatten.map(v => fcol("zmin") <= flit(v)).toSeq
      Some(reg.flag(tests.reduceOption(_ && _).getOrElse(flit(true)), c))
    }
  }

  /** [[nullSurvivors]] as a row expression, same guards. */
  private def distNullTest(meta: graft.sinks.SkippingStore.SidecarMeta,
                           reg: AggReg, c: String,
                           wantNull: Boolean): Option[Column] = {
    if (!meta.hasNullStats) return None
    val cm = meta.cols.getOrElse(c, return None)
    if (cm.dupFiles || !cm.nullStatsComplete) return None
    val t = if (wantNull) fcol("nnulls") > flit(0L)
            else fcol("nnulls") < fcol("nrows")
    Some(reg.flag(t, c))
  }

  /** [[survivors]] mirrored: equality is zone-only (the bloom sidecar
    * is driver-file-count-sized and stays off in distributed mode —
    * a superset survivor set, never a wrong one). */
  private def distPred(meta: graft.sinks.SkippingStore.SidecarMeta,
                       reg: AggReg, p: Pred,
                       skipNotNull: Set[String]): Option[Column] = p match {
    case RangeP(c, lo, hi) => distZoneTest(meta, reg, c, lo, hi)
    case EqP(c, v, _) => distZoneTest(meta, reg, c, Some(v), Some(v))
    case InP(c, vs, bare) =>
      val ts = vs.map(v => distPred(meta, reg, EqP(c, v, bare), skipNotNull))
      if (ts.exists(_.isEmpty)) None else Some(ts.flatten.reduce(_ || _))
    case NullP(c, false) if skipNotNull(c) => None
    case NullP(c, wantNull) => distNullTest(meta, reg, c, wantNull)
  }

  /** [[fileSet]] mirrored over boolean columns: AND neutral on an
    * unjudgeable side, OR requires both. */
  private def distBool(meta: graft.sinks.SkippingStore.SidecarMeta,
                       tzOk: Boolean, reg: AggReg, cond: Expression,
                       skipNotNull: Set[String]): Option[Column] = cond match {
    case And(a, b) =>
      (distBool(meta, tzOk, reg, a, skipNotNull),
        distBool(meta, tzOk, reg, b, skipNotNull)) match {
        case (Some(x), Some(y)) => Some(x && y)
        case (x, y) => x.orElse(y)
      }
    case org.apache.spark.sql.catalyst.expressions.Or(a, b) =>
      for (x <- distBool(meta, tzOk, reg, a, skipNotNull);
           y <- distBool(meta, tzOk, reg, b, skipNotNull)) yield x || y
    case leaf =>
      val ts = preds(leaf, tzOk).flatMap(p =>
        distPred(meta, reg, p, skipNotNull))
      if (ts.isEmpty) None else Some(ts.reduce(_ && _))
  }

  /** ONE aggregation job: group the sidecar by file, evaluate every
    * registered leaf flag, filter on the combined boolean, collect
    * only the surviving names. */
  private def distributedFileSet(dir: String, cond: Expression,
                                 meta: graft.sinks.SkippingStore.SidecarMeta,
                                 tzOk: Boolean,
                                 skipNotNull: Set[String]): Option[Set[String]] = {
    val reg = new AggReg
    val boolExpr = distBool(meta, tzOk, reg, cond, skipNotNull)
      .getOrElse(return None)
    if (reg.aggs.isEmpty) return None
    val zm = spark.read.parquet(s"$dir/_zonemap_multi")
    Some(zm.groupBy(fcol("file")).agg(reg.aggs.head, reg.aggs.tail.toSeq: _*)
      .filter(boolExpr).select(fcol("file"))
      .collect().map(_.getString(0)).toSet)
  }

  /** SQL double comparison over zone stats: `-0.0 == 0.0` (the `+ 0.0`
    * normalizes the sign) and NaN greatest — exactly Spark's ordering,
    * so the in-memory test can never disagree with the DataFrame
    * filter it replaced. */
  private def cmpD(a: Double, b: Double): Int =
    java.lang.Double.compare(a + 0.0, b + 0.0)

  private def cmpS(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** Zone survivors of `col` over the in-memory sidecar — the same
    * semantics as the DataFrame-side probe it replaced: per-file
    * inclusive intersection, all-null files fail every bound, a bound
    * whose type doesn't match the column's stat slots disables the
    * prune (None), duplicate per-file stats disable it too. */
  private def zoneSurvivors(ctx: Ctx, c: String, lo: Option[Any],
                            hi: Option[Any]): Option[Set[String]] = {
    val sc = ctx.sidecar.getOrElse(return None)
    val stats = sc.byCol.getOrElse(c, return None)
    if (stats.map(_.file).distinct.size != stats.size) return None
    val isString = stats.exists(_.zminStr.isDefined)
    if (isString) {
      if (lo.exists(!_.isInstanceOf[String]) ||
          hi.exists(!_.isInstanceOf[String])) return None
      Some(stats.filter(st =>
          lo.forall(v => st.zmaxStr.exists(x => cmpS(x, v.toString) >= 0)) &&
            hi.forall(v => st.zminStr.exists(x => cmpS(x, v.toString) <= 0)))
        .map(_.file).toSet)
    } else {
      def num(v: Any): Option[Double] = v match {
        case n: Number => Some(n.doubleValue)
        case _ => None
      }
      val loD = lo.map(num); val hiD = hi.map(num)
      if (loD.exists(_.isEmpty) || hiD.exists(_.isEmpty)) return None
      Some(stats.filter(st =>
          loD.flatten.forall(v => st.zmax.exists(x => cmpD(x, v) >= 0)) &&
            hiD.flatten.forall(v => st.zmin.exists(x => cmpD(x, v) <= 0)))
        .map(_.file).toSet)
    }
  }

  /** Null-count survivors (Delta null-count skipping) from the
    * in-memory sidecar; None when the sidecar predates the stats, the
    * column is unindexed, or any per-file stat is missing. */
  private def nullSurvivors(ctx: Ctx, c: String,
                            wantNull: Boolean): Option[Set[String]] = {
    val sc = ctx.sidecar.getOrElse(return None)
    if (!sc.hasNullStats) return None
    val stats = sc.byCol.getOrElse(c, return None)
    if (stats.map(_.file).distinct.size != stats.size) return None
    if (stats.exists(st => st.nrows.isEmpty || st.nnulls.isEmpty)) return None
    Some(stats.filter(st =>
        if (wantNull) st.nnulls.get > 0L else st.nnulls.get < st.nrows.get)
      .map(_.file).toSet)
  }

  /** The files that might satisfy `p`, or None when the sidecars can't
    * say. Equality intersects zone and Bloom evidence when both
    * exist; an IN-list can only prune when EVERY value is prunable
    * (one unprunable value could live anywhere). */
  private def survivors(ctx: Ctx, p: Pred,
                        skipNotNull: Set[String]): Option[Set[String]] = p match {
    case RangeP(c, lo, hi) => zoneSurvivors(ctx, c, lo, hi)
    case EqP(c, v, bare) =>
      val z = zoneSurvivors(ctx, c, Some(v), Some(v))
      // cast-wrapped attrs never touch the Bloom index: the index
      // hashed raw column values, the equality lives in the coerced
      // domain — a probe there invents false negatives (see EqP doc)
      val b = if (bare) ctx.bloom.flatMap(bc => graft.sinks.SkippingStore
        .bloomProbe(spark, bc, c, v)).map(_.toSet) else None
      (z, b) match {
        case (Some(x), Some(y)) => Some(x intersect y)
        case (x, y) => x.orElse(y)
      }
    case InP(c, vs, bare) =>
      val sets = vs.map(v => survivors(ctx, EqP(c, v, bare), skipNotNull))
      if (sets.exists(_.isEmpty)) None
      else Some(sets.flatten.foldLeft(Set.empty[String])(_ union _))
    case NullP(c, false) if skipNotNull(c) =>
      None // redundant beside a comparison on the same column
    case NullP(c, wantNull) => nullSurvivors(ctx, c, wantNull)
  }

  /** Trailing `k=v` segments + name — the partitioned stores' relative
    * file key (matches [[graft.sinks.SkippingStore.indexPartitioned]]
    * and [[PrunedFileIndex]]). At a store root this is just the name. */
  private def relKey(p: Path): String = {
    var segs = List(p.getName)
    var cur = p.getParent
    while (cur != null && cur.getName.contains("=")) {
      segs = cur.getName :: segs
      cur = cur.getParent
    }
    segs.mkString("/")
  }

  private def prune(f: Filter, cond: Expression, l: LogicalRelation): LogicalPlan = {
    val rel = l.relation.asInstanceOf[HadoopFsRelation]
    // a PrunedFileIndex is this rule's own partitioned output — the
    // partitioned fixed point (the flat path reaches its fixed point
    // via the file-list-root check below)
    if (rel.location.isInstanceOf[PrunedFileIndex]) return f
    val partitioned = rel.partitionSchema.nonEmpty
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
    // fold-crash heal, MISS PATH ONLY: a zonemap parked under a fold
    // aside reads as "no sidecar" — only a lost prune, never a wrong
    // row — so a healthy sidecar costs exactly its existence check and
    // plain non-graft parquet dirs pay no extra metadata calls. This
    // runs inside an optimizer rule: any heal failure (read-only
    // mount, foreign scaffolding next to someone else's data) must
    // degrade to "no prune", never fail the query's planning.
    def healedExists(side: String): Boolean =
      fs.exists(new Path(side)) || {
        try graft.sinks.SidecarFold.restoreAside(spark, side)
        catch { case scala.util.control.NonFatal(_) => }
        fs.exists(new Path(side))
      }
    val hasZone = healedExists(s"$dir/_zonemap_multi")
    val hasBloom = healedExists(s"$dir/_bloommap")
    if (!hasZone && !hasBloom) return f
    // ONE load per sidecar serves every predicate of this pass, and a
    // cross-query cache keyed by the sidecar's fingerprint makes
    // repeated queries skip the parquet collect entirely. Each
    // sidecar's loud coverage check (unmapped append, foreign writer)
    // degrades to that sidecar being OFF, never to killing the other:
    // a stale bloom keeps a valid zone prune, and a stale zone keeps a
    // valid bloom prune — symmetric, and always safe because "off"
    // means the full scan on that dimension. On a partitioned store
    // both sidecars key files by partition-relative path (bare part-
    // names are ambiguous under dynamic partitioning).
    //
    // ABOVE the driver-file threshold the in-memory path would hold
    // files × columns stat rows on the driver — the lake-manifest
    // memory hazard of a small-file-decayed store. There the rule
    // switches to the DISTRIBUTED evaluation: a columns-sized
    // metadata summary decides which predicates are evaluable, ONE
    // aggregation job per relation evaluates the whole predicate
    // algebra over the sidecar frame, and only surviving file names
    // reach the driver. The bloom sidecar (file-count × bitset bytes
    // driver-side) is skipped above the threshold for the same
    // reason — survivors degrade to the zone-only superset, never
    // wrong.
    val actual = graft.sinks.SkippingStore
      .dataFiles(spark, dir, relative = partitioned)
    val maxDriverFiles = spark.conf
      .get("spark.graft.zoneprune.maxDriverFiles", "100000").toInt
    val distributed = actual.size > maxDriverFiles
    val sidecar =
      if (!hasZone || distributed) None
      else scala.util.Try(graft.sinks.SkippingStore
        .loadMultiSidecarCached(spark, dir, actual))
        .toOption.flatten
    val bloom =
      if (!hasBloom || distributed) None
      else scala.util.Try(graft.sinks.SkippingStore
        .loadBloomCtx(spark, dir, relative = partitioned))
        .toOption.flatten
    if (!distributed && sidecar.isEmpty && bloom.isEmpty) return f
    val surviving = (if (distributed) {
      if (!hasZone) None
      else graft.sinks.SkippingStore.loadSidecarMetaCached(spark, dir)
        .filter(m => m.nFiles == actual.size &&
          m.fileXor == graft.sinks.SkippingStore.fileListXor(actual))
        .flatMap { meta =>
          val tzOk =
            meta.tzs == Set(spark.sessionState.conf.sessionLocalTimeZone)
          distributedFileSet(dir, cond, meta, tzOk,
            comparisonCols(cond, tzOk))
        }
    } else {
      val tzOk = sidecar.exists(sc =>
        sc.tzs == Set(spark.sessionState.conf.sessionLocalTimeZone))
      val ctx = Ctx(dir, sidecar, bloom, tzOk)
      fileSet(ctx, cond, comparisonCols(cond, tzOk))
    }) match {
      case Some(s) => s
      case None => return f
    }
    val current = rel.location.inputFiles
      .map(p => relKey(new Path(p))).toSet
    if (surviving == current) return f // no file provably empty
    if (partitioned) {
      // wrap, don't replace: partition pruning must keep running on
      // the underlying index; the survivor set intersects on top
      val idx = new PrunedFileIndex(rel.location, surviving)
      return Filter(cond, l.copy(relation = rel.copy(location = idx)(spark)))
    }
    val idx = new InMemoryFileIndex(spark,
      surviving.toSeq.sorted.map(n => new Path(s"$dir/$n")),
      Map.empty, Some(rel.dataSchema))
    Filter(cond, l.copy(relation = rel.copy(location = idx)(spark)))
  }
}
