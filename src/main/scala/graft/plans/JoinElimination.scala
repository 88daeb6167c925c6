package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Join elimination over a declared-unique key — the classic
  * unique-constraint optimization no stock Spark rule performs
  * (Catalyst has no table constraints to trust): a LEFT OUTER join to
  * a parquet store on a key with a CURRENTLY-VALID `unique`
  * declaration ([[graft.sinks.Constraints]]) preserves the left side's
  * rows exactly — every left row matches at most one right row, and a
  * non-match just null-extends columns nobody reads — so when the
  * projection above references ONLY left-side columns, the join (and
  * the store's whole scan + shuffle/broadcast) is dropped from the
  * plan. At 100 TB that is an entire join stage for free whenever a
  * query joins a dimension "just in case" — the view-expansion /
  * generated-SQL pattern ORMs and BI layers emit constantly.
  *
  * Every condition is correctness-bearing:
  *  - LEFT OUTER under a unique declaration alone; INNER additionally
  *    requires a currently-valid FOREIGN KEY declaration on the fact
  *    side ([[graft.sinks.Constraints.declareForeignKey]] — totality +
  *    non-null verified, both stores' file sets stamped), because an
  *    inner join drops unmatched fact rows;
  *  - the condition is a single bare-attribute equality whose right
  *    side resolves through alias-only Projects to the store column
  *    with the declaration;
  *  - the declaration must be VALID NOW: its stamped file set must
  *    equal the store's current data files, so any append/compact
  *    since declaration self-invalidates (the sidecar-coverage
  *    discipline of every store read here);
  *  - the projection's references must sit entirely in the LEFT
  *    output (duplicate-attribute ambiguity cannot arise — the right
  *    side's attributes are gone from the result).
  * Kill-switched by `spark.graft.joinelim.enabled`; any failure falls
  * back to the stock join, so the rule can only remove work. */
case class JoinEliminationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.joinelim.enabled", "true").toBoolean)
      return plan
    plan.transform {
      case p @ Project(projList,
          Join(left, right, LeftOuter, Some(EqualTo(a, b)), _))
          if projList.flatMap(_.references).forall(left.outputSet.contains) =>
        try {
          orient(a, b, left, right) match {
            case Some((_, rk)) if uniqueStoreDir(rk, right).isDefined =>
              Project(projList, left)
            case _ => p
          }
        } catch { case scala.util.control.NonFatal(_) => p }
      // INNER join to the declared referent of a fact store's foreign
      // key: the FK's totality + non-null stamp says no fact row drops,
      // the dim key's uniqueness says none duplicates — so with only
      // fact columns read, the join is the identity on the fact side.
      // The fact store may sit on either side of the join.
      case p @ Project(projList,
          Join(left, right, Inner, Some(EqualTo(a, b)), _)) =>
        try {
          val factLeft = projList.flatMap(_.references)
            .forall(left.outputSet.contains)
          val factRight = !factLeft && projList.flatMap(_.references)
            .forall(right.outputSet.contains)
          val elim =
            if (factLeft) fkEliminates(a, b, left, right)
            else if (factRight) fkEliminates(a, b, right, left)
            else false
          if (elim) Project(projList, if (factLeft) left else right) else p
        } catch { case scala.util.control.NonFatal(_) => p }
    }
  }

  /** Does the fact side's join attribute carry a currently-valid FK
    * declaration whose referent is exactly the dim side's store and
    * column? Both stamps and the dim's unique declaration re-verify
    * per query ([[graft.sinks.Constraints.verifiedForeignKey]]). */
  private def fkEliminates(a: org.apache.spark.sql.catalyst.expressions.Expression,
                           b: org.apache.spark.sql.catalyst.expressions.Expression,
                           fact: LogicalPlan, dim: LogicalPlan): Boolean = {
    orient(a, b, fact, dim) match {
      case Some((fk, dk)) =>
        (storeColumn(fk, fact), storeColumn(dk, dim)) match {
          case (Some((factDir, fkCol)), Some((dimDir, dimCol))) =>
            graft.sinks.Constraints.verifiedForeignKey(spark, factDir, fkCol)
              .exists { case (refDir, refCol) =>
                refCol == dimCol &&
                  graft.sinks.Constraints.qualified(spark, refDir) ==
                    graft.sinks.Constraints.qualified(spark, dimDir)
              }
          case _ => false
        }
      case None => false
    }
  }

  /** Orient the equality: which side is the left key, which the right. */
  private def orient(a: org.apache.spark.sql.catalyst.expressions.Expression,
                     b: org.apache.spark.sql.catalyst.expressions.Expression,
                     left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute)] = (a, b) match {
    case (x: AttributeReference, y: AttributeReference) =>
      if (left.outputSet.contains(x) && right.outputSet.contains(y)) Some((x, y))
      else if (left.outputSet.contains(y) && right.outputSet.contains(x)) Some((y, x))
      else None
    case _ => None
  }

  /** Resolve `attr` (through alias-only Projects; Filters are NOT
    * allowed — keep the match minimal and auditable) to its store's
    * (directory, column name). */
  private def storeColumn(attr: Attribute,
                          plan: LogicalPlan): Option[(String, String)] = {
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
    resolve(attr, plan).flatMap { case (l, colName) =>
      l.relation match {
        case rel: HadoopFsRelation if rel.partitionSchema.isEmpty =>
          val roots = rel.location.rootPaths
          if (roots.length == 1 && !roots.head.getName.endsWith(".parquet"))
            Some((roots.head.toString, colName))
          else None
        case _ => None
      }
    }
  }

  /** A version-pinned [[graft.sinks.VersionedStore]] read: the relation
    * roots are an explicit `part-*.parquet` FILE LIST sharing one
    * parent directory that carries a `_versions/` commit log. Resolves
    * to (store dir, column, the exact file names read) so a constraint
    * stamped with a snapshot manifest can match against precisely the
    * files this plan reads — the immutability argument that lets
    * elimination fire on time travel. */
  private def pinnedStoreColumn(attr: Attribute, plan: LogicalPlan)
      : Option[(String, String, Set[String])] = {
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
    resolve(attr, plan).flatMap { case (l, colName) =>
      l.relation match {
        case rel: HadoopFsRelation if rel.partitionSchema.isEmpty =>
          val roots = rel.location.rootPaths
          val parents = roots.map(_.getParent).distinct
          if (roots.nonEmpty && roots.forall(_.getName.endsWith(".parquet")) &&
              parents.length == 1 &&
              graft.sinks.VersionedStore.isVersioned(spark, parents.head.toString))
            Some((parents.head.toString, colName,
              roots.map(_.getName).toSet))
          else None
        case _ => None
      }
    }
  }

  /** The store dir when `rk` resolves to a relation column carrying a
    * currently-valid unique declaration — directory reads check the
    * live file set, version-pinned reads check the exact files read. */
  private def uniqueStoreDir(rk: Attribute, plan: LogicalPlan): Option[String] =
    storeColumn(rk, plan).flatMap { case (dir, colName) =>
      if (graft.sinks.Constraints.verifiedUnique(spark, dir, colName)) Some(dir)
      else None
    }.orElse(pinnedStoreColumn(rk, plan).flatMap { case (dir, colName, files) =>
      if (graft.sinks.Constraints.verifiedUniqueFor(spark, dir, colName, files))
        Some(dir)
      else None
    })
}
