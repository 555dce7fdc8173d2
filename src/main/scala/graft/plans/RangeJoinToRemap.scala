package graft.plans

import graft.functions.RangeRemap
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}

/** Optimizer rule: rewrite a broadcastable literal range join into the
  * codegen'd [[RangeRemap]] binary search (SURVEY §7.4's J6 phase-2 path,
  * applied automatically).
  *
  * A user writing the natural remap formulation —
  *
  *   facts.join(ranges, v >= ranges("lo") && v < ranges("hi"))
  *         .select(factCols, ranges("out"))
  *
  * — gets an inner theta-join that probes every range per row through a
  * BroadcastNestedLoopJoin. When the range table is a LITERAL relation
  * whose rows form sorted, contiguous, half-open ranges (the reference's
  * §1.4(3) invariant, checkable at plan time precisely because the rows
  * are literals), the join is equivalent to an O(log n) binary search per
  * row with no join operator at all:
  *
  *   Project(factCols, out = range_remap(v, bounds, outs))
  *     Filter(isnotnull(out))        // inner-join semantics: no match -> drop
  *
  * The rewrite fires only when every precondition is provable:
  * inner join; right side a LocalRelation of (lo: double, hi: double,
  * out: int) with no other columns referenced downstream; the condition
  * is exactly the two half-open bounds; rows non-null, sorted,
  * contiguous (hi_i == lo_{i+1}), non-overlapping. Anything else keeps
  * the original join — the rule is an optimization, never a semantic
  * change. Registered via [[graft.functions.GraftExtensions]].
  */
object RangeJoinToRemap extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Join(left, lr: LocalRelation, Inner, Some(cond), _)) =>
      rewrite(projList, None, left, lr, cond).getOrElse(p)
    // same shape with a user Filter between the Project and the Join
    // (e.g. a post-join predicate on the remap output or a fact column):
    // the filter is preserved above the remap, which is legal because the
    // rewrite keeps the output attribute ids and only drops the two bound
    // columns — provided the filter doesn't reference them
    case p @ Project(projList, Filter(fcond,
        Join(left, lr: LocalRelation, Inner, Some(cond), _))) =>
      rewrite(projList, Some(fcond), left, lr, cond).getOrElse(p)
  }

  /** Match `v >= lo` in either written orientation; returns (v, lo). */
  private def geq(e: Expression, leftOut: AttributeSet,
                  rightOut: AttributeSet): Option[(Attribute, Attribute)] =
    e match {
      case GreaterThanOrEqual(v: Attribute, lo: Attribute)
          if leftOut.contains(v) && rightOut.contains(lo) => Some((v, lo))
      case LessThanOrEqual(lo: Attribute, v: Attribute)
          if leftOut.contains(v) && rightOut.contains(lo) => Some((v, lo))
      case _ => None
    }

  /** Match `v < hi` in either written orientation; returns (v, hi). */
  private def lt(e: Expression, leftOut: AttributeSet,
                 rightOut: AttributeSet): Option[(Attribute, Attribute)] =
    e match {
      case LessThan(v: Attribute, hi: Attribute)
          if leftOut.contains(v) && rightOut.contains(hi) => Some((v, hi))
      case GreaterThan(hi: Attribute, v: Attribute)
          if leftOut.contains(v) && rightOut.contains(hi) => Some((v, hi))
      case _ => None
    }

  private def rewrite(projList: Seq[NamedExpression],
                      extraFilter: Option[Expression], left: LogicalPlan,
                      lr: LocalRelation,
                      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None
    val lo = left.outputSet
    val ro = lr.outputSet
    val (vLo, vHi) = (conjuncts.flatMap(geq(_, lo, ro)),
                      conjuncts.flatMap(lt(_, lo, ro)))
    if (vLo.length != 1 || vHi.length != 1) return None
    val (v1, loAttr) = vLo.head
    val (v2, hiAttr) = vHi.head
    if (v1.exprId != v2.exprId || loAttr.exprId == hiAttr.exprId) return None
    if (v1.dataType != DoubleType || loAttr.dataType != DoubleType ||
        hiAttr.dataType != DoubleType) return None

    // exactly one further right column — the remap output, int-typed
    val others = lr.output.filterNot(a =>
      a.exprId == loAttr.exprId || a.exprId == hiAttr.exprId)
    if (others.length != 1 || others.head.dataType != IntegerType) return None
    val outAttr = others.head
    // downstream (projection AND any interposed filter) must not
    // reference the bound columns themselves
    if ((projList ++ extraFilter).exists(_.references.exists(r =>
          r.exprId == loAttr.exprId || r.exprId == hiAttr.exprId)))
      return None

    // literal rows -> (lo, hi, out); all non-null
    val idx = Map(loAttr.exprId -> lr.output.indexWhere(_.exprId == loAttr.exprId),
                  hiAttr.exprId -> lr.output.indexWhere(_.exprId == hiAttr.exprId),
                  outAttr.exprId -> lr.output.indexWhere(_.exprId == outAttr.exprId))
    if (lr.data.isEmpty) return None
    val rows = lr.data.map { r =>
      if (r.isNullAt(idx(loAttr.exprId)) || r.isNullAt(idx(hiAttr.exprId)) ||
          r.isNullAt(idx(outAttr.exprId))) return None
      (r.getDouble(idx(loAttr.exprId)), r.getDouble(idx(hiAttr.exprId)),
       r.getInt(idx(outAttr.exprId)))
    }.sortBy(_._1)
    // §1.4(3) invariant: sorted, contiguous, non-overlapping half-open
    val contiguous = rows.forall { case (l, h, _) => l <= h && !l.isNaN && !h.isNaN } &&
      rows.sliding(2).forall {
        case Seq((_, h, _), (l2, _, _)) => h == l2
        case _ => true
      }
    if (!contiguous) return None

    val bounds = rows.map(_._1) :+ rows.last._2
    val outs = rows.map(_._3)
    val remap = RangeRemap(v1,
      Literal.create(bounds, ArrayType(DoubleType)),
      Literal.create(outs, ArrayType(IntegerType)))
    // keep the original output attribute id so downstream references hold
    val aliased = Alias(remap, outAttr.name)(exprId = outAttr.exprId)
    val base: LogicalPlan = Filter(IsNotNull(aliased.toAttribute),
      Project(left.output :+ aliased, left))
    Some(Project(projList, extraFilter.map(Filter(_, base)).getOrElse(base)))
  }
}
