package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, ExprId, Expression, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite for the `row_number() OVER (...) <= k` idiom — the
  * only way plain SQL can ask for grouped top-k. Untouched, that plan
  * shuffles and SORTS every input row just to discard all but k per
  * group; Spark's own InferWindowGroupLimit (3.5+) prunes with per-
  * partition rank limits but still pays a full local sort on both sides
  * of the exchange. This rule bounds the window's INPUT with
  * [[GroupedTopKNode]] instead: the heap-based partial keeps ≤k rows per
  * group per partition in O(n log k) without sorting, the exchange
  * carries ≤ partitions×groups×k rows, and the original Window then
  * recomputes `row_number` over the ≤k survivors per group — identical
  * values for exactly the rows the filter keeps, so the rewrite is
  * semantics-preserving (tie behavior at the k boundary is unspecified
  * either way, the same contract `row_number` itself has).
  *
  * Deliberately conservative — it fires only on the exact shape
  * `Filter(rn cmp k, [Project(...,)] Window(row_number() AS rn))` with a
  * single window expression and a non-empty order, where cmp is one of
  * `<=`, `<`, `= 1`, or the reversed `k >= rn`. `rank`/`dense_rank`
  * never rewrite: with ties they can keep MORE than k rows, which a
  * k-bounded operator cannot honor.
  */
object RowNumberTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rnId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rnId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rnId => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType))
        if a.exprId == rnId => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.exprId == rnId => Some(k)
    case _ => None
  }

  private def rewrite(f: Filter, w: Window,
                      wrap: Window => LogicalPlan): LogicalPlan =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _))
          if w.orderSpec.nonEmpty && !w.child.isInstanceOf[GroupedTopKNode] =>
        limitOf(f.condition, a.exprId) match {
          case Some(k) if k >= 1 =>
            val bounded = GroupedTopKNode(w.partitionSpec, w.orderSpec, k,
              w.child)
            f.copy(child = wrap(w.copy(child = bounded)))
          case _ => f
        }
      case _ => f
    }

  /** Kill switch (`spark.graft.topk.rewrite=false`) — standard escape
    * hatch for a semantics-preserving rewrite, and what lets specs
    * compute the un-rewritten window plan as an independent oracle. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topk.rewrite", "true").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(_, w: Window) => rewrite(f, w, identity)
      case f @ Filter(_, p @ Project(_, w: Window)) =>
        rewrite(f, w, nw => p.copy(child = nw))
    }
}
