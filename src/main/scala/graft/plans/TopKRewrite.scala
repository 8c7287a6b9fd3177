package graft.plans

import graft.plans.TopKPlan.TopKPerGroupNode
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  EqualTo, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber,
  SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the universal top-k idiom
  *
  * {{{ Filter(rank <= k, Window(row_number() over (partition by g order by o) as rank)) }}}
  *
  * into [[TopKPerGroupNode]], so user code written with the window API gets
  * the bounded-heap partial/final plan ([[TopKPlan]]) — prune-before-
  * shuffle instead of shuffle-everything-then-sort — without being
  * rewritten by hand. The last custom-Catalyst tier the engine exercises:
  * native `Expression` (odds), DSv2 source (ladder), planner `Strategy`
  * (top-k), and now a `Rule[LogicalPlan]`, all installed by
  * [[GraftExtensions]].
  *
  * Fires only on the exact shape where semantics are provably identical:
  * a single row_number window expression with non-empty partition AND
  * order specs, filtered by `rank <= k` / `rank < k` / `rank = 1` on the
  * window's output attribute (possibly conjoined with other predicates,
  * which stay in a residual Filter above the node). Tie behavior matches
  * row_number's: a non-total order makes BOTH plans pick tied rows
  * arbitrarily — same contract Spark accepts for its own
  * `WindowGroupLimit` pushdown.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  /** rank-limit k from the predicate, if it constrains `rank`. */
  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rank) => Some(k)
    case LessThan(r: Attribute, IntegerLiteral(k)) if r.semanticEquals(rank) => Some(k - 1)
    case EqualTo(r: Attribute, IntegerLiteral(1)) if r.semanticEquals(rank) => Some(1)
    case _ => None
  }

  /** Split a conjunction into (rank-limit, residual predicates). */
  private def extract(cond: Expression, rank: Attribute): (Option[Int], Seq[Expression]) = {
    val conjuncts = splitConjuncts(cond)
    val (limits, rest) = conjuncts.partition(c => limitOf(c, rank).isDefined)
    if (limits.isEmpty) (None, conjuncts)
    else (Some(limits.flatMap(limitOf(_, rank)).min), rest)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        w @ Window(Seq(a @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(part, order, _: SpecifiedWindowFrame)), _)),
          _, _, child, _))
        if part.nonEmpty && order.nonEmpty =>
      extract(cond, a.toAttribute) match {
        case (Some(k), residual) if k >= 1 =>
          val node = TopKPerGroupNode(part, order, k, a.toAttribute, child)
          if (residual.isEmpty) node
          else Filter(residual.reduce(And), node)
        case _ => f // no rank limit, or k < 1 (always-false filter): leave as-is
      }
  }
}
