package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expressions for the odds domain (SURVEY.md §2.6 C13) —
  * preference tier (b): a codegen'd `Expression` beats a Scala UDF, and
  * these sit on per-row hot paths at ingest scale. Both generate straight
  * Java into whole-stage codegen (no virtual calls, no boxing) and are
  * SQL-registrable via [[GraftExtensions]].
  */

/** `normalize_odds(x)` — the −100 avoidance rule (reference
  * `src/mm_calls.py:416-418`): −100 ⇒ +100, everything else unchanged. */
case class NormalizeOdds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val odds = v.asInstanceOf[Int]
    if (odds == -100) 100 else odds
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c == -100) ? 100 : $c")

  override protected def withNewChildInternal(newChild: Expression): NormalizeOdds =
    copy(child = newChild)

  override def prettyName: String = "normalize_odds"
}

/** `american_to_decimal(x)` — American → decimal (European) odds:
  * x > 0 ⇒ 1 + x/100, x < 0 ⇒ 1 + 100/(−x). */
case class AmericanToDecimal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val odds = v.asInstanceOf[Int]
    if (odds > 0) 1.0 + odds / 100.0 else 1.0 + 100.0 / -odds.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"($c > 0) ? (1.0d + $c / 100.0d) : (1.0d + 100.0d / -((double) $c))")

  override protected def withNewChildInternal(newChild: Expression): AmericanToDecimal =
    copy(child = newChild)

  override def prettyName: String = "american_to_decimal"
}
