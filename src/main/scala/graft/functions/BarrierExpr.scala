package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper whose ONLY job is to read as nondeterministic to the
  * optimizer: `PlanBarrier(e)` evaluates to exactly `e`, but because
  * `deterministic = false` Catalyst will not push a filter containing it
  * below projections/exchanges (PushPredicateThroughNonJoin moves only
  * deterministic predicates), will not inline it when collapsing
  * projections, and will not constant-fold it.
  *
  * Why not `pred || rand() > 2`: Spark 4's `OptimizeRand` rule
  * range-analyzes rand() comparisons and folds the always-false disjunct
  * right back out, re-enabling the pushdown the barrier was meant to
  * block (observed: the tokenize+shingle guard reappearing below the
  * fan-out exchange in the scan-stage filter). A custom expression is
  * invisible to every builtin rule, so the barrier is stable across
  * Spark upgrades by construction.
  *
  * Evaluation is a pure passthrough in BOTH the interpreted and the
  * codegen path — zero runtime cost; the wrapped predicate stays inside
  * whole-stage codegen.
  */
case class PlanBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PlanBarrier =
    copy(child = newChild)
}
