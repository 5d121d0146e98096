package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Order-pinned boolean conjunction: `gatedAnd(gate, pred)` filters like
  * `gate AND pred`, but the evaluation ORDER is part of the contract —
  * `gate` runs first and `pred` is never evaluated unless `gate` is
  * TRUE. A plain `when(gate, pred).otherwise(false)` does not give this
  * guarantee: `SimplifyConditionalsInPredicate` rewrites exactly that
  * shape back to `And(gate, pred)` in predicate position, and
  * `PushPredicateThroughJoin` then picks its OWN conjunct order
  * (measured on the round-13 band A/B: a ~1%-selective band `.where`d
  * first still ran last). As a single opaque expression no rule can
  * split or reorder it, which makes it the per-pair cost-control
  * primitive for join refines: cheap selective residuals gate expensive
  * kernels (JTS relate, Vincenty distance) INSIDE one conjunct.
  *
  * Null semantics: a NULL gate or NULL pred yields FALSE (never null) —
  * identical row survival to `gate AND pred` under filter semantics,
  * where null and false both drop the row.
  */
object GatedAndExpr {
  def gatedAnd(gate: Column, pred: Column): Column =
    ColumnBridge.column(
      GatedAnd(ColumnBridge.expression(gate), ColumnBridge.expression(pred)))
}

case class GatedAnd(gate: Expression, pred: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def left: Expression = gate
  override def right: Expression = pred
  override def inputTypes: Seq[DataType] = Seq(BooleanType, BooleanType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val g = gate.eval(input)
    if (g == null || !g.asInstanceOf[Boolean]) false
    else {
      val p = pred.eval(input)
      p != null && p.asInstanceOf[Boolean]
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val g = gate.genCode(ctx)
    val p = pred.genCode(ctx)
    val code =
      code"""
        ${g.code}
        boolean ${ev.value} = false;
        if (!${g.isNull} && ${g.value}) {
          ${p.code}
          ${ev.value} = !${p.isNull} && ${p.value};
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): GatedAnd =
    copy(gate = l, pred = r)
  override def prettyName: String = "gated_and"
}
