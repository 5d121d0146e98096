package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Morton (Z-order) interleave of k bucket ids at `bits` bits each: bit i
 * of input j lands at output position `i·k + j` — the space-filling
 * curve key behind multi-dimensional data clustering
 * ([[graft.layout.ZOrder]]). Pure integer bit arithmetic, so an
 * external SQL engine replays it exactly with a shift/mask sum.
 *
 * Input: `array<long>` of k ALREADY-BUCKETED values in `[0, 2^bits)`
 * (out-of-range bits above `bits` are masked off, negatives are masked
 * too — callers bucket first, see `ZOrder.zvalue`). Null array → null;
 * null elements → that dimension contributes 0 (sorts first, the SQL
 * NULLS FIRST analogue). Requires `k · bits <= 63` so the key fits a
 * non-negative long.
 */
case class ZValue(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    ZValue.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZValue.compute($c, $bits)")

  override protected def withNewChildInternal(n: Expression): ZValue = copy(child = n)
  override def prettyName: String = "z_value"
}

object ZValue {

  def zValue(buckets: Column, bits: Int): Column =
    ColumnBridge.column(ZValue(ColumnBridge.expression(buckets), bits))

  /** Called from generated code — must stay public and static-shaped. */
  def compute(buckets: ArrayData, bits: Int): Long = {
    val k = buckets.numElements()
    require(k >= 1 && k * bits <= 63,
      s"z-value needs 1 <= dims and dims*bits <= 63, got $k dims x $bits bits")
    var z = 0L
    var j = 0
    while (j < k) {
      val v = if (buckets.isNullAt(j)) 0L else buckets.getLong(j)
      var i = 0
      while (i < bits) {
        z |= ((v >>> i) & 1L) << (i * k + j)
        i += 1
      }
      j += 1
    }
    z
  }
}
