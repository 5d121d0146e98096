package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * 64-bit document SimHash over a token array, as one codegen'd Catalyst
 * expression: each token's xxhash64 (seed 42) votes ±1 on every bit;
 * the fingerprint is the sign pattern. Near-duplicate documents differ
 * in few bits (small Hamming distance) — see graft.dedup.Dedup.simhashPairs
 * for the banded pair search.
 */
case class TextSimhash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextSimhash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextSimhash.compute($c)")

  override protected def withNewChildInternal(n: Expression): TextSimhash = copy(child = n)
  override def prettyName: String = "text_simhash"
}

object TextSimhash {

  def textSimhash(tokens: Column): Column =
    ColumnBridge.column(TextSimhash(ColumnBridge.expression(tokens)))

  /** Called from generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) { i += 1 }
      else {
      val u = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}
