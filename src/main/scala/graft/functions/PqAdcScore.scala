package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * Asymmetric-distance-computation (ADC) score for product-quantized
 * vectors, as one codegen'd Catalyst expression: given a query's lookup
 * table `lut` (m subspaces × ksub precomputed sub-dot-products) and a
 * candidate's `codes` (m sub-codebook indices), returns
 * `Σ_j lut[j][codes[j]]` — the PQ approximation of the full dot product
 * at m array reads per pair instead of `dim` multiply-adds.
 *
 * This is the inner loop of the PQ scan
 * ([[graft.similarity.ProductQuantizer.topK]]); the composed
 * `aggregate(zip_with(lut, codes, (t, c) -> element_at(t, c + 1)), ...)`
 * formulation computes the identical sequential fold but runs
 * interpreted (Spark does not codegen higher-order array functions —
 * the same ~10-50× gap measured for WordShingles/RunDigests/VectorDot).
 *
 * Null/ragged propagation: a null or out-of-range code, a null table
 * row, or `|lut| != |codes|` yields NULL — a silently-skipped subspace
 * would hide a codebook/encoding mismatch behind a plausible score.
 */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(ArrayType(DoubleType)), ArrayType(IntegerType))
  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqAdcScore.compute(lut.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.PqAdcScore.compute($lut, $codes);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }""")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)

  override def prettyName: String = "pq_adc_score"
}

object PqAdcScore {

  def pqAdcScore(lut: Column, codes: Column): Column =
    ColumnBridge.column(PqAdcScore(ColumnBridge.expression(lut), ColumnBridge.expression(codes)))

  /** Called from generated code; sequential fold over subspaces. */
  def compute(lut: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (lut.numElements() != m) return null
    var acc = 0.0d
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j) || lut.isNullAt(j)) return null
      val table = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= table.numElements() || table.isNullAt(c)) return null
      acc += table.getDouble(c)
      j += 1
    }
    acc
  }
}
