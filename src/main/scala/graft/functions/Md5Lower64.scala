package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The little-endian uint64 of md5-digest bytes 8..15 of a string, as a
 * signed long — bit-identical to DuckDB's `md5_number_lower(s)`, the
 * [[Md5Simhash]] per-token hash factored out as a standalone scalar.
 *
 * The engine-reproducible feature hash for bucketed statistics
 * ([[graft.curation.Sampling.importanceWeights]]): `pmod(h, B)` with a
 * POWER-OF-TWO B equals the unsigned `md5_number_lower(s) % B` an
 * external SQL engine computes (2^64 ≡ 0 mod B makes the signed
 * reinterpretation cancel). Null input → null.
 */
case class Md5Lower64(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Lower64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Lower64.compute($c)")

  override protected def withNewChildInternal(n: Expression): Md5Lower64 = copy(child = n)
  override def prettyName: String = "md5_lower64"
}

object Md5Lower64 {

  def md5Lower64(s: Column): Column =
    ColumnBridge.column(Md5Lower64(ColumnBridge.expression(s)))

  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code — must stay public and static-shaped. */
  def compute(s: UTF8String): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var k = 15
    while (k >= 8) { h = (h << 8) | (d(k) & 0xffL); k -= 1 }
    h
  }
}
