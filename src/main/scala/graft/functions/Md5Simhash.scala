package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * 64-bit document SimHash over a token array with md5-derived per-token
 * hashes — the oracle-replayable variant of [[TextSimhash]] (whose
 * xxhash64 seeds are engine-internal). The per-token hash is the
 * little-endian uint64 of md5-digest bytes 8..15, i.e. exactly DuckDB's
 * `md5_number_lower(token)`, so an external SQL engine can reproduce the
 * fingerprint (and therefore the banded near-dup pairs) bit-for-bit.
 * Same vote semantics as TextSimhash: each token votes ±1 per bit; the
 * fingerprint is the sign pattern; null tokens are skipped.
 *
 * md5 costs ~3× xxhash64 per token — prefer TextSimhash when
 * cross-engine replay is not needed.
 */
case class Md5Simhash(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Simhash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Simhash.compute($c)")

  override protected def withNewChildInternal(n: Expression): Md5Simhash = copy(child = n)
  override def prettyName: String = "md5_simhash"
}

object Md5Simhash {

  def md5Simhash(tokens: Column): Column =
    ColumnBridge.column(Md5Simhash(ColumnBridge.expression(tokens)))

  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val md = localMd5.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val d = md.digest(tokens.getUTF8String(i).getBytes)
        // little-endian uint64 of digest bytes 8..15 == DuckDB md5_number_lower
        var h = 0L
        var k = 15
        while (k >= 8) { h = (h << 8) | (d(k) & 0xffL); k -= 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
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
