package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 16-byte md5 run digests of every k-token window of a text column, in
 * position order, as one native codegen'd expression.
 *
 * Value-identical (on non-null input) to the composed built-ins
 * `transform(sequence(1, size(ws)-k+1), i => unhex(md5(concat_ws(" ",
 * slice(ws, i, k)).cast("binary"))))` over `ws = tokens(text)` — the
 * run-digest extraction of the substring-dedup family
 * ([[graft.dedup.Dedup.substringPairs]], `Dedup.decontaminate`). The
 * composed form runs interpreted (higher-order array functions never
 * codegen) and re-slices per position; this runs tokenize → window →
 * md5 in one tight loop inside whole-stage codegen, and keeps the
 * surrounding stage codegen-able. Null text → null, like
 * [[WordShingles]]; oracle replay is unchanged — md5 over the UTF-8
 * bytes of the space-joined window, identical in every engine.
 *
 * Fewer than k tokens → empty array (no window fits).
 */
case class RunDigests(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"window size must be >= 1, got $k")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    RunDigests.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RunDigests.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): RunDigests =
    copy(child = newChild)

  override def prettyName: String = "run_digests"
}

object RunDigests {

  /** Column-API entry point. */
  def runDigests(text: Column, k: Int): Column =
    ColumnBridge.column(RunDigests(ColumnBridge.expression(text), k))

  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code — must stay public and static-shaped. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val toks = WordShingles.tokenize(text)
    val m = toks.size - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = localMd5.get()
    val sb = new java.lang.StringBuilder()
    val arr = new Array[Any](m)
    var j = 0
    while (j < m) {
      sb.setLength(0)
      var i = 0
      while (i < k) {
        if (i > 0) sb.append(' ')
        sb.append(toks.get(j + i))
        i += 1
      }
      md.reset()
      arr(j) = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      j += 1
    }
    new GenericArrayData(arr)
  }
}
