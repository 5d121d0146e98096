package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Winnowed document fingerprints (Schleimer, Wilkerson, Aiken,
 * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
 * 2003): over the k-token run digests h_0..h_{m-1} of a text
 * ([[RunDigests]] semantics), slide a window of `w` consecutive digest
 * positions and keep the window's MINIMUM digest (unsigned lexicographic
 * on the 16 md5 bytes; ties break to the RIGHTMOST position — the
 * robust-winnowing rule, which makes the selected position sequence
 * monotone so consecutive windows re-selecting the same digest collapse
 * to one fingerprint). Output: array<struct<p int, h binary>> of the
 * selected (position, digest) fingerprints, ascending in p.
 *
 * Why: the density of selected fingerprints is 2/(w+1) in expectation,
 * so the substring inverted index shrinks ~(w+1)/2 x BEFORE the
 * explode/shuffle, while the winnowing guarantee keeps detection exact
 * for long spans: any verbatim token span of at least w+k-1 tokens
 * contains a full digest window, both documents select the SAME
 * digest at the SAME span-relative position inside it, and the pair
 * meets in the index ([[graft.dedup.Dedup.winnowedSubstringPairs]]).
 *
 * Texts with fewer than w digest windows (but at least one digest)
 * winnow over a single window covering all digests — every tokenizable
 * text of >= k tokens yields >= 1 fingerprint.
 *
 * The oracle replay orders by the HEX md5 string: lowercase-hex
 * lexicographic order coincides with unsigned byte order, so an
 * external engine reproduces the selection exactly. The per-window scan
 * is O(m·w) comparisons of 16-byte digests; at the library's w <= 16
 * that is cheaper in practice than a deque-based O(m) with its
 * allocation, and the loop stays inside whole-stage codegen.
 */
case class WinnowDigests(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"window size k must be >= 1, got $k")
  require(w >= 1, s"winnow window w must be >= 1, got $w")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p", IntegerType, nullable = false),
      StructField("h", BinaryType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WinnowDigests.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowDigests.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowDigests =
    copy(child = newChild)

  override def prettyName: String = "winnow_digests"
}

object WinnowDigests {

  /** Column-API entry point. */
  def winnowDigests(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowDigests(ColumnBridge.expression(text), k, w))

  /** Unsigned lexicographic comparison of two 16-byte digests. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** Called from generated code — must stay public and static-shaped. */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val ds = RunDigests.compute(text, k)
    val m = ds.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val digests = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { digests(i) = ds.getBinary(i); i += 1 }
    val nWin = math.max(m - w + 1, 1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](2 * m / (w + 1) + 2)
    var lastSel = -1
    var s = 0
    while (s < nWin) {
      val end = math.min(s + w, m)
      var best = s
      var p = s + 1
      while (p < end) {
        // <= 0: strictly smaller wins, an equal digest at a LATER
        // position wins (rightmost tie rule)
        if (cmp(digests(p), digests(best)) <= 0) best = p
        p += 1
      }
      // rightmost-tie selection is monotone non-decreasing across
      // windows, so suppressing the immediate repeat dedups completely
      if (best != lastSel) {
        out += new GenericInternalRow(Array[Any](best, digests(best)))
        lastSel = best
      }
      s += 1
    }
    new GenericArrayData(out.toArray)
  }
}
