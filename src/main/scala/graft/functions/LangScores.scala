package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native marker-argmax language ID over a token array — the codegen'd
 * kernel behind [[graft.text.TextFunctions.langId]]. The composed
 * built-in formulation (one `filter(isInCollection)` per language,
 * each duplicated across every CASE-chain comparison) evaluates
 * ~`languages²` interpreted full-array scans per row; this runs ONE
 * pass over the tokens with per-language hash probes and resolves the
 * argmax with the same contract: first language (marker-table order)
 * whose count is maximal, `"und"` when no marker hits at all.
 *
 * The marker table is the STATIC
 * [[graft.text.TextFunctions.LangMarkers]] config (resolved lazily to
 * dodge the object-initialization cycle) — language ID is a fixed
 * corpus-wide vocabulary decision, not a per-call knob; custom marker
 * sets keep the composed `wordSetCount` route. Null tokens inside the
 * array are skipped; null array → null (UnaryExpression default).
 */
case class LangScores(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    LangScores.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScores.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)

  override def prettyName: String = "lang_id"
}

object LangScores {

  def langId(toks: Column): Column =
    ColumnBridge.column(LangScores(ColumnBridge.expression(toks)))

  private val und = UTF8String.fromString("und")

  // one hash set per language, marker-table order; built on first use
  private lazy val labels: Array[UTF8String] =
    graft.text.TextFunctions.LangMarkers
      .map(m => UTF8String.fromString(m._1)).toArray
  private lazy val markerSets: Array[java.util.HashSet[UTF8String]] =
    graft.text.TextFunctions.LangMarkers.map { case (_, ws) =>
      val s = new java.util.HashSet[UTF8String](ws.size * 2)
      ws.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  /** Called from generated code — must stay public and static-shaped. */
  def compute(toks: ArrayData): UTF8String = {
    val sets = markerSets
    val counts = new Array[Int](sets.length)
    var total = 0
    var i = 0
    val n = toks.numElements()
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var j = 0
        while (j < sets.length) {
          if (sets(j).contains(t)) { counts(j) += 1; total += 1 }
          j += 1
        }
      }
      i += 1
    }
    if (total == 0) return und
    var best = 0
    var j = 1
    while (j < counts.length) {
      if (counts(j) > counts(best)) best = j // strict: first max wins
      j += 1
    }
    labels(best)
  }
}
