package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Vocab-scale unigram-LM serving: the piece table as DATA in one
 * codegen'd expression — [[graft.text.Unigram]]'s original Viterbi
 * rode the vocabulary as a `typedlit` MAP LITERAL inside an
 * interpreted `aggregate` fold, so a production 50k-piece model bloats
 * every plan that touches it (literal serialization per query) and
 * every row pays the interpreted higher-order dispatch. Here the model
 * lives in one [[UnigramRuntime]] reference object: plan size is
 * vocabulary-independent, the DP is compiled JVM code, and Zipf-shaped
 * corpora hit the bounded per-word memo.
 *
 * Semantics are EXACTLY the fold's combined-encoding integer Viterbi
 * (randomized fold-vs-runtime spec pin in `UnigramSpec`):
 * `d[0] = 0`, `d[i] = max_k d[i-k] + (lp(piece)·1024 − 1)` with
 * `lp` = the piece's micro-nat log-prob, `unkMicro` for unknown single
 * characters, the forbidden penalty for unknown multi-character
 * pieces; positions count CODE POINTS (Spark's `length`/`substr`
 * units, not UTF-16). The final cell unpacks to
 * `(score_micro, n_pieces)` with ties already resolved toward fewer
 * pieces by the 1024 encoding.
 */
final class UnigramRuntime(val pieces: java.util.HashMap[String, java.lang.Long],
    val maxPieceLen: Int, val unkMicro: Long) extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()

  /** (score_micro, n_pieces) of a word, memoized. */
  def score(word: String): Array[Long] = {
    val hit = cache.get(word)
    if (hit != null) return hit
    val r = scoreUncached(word)
    if (cache.size() >= UnigramRuntime.CacheCap) cache.clear()
    cache.put(word, r)
    r
  }

  private def scoreUncached(word: String): Array[Long] = {
    // code-point boundaries: offs(i) = UTF-16 index of code point i
    val n = word.codePointCount(0, word.length)
    if (n == 0) return Array(0L, 0L)
    val offs = new Array[Int](n + 1)
    var u = 0
    var i = 0
    while (i < n) { offs(i) = u; u = word.offsetByCodePoints(u, 1); i += 1 }
    offs(n) = word.length
    val d = new Array[Long](n + 1)
    i = 1
    while (i <= n) {
      var best = Long.MinValue
      var k = 1
      val kMax = math.min(maxPieceLen, i)
      while (k <= kMax) {
        val piece = word.substring(offs(i - k), offs(i))
        val lpBoxed = pieces.get(piece)
        val lp: Long =
          if (lpBoxed != null) lpBoxed.longValue()
          else if (k == 1) unkMicro
          else graft.text.Unigram.ForbiddenMicro
        val cand = d(i - k) + lp * 1024L - 1L
        if (cand > best) best = cand
        k += 1
      }
      d(i) = best
      i += 1
    }
    val c = d(n)
    val np = java.lang.Math.floorMod(-c, 1024L)
    Array((c + np) / 1024L, np)
  }

  /** The best-path SEGMENTATION of a word — the same combined-encoding
    * forward DP as [[score]], backtracked with the SMALLEST-k rule:
    * at each cut position, the shortest piece length whose predecessor
    * cell reproduces the cell value is taken. Any such k lies on an
    * optimal path (the combined encoding already folded the
    * fewer-pieces tie-break into the values), and smallest-k makes the
    * choice deterministic — the DuckDB EM oracle walks back with the
    * same rule, so the two engines always emit the same pieces.
    * Unknown single characters appear as pieces (scored `unkMicro` on
    * the path); the caller decides whether they count. Empty → empty. */
  def segment(word: String): Array[String] = {
    val n = word.codePointCount(0, word.length)
    if (n == 0) return Array.empty
    val offs = new Array[Int](n + 1)
    var u = 0
    var i = 0
    while (i < n) { offs(i) = u; u = word.offsetByCodePoints(u, 1); i += 1 }
    offs(n) = word.length
    val d = new Array[Long](n + 1)
    i = 1
    while (i <= n) {
      var best = Long.MinValue
      var k = 1
      val kMax = math.min(maxPieceLen, i)
      while (k <= kMax) {
        val piece = word.substring(offs(i - k), offs(i))
        val lpBoxed = pieces.get(piece)
        val lp: Long =
          if (lpBoxed != null) lpBoxed.longValue()
          else if (k == 1) unkMicro
          else graft.text.Unigram.ForbiddenMicro
        val cand = d(i - k) + lp * 1024L - 1L
        if (cand > best) best = cand
        k += 1
      }
      d(i) = best
      i += 1
    }
    val out = List.newBuilder[String]
    var p = n
    while (p > 0) {
      var k = 1
      var found = 0
      val kMax = math.min(maxPieceLen, p)
      while (found == 0 && k <= kMax) {
        val piece = word.substring(offs(p - k), offs(p))
        val lpBoxed = pieces.get(piece)
        val lp: Long =
          if (lpBoxed != null) lpBoxed.longValue()
          else if (k == 1) unkMicro
          else graft.text.Unigram.ForbiddenMicro
        if (d(p - k) + lp * 1024L - 1L == d(p)) found = k
        k += 1
      }
      // found is always set: d(p) was produced by one of these k
      out += word.substring(offs(p - found), offs(p))
      p -= found
    }
    out.result().reverse.toArray
  }

  /** Trained-subword token count of a whole text (single-space
    * tokenization, the [[graft.text.TextFunctions.tokens]] twin). */
  def countText(text: String): Long = {
    val words = text.split(" ", -1)
    var total = 0L
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) total += score(words(i))(1)
      i += 1
    }
    total
  }
}

object UnigramRuntime {
  private val CacheCap = 1 << 16
}

/** `word -> struct(score_micro, n_pieces)` under the runtime model. */
case class UnigramWordScore(child: Expression, runtime: UnigramRuntime)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("score_micro", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    UnigramWordScore.compute(input.asInstanceOf[UTF8String], runtime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = ctx.addReferenceObj("unigramRuntime", runtime, classOf[UnigramRuntime].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramWordScore.compute($c, $rt)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramWordScore =
    copy(child = newChild)

  override def prettyName: String = "unigram_word_score"
}

object UnigramWordScore {
  def score(word: Column, runtime: UnigramRuntime): Column =
    ColumnBridge.column(UnigramWordScore(ColumnBridge.expression(word), runtime))

  /** Called from generated code. */
  def compute(word: UTF8String, rt: UnigramRuntime): InternalRow = {
    val r = rt.score(word.toString)
    InternalRow(r(0), r(1))
  }
}

/** `text -> long`: total trained-subword count across the text. */
case class UnigramCountOf(child: Expression, runtime: UnigramRuntime)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    UnigramCountOf.compute(input.asInstanceOf[UTF8String], runtime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rt = ctx.addReferenceObj("unigramRuntime", runtime, classOf[UnigramRuntime].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramCountOf.compute($c, $rt)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramCountOf =
    copy(child = newChild)

  override def prettyName: String = "unigram_token_count"
}

object UnigramCountOf {
  def count(text: Column, runtime: UnigramRuntime): Column =
    ColumnBridge.column(UnigramCountOf(ColumnBridge.expression(text), runtime))

  /** Called from generated code. */
  def compute(text: UTF8String, rt: UnigramRuntime): Long =
    rt.countText(text.toString)
}
