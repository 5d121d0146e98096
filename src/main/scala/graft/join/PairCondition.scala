package graft.join

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.catalyst.expressions.{AttributeSeq, BindReferences, Expression}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Generalized extra join condition: an arbitrary Spark SQL boolean
 * expression over `left.<col>` / `right.<col>`, where `left` is the
 * iterated side and `right` the broadcast side.
 *
 * The reference hardcodes exactly two condition strings and throws on
 * anything else (reference: src/main/scala/me/valik/spark/transformer/
 * BroadcastSpatialJoin.scala:493-533, TODO at :509 asks for exactly this
 * generalization). Here the string is rewritten (`left.x` → `__l_x`),
 * analyzed by Catalyst against the two schemas (so implicit casts, e.g.
 * Int vs Long in `between`, resolve exactly as Spark SQL would), and bound
 * to a row-pair evaluator that runs inside the join kernel — per candidate
 * pair, before `nearest` selection, matching the reference's semantics
 * (its test :460-504 pins that the condition can divert a nearest match).
 */
object PairCondition {

  private val SideRef = raw"(?i)\b(left|right)\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)".r

  /** Copy of `s` with every character inside quoted regions ('...'
    * strings with backslash escapes, "..." and `...` quoted identifiers)
    * replaced by a space — so side-reference matching can never fire
    * inside a literal like `'left.handed'`. Quote characters themselves
    * are preserved, so match positions in the masked string map 1:1 onto
    * the original. */
  private def maskQuoted(s: String): String = {
    val arr = s.toCharArray
    var i = 0
    var quote: Char = 0
    while (i < arr.length) {
      val c = arr(i)
      if (quote == 0) {
        if (c == '\'' || c == '"' || c == '`') quote = c
      } else if (c == '\\' && quote != '`' && i + 1 < arr.length) {
        arr(i) = ' '; arr(i + 1) = ' '; i += 1 // skip the escaped char too
      } else if (c == quote) quote = 0
      else arr(i) = ' '
      i += 1
    }
    new String(arr)
  }

  private def replaceSideRefs(s: String)(repl: scala.util.matching.Regex.Match => String): String = {
    val sb = new StringBuilder
    var last = 0
    for (m <- SideRef.findAllMatchIn(maskQuoted(s))) {
      sb.append(s.substring(last, m.start)).append(repl(m))
      last = m.end
    }
    sb.append(s.substring(last)).toString
  }

  /** Column names referenced per side: (left columns, right columns). */
  def referencedColumns(condition: String): (Seq[String], Seq[String]) = {
    val refs = SideRef.findAllMatchIn(maskQuoted(condition))
      .map(m => (m.group(1).toLowerCase, m.group(2))).toSeq
    (refs.collect { case ("left", c) => c }.distinct,
      refs.collect { case ("right", c) => c }.distinct)
  }

  /** Rewrite `left.x` / `right.y` references with the given renamers —
    * used by the grid path, where the condition becomes a plain Catalyst
    * filter over the joined row instead of a pair evaluator. */
  def rewriteSides(condition: String, leftRef: String => String,
      rightRef: String => String): String =
    replaceSideRefs(condition)(m =>
      if (m.group(1).equalsIgnoreCase("left")) leftRef(m.group(2)) else rightRef(m.group(2)))

  /** Compile on the driver; None for an empty condition string. */
  def compile(
      spark: SparkSession,
      condition: String,
      leftSchema: StructType,
      rightSchema: StructType): Option[CompiledCondition] = {
    val trimmed = condition.trim
    if (trimmed.isEmpty) None
    else {
      val rewritten = replaceSideRefs(trimmed)(m =>
        (if (m.group(1).equalsIgnoreCase("left")) "`__l_" else "`__r_") + m.group(2) + "`")
      val merged = StructType(
        leftSchema.fields.map(f => f.copy(name = "__l_" + f.name)) ++
          rightSchema.fields.map(f => f.copy(name = "__r_" + f.name)))
      try {
        val empty = spark.createDataFrame(java.util.Collections.emptyList[Row](), merged)
        val analyzed = empty.filter(F.expr(rewritten)).queryExecution.analyzed
        val (cond, childOutput) = analyzed.collectFirst {
          case f: logical.Filter => (f.condition, f.child.output)
        }.getOrElse(throw new IllegalStateException("no Filter in analyzed plan"))
        // RuntimeReplaceable nodes (between, ilike, …) only run through their
        // replacement, and the replacement may use With/CommonExpressionRef
        // (subexpression sharing) — normally optimizer rules substitute both;
        // we interpret the expression directly, so inline them here.
        val executable = cond.transformDown {
          case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable => r.replacement
        }.transformUp {
          case w: org.apache.spark.sql.catalyst.expressions.With =>
            val defs = w.defs.map(d => d.id -> d.child).toMap
            w.child.transformUp {
              case ref: org.apache.spark.sql.catalyst.expressions.CommonExpressionRef
                  if defs.contains(ref.id) => defs(ref.id)
            }
        }
        val bound = BindReferences.bindReference(executable, AttributeSeq(childOutput))
        Some(CompiledCondition(bound, leftSchema, rightSchema))
      } catch {
        case e: IllegalArgumentException => throw e
        case e: Exception =>
          throw new IllegalArgumentException(
            s"Spatial join transformer error: unknown extra condition `$trimmed`: ${e.getMessage}", e)
      }
    }
  }

  /**
   * Equi-conjunct extraction for the GRID path (round-12 scale fix,
   * the DataFrame-level twin of BroadcastSpatialJoinExec.equiSplit):
   * every conjunct of a condition Column shaped
   * `leftOnlyExpr = rightOnlyExpr` (sides detected by referenced
   * column NAME against the two frames' disjoint column sets) yields a
   * (leftKey, rightKey) Column pair the caller composes into its JOIN
   * keys — restricting candidate generation to key-equal rows, which
   * is a pure superset-filter optimization when the caller KEEPS the
   * full condition as the per-candidate predicate. Note the null
   * semantics do NOT match on their own: Spark struct equality treats
   * null-valued fields as equal (struct(null) = struct(null) is TRUE)
   * while SQL `=` is never true on null — the key join OVER-matches on
   * null keys, and correctness rests entirely on the caller
   * re-evaluating the full condition per candidate. Never drop that
   * recheck (no pure-equi fast path on this DataFrame-level kernel).
   * Conjuncts whose reference sets straddle sides, reference neither
   * side, or fail to resolve are simply not factored — the caller's
   * behavior without any factorable conjunct is unchanged.
   *
   * ANSI caveat: callers evaluate the returned key columns EAGERLY
   * over every row of their frames, while the unfactored path only
   * evaluates the condition on spatial-candidate pairs — a key
   * sub-expression that throws under ANSI mode (e.g. a cast overflow)
   * on a row the unfactored path would never pair would fail the whole
   * query. The row-level broadcast kernel degrades to its flat path at
   * runtime (BroadcastSpatialJoinExec catches and falls back); this
   * DataFrame-level path cannot wrap per-row evaluation, so grid
   * callers pass `ansiSafeOnly = true` under ANSI mode and only
   * conjuncts whose moved expressions statically [[neverThrows]] are
   * factored — the rest stay in the full condition, byte-identical to
   * the unfactored path (ADVICE r13).
   */
  def equiKeys(spark: SparkSession, cond: org.apache.spark.sql.Column,
      leftSchema: StructType, rightSchema: StructType,
      ansiSafeOnly: Boolean = false)
      : Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
    splitAnalyzed(spark, cond, leftSchema, rightSchema) match {
      case None => Nil
      case Some((cs, sides, toColumn)) =>
        // `=` keys over-match on null struct fields (superset filter;
        // the caller's full-condition recheck makes them exact); `<=>`
        // keys match Spark struct-equality semantics EXACTLY (null
        // fields compare equal on both), so null-safe equality factors
        // under the same discipline with zero extra machinery
        def pick(a: Expression, b: Expression)
            : Option[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] =
          if (!a.deterministic || !b.deterministic) None
          else if (ansiSafeOnly && !(neverThrows(a) && neverThrows(b))) None
          else (sides(a), sides(b)) match {
            case ((true, false), (false, true)) => Some((toColumn(a), toColumn(b)))
            case ((false, true), (true, false)) => Some((toColumn(b), toColumn(a)))
            case _ => None
          }
        cs.flatMap {
          case EqualTo(a, b) => pick(a, b)
          case EqualNullSafe(a, b) => pick(a, b)
          case _ => None
        }
    }
  }

  /**
   * Single-sided deterministic conjuncts of the condition, rebuilt as
   * standalone Columns: (`AND` of left-only conjuncts, `AND` of
   * right-only conjuncts). A right-only conjunct (e.g. a literal
   * IN-list `right.k IN (1, 2, 3)`) can pre-filter the indexed side —
   * rows failing it can never satisfy the full condition — and a
   * left-only one can pre-filter probes on an INNER join. Pure
   * superset-filter restrictions under the same discipline as
   * equiKeys: the caller must still evaluate the full condition per
   * candidate, and null evaluates as NOT-matching (SQL boolean filter
   * semantics) on both the pre-filter and the full condition, so the
   * split cannot change the result. Conjuncts with no column
   * references at all (constants, nondeterministic) are never moved.
   * Same ANSI eager-evaluation caveat as equiKeys.
   */
  def sideOnly(spark: SparkSession, cond: org.apache.spark.sql.Column,
      leftSchema: StructType, rightSchema: StructType,
      ansiSafeOnly: Boolean = false)
      : (Option[org.apache.spark.sql.Column], Option[org.apache.spark.sql.Column]) =
    splitAnalyzed(spark, cond, leftSchema, rightSchema) match {
      case None => (None, None)
      case Some((cs, sides, toColumn)) =>
        val det = cs.filter(_.deterministic)
          .filter(e => !ansiSafeOnly || neverThrows(e))
        val ls = det.filter(e => sides(e) == ((true, false))).map(toColumn)
        val rs = det.filter(e => sides(e) == ((false, true))).map(toColumn)
        (ls.reduceOption(_ && _), rs.reduceOption(_ && _))
    }

  /**
   * Whether an extra join condition may be FUSED as the gate of a
   * [[graft.functions.GatedAnd]] around an expensive refine expression
   * (round 14): fusing makes the condition run on every
   * candidate-surviving pair where the unfused path's optimizer-chosen
   * conjunct order might have evaluated it on fewer (behind the
   * refine's short-circuit). Safe only when every conjunct is
   * deterministic (a second per-pair evaluation of a nondeterministic
   * condition changes results) and, under ANSI mode, statically
   * throw-free (the eager-evaluation regression class of equiKeys: a
   * throwing conjunct on a pair the unfused order never evaluated it
   * on would fail the whole query). Unresolvable conditions are
   * conservatively unsafe.
   */
  def fusionSafe(spark: SparkSession, cond: org.apache.spark.sql.Column,
      leftSchema: StructType, rightSchema: StructType,
      ansiOn: Boolean): Boolean =
    splitAnalyzed(spark, cond, leftSchema, rightSchema) match {
      case None => false
      case Some((cs, _, _)) =>
        cs.forall(e => e.deterministic && (!ansiOn || neverThrows(e)))
    }

  /**
   * Conservative static throw-safety: true only when evaluating `e`
   * can never throw on ANY input row, so callers may evaluate it
   * EAGERLY frame-wide under ANSI mode (the factoring regression
   * class: an eager key throwing on a row the unfactored path never
   * pairs). Whitelist, not blacklist — attribute refs, literals,
   * always-safe casts (Cast.canUpCast), struct build/field access,
   * null predicates, boolean connectives, comparisons, IN-lists,
   * coalesce/least/greatest, simple string functions, float-typed
   * arithmetic (IEEE semantics — no ANSI error even at /0), and
   * integral `%`/`pmod` by a non-zero literal (the one arithmetic
   * shape with no ANSI failure case: Long.MinValue % -1 is 0 in
   * two's complement, unlike division). Integral/decimal add, subtract,
   * multiply, divide (overflow / divide-by-zero), down-casts, string
   * parsing, UDFs and everything unrecognized are assumed throwing.
   */
  def neverThrows(e: Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}
    def floatLike(dt: DataType): Boolean = dt == DoubleType || dt == FloatType
    def nonZeroLiteral(x: Expression): Boolean = x match {
      case Literal(n: java.lang.Number, _) => n.doubleValue != 0.0
      case _ => false
    }
    e match {
      case _: AttributeReference | _: BoundReference | _: Literal => true
      case a: Alias => neverThrows(a.child)
      case c: Cast => Cast.canUpCast(c.child.dataType, c.dataType) && neverThrows(c.child)
      case s: CreateNamedStruct => s.valExprs.forall(neverThrows)
      case g: GetStructField => neverThrows(g.child)
      case _: IsNull | _: IsNotNull | _: Not | _: And | _: Or |
           _: EqualTo | _: EqualNullSafe | _: LessThan | _: LessThanOrEqual |
           _: GreaterThan | _: GreaterThanOrEqual | _: In | _: InSet |
           _: Coalesce | _: Least | _: Greatest |
           _: Upper | _: Lower | _: Length =>
        e.children.forall(neverThrows)
      case r: Remainder if nonZeroLiteral(r.right) => neverThrows(r.left)
      case p: Pmod if nonZeroLiteral(p.right) => neverThrows(p.left)
      case b @ (_: Add | _: Subtract | _: Multiply | _: Divide | _: UnaryMinus)
          if floatLike(b.dataType) =>
        e.children.forall(neverThrows)
      case _ => false
    }
  }

  /** Analyzed-conjunct machinery shared by equiKeys/sideOnly. The Spark
    * 4 Column API carries a LAZY column-node tree (its catalyst shape
    * only exists post-analysis), so every split runs on the ANALYZED
    * condition — the compile() discipline above: filter an empty frame
    * with the concatenated (disjoint-name) schema and take the Filter's
    * condition, with implicit casts already placed. Returns the
    * conjunct list, a side classifier (references left? / right? — an
    * attribute from neither side counts as both: never factored), and
    * a rebuilder from resolved sub-expressions to by-name Columns. */
  private def splitAnalyzed(spark: SparkSession, cond: org.apache.spark.sql.Column,
      leftSchema: StructType, rightSchema: StructType)
      : Option[(Seq[Expression], Expression => (Boolean, Boolean),
                Expression => org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference}
    import org.apache.spark.sql.graft.ColumnBridge
    try {
      val merged = StructType(leftSchema.fields ++ rightSchema.fields)
      val empty = spark.createDataFrame(java.util.Collections.emptyList[Row](), merged)
      val analyzed = empty.filter(cond).queryExecution.analyzed
      analyzed.collectFirst {
        case f: logical.Filter => (f.condition, f.child.output)
      }.map { case (condExpr, childOutput) =>
        val leftIds = childOutput.take(leftSchema.length).map(_.exprId).toSet
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case And(a, b) => conjuncts(a) ++ conjuncts(b)
          case x => Seq(x)
        }
        val rightIds = childOutput.drop(leftSchema.length).map(_.exprId).toSet
        def sides(e: Expression): (Boolean, Boolean) = {
          var hasL = false; var hasR = false
          e.foreach {
            case a: AttributeReference =>
              if (leftIds(a.exprId)) hasL = true
              else if (rightIds(a.exprId)) hasR = true
              else { hasL = true; hasR = true }
            case _ =>
          }
          (hasL, hasR)
        }
        // resolved attrs → by-name unresolved columns (names are plain
        // and disjoint by the grid operator's contract), preserving the
        // analyzer's casts inside the sub-expression
        def toColumn(e: Expression): org.apache.spark.sql.Column =
          ColumnBridge.column(e.transformUp {
            // quoted: UnresolvedAttribute(name) would parse dots as path
            // separators, so a literal column name like "u.k" could
            // silently re-resolve to a same-typed struct FIELD u.k and
            // key-restrict the join on the wrong values
            case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
          })
        (conjuncts(condExpr), sides _, toColumn _)
      }
    } catch { case _: Exception => None }
  }
}

/**
 * A bound pair predicate over the concatenated (left ++ right) row —
 * `bound` contains only BoundReferences/literals/functions, evaluated
 * natively on InternalRows inside graft.plans.BroadcastSpatialJoinExec.
 */
final case class CompiledCondition(
    bound: Expression,
    leftSchema: StructType,
    rightSchema: StructType)
