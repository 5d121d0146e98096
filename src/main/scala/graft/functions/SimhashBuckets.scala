package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Random-hyperplane (SimHash) LSH bucket ids for a double-vector column:
 * one `planes`-bit sign-pattern bucket per hash table, as a codegen'd
 * native expression. Plane components are splitmix64-derived pseudo-random
 * values in [-0.5, 0.5) keyed by (table, plane, dimension) — stateless,
 * deterministic across executors, and ~1000× cheaper than the md5-per-
 * component composed-expression formulation.
 */
case class SimhashBuckets(child: Expression, planes: Int, tables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes >= 1 && planes <= 62 && tables >= 1, s"bad planes=$planes tables=$tables")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimhashBuckets.compute(input.asInstanceOf[ArrayData], planes, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
        graft.functions.SimhashBuckets.compute($c, $planes, $tables);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }""")

  override protected def withNewChildInternal(n: Expression): SimhashBuckets = copy(child = n)
  override def prettyName: String = "simhash_buckets"
}

object SimhashBuckets {

  def simhashBuckets(vec: Column, planes: Int, tables: Int): Column =
    ColumnBridge.column(SimhashBuckets(ColumnBridge.expression(vec), planes, tables))

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Pseudo-random plane component in [-0.5, 0.5). `private[graft]` so
    * the oracle builder can embed the SAME weights as SQL literals —
    * the LSH gate's DuckDB replay recomputes the bucket bits from
    * these exact doubles (Double.toString round-trips bit-exactly
    * through DuckDB's decimal parser). */
  private[graft] def w(table: Int, plane: Int, dim: Int): Double =
    (mix((table.toLong << 40) ^ (plane.toLong << 20) ^ dim.toLong) >>> 11).toDouble /
      9007199254740992.0d - 0.5d // 2^53

  /** Called from generated code. Returns null for a null element —
    * matching VectorDot's null semantics (a silently-skipped component
    * would hash corrupt vectors into plausible buckets). */
  def compute(vec: ArrayData, planes: Int, tables: Int): ArrayData = {
    val n = vec.numElements()
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return null; i += 1 }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        var proj = 0.0d
        var j = 0
        while (j < n) { proj += vec.getDouble(j) * w(t, p, j); j += 1 }
        bucket = bucket * 2 + (if (proj >= 0) 1L else 0L)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
