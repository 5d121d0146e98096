package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/**
 * MinHash signature of a shingle array as one codegen'd Catalyst
 * expression: `numHashes` minima of affine universal hashes mod 2^31-1
 * over xxhash64(shingle) (seed 42, same base hash as Spark's `xxhash64`).
 *
 * The composed higher-order form (`transform(sequence(...), i ->
 * array_min(transform(hs, h -> pmod(h*a[i]+b[i], p))))`) evaluates
 * interpreted with per-element Column machinery — this loop is ~50×
 * cheaper and keeps the stage inside whole-stage codegen.
 */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1 && numHashes <= 64, s"numHashes in [1,64], got $numHashes")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinhashSignature.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

object MinhashSignature {

  /** Mersenne prime 2^31-1; products of field elements fit in a long. */
  val P: Long = 2147483647L

  /** Fixed multipliers in [1, p-1] and offsets in [0, p-1] (splitmix-style
    * LCG stream; any fixed values define a valid family). */
  val Coeff: Array[(Long, Long)] = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    Array.fill(64) {
      val a = java.lang.Long.remainderUnsigned(next(), P - 1) + 1
      val b = java.lang.Long.remainderUnsigned(next(), P)
      (a, b)
    }
  }
  private val As: Array[Long] = Coeff.map(_._1)
  private val Bs: Array[Long] = Coeff.map(_._2)

  /** Column-API entry point. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinhashSignature(ColumnBridge.expression(shingles), numHashes))

  /** Called from generated code — public, allocation-light. */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val u = shingles.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      val hp = java.lang.Math.floorMod(h, P)
      var j = 0
      while (j < numHashes) {
        val v = (As(j) * hp + Bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
