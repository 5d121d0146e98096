package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class BinaryQuantizerSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def vecsDF(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat))).toDF("vec_id", "embedding")
  }

  behavior of "BinaryQuantizer"

  it should "pack sign bits against per-dimension mean thresholds" in {
    // 2 vectors, 3 dims: means are (0.5, 0, -1); bits = v > mean
    val df = Seq((0L, Array(1f, -2f, -1f)), (1L, Array(0f, 2f, -1f)))
      .toDF("vec_id", "embedding")
    val p = BinaryQuantizer.train(df, "embedding")
    p.thresholds.toSeq shouldBe Seq(0.5, 0.0, -1.0)
    p.words shouldBe 1
    val codes = df.orderBy("vec_id")
      .select(BinaryQuantizer.encodeCol(p, col("embedding")))
      .collect().map(_.getSeq[Long](0))
    // vec 0: dims (1 > 0.5, -2 > 0, -1 > -1) = (1, 0, 0) -> 0b001
    codes(0) shouldBe Seq(1L)
    // vec 1: (0 > 0.5, 2 > 0, -1 > -1) = (0, 1, 0) -> 0b010
    codes(1) shouldBe Seq(2L)
  }

  it should "pack more than 64 dimensions into multiple words" in {
    val df = vecsDF(20, 130, 3)
    val p = BinaryQuantizer.train(df, "embedding")
    p.words shouldBe 3
    val codes = df.select(BinaryQuantizer.encodeCol(p, col("embedding")))
      .collect().map(_.getSeq[Long](0))
    all(codes.map(_.size)) shouldBe 3
    // word 2 covers dims 128..129 only — bits 2..63 must stay clear
    codes.foreach(c => (c(2) & ~3L) shouldBe 0L)
  }

  it should "compute Hamming distance as popcount of xor" in {
    val df = Seq((Array(0L, 255L), Array(3L, 240L))).toDF("a", "b")
    df.select(BinaryQuantizer.hammingCol(col("a"), col("b")))
      .head.getLong(0) shouldBe (2 + 4) // xor = (3, 0b1111): 2 + 4 bits
  }

  it should "equal brute force rank-for-rank at an unbounded shortlist" in {
    val df = vecsDF(60, 8, 7)
    val p = BinaryQuantizer.train(df, "embedding")
    val q = df.where(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(q, df, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val bq = BinaryQuantizer.topK(q, df, "vec_id", "embedding", k = 5,
        p, shortlist = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    bq shouldBe exact
  }

  it should "recall well on clustered data at a bounded shortlist" in {
    // same clustered corpus discipline as the IVF/PQ recall pins
    RecallProbe.measureBinary(spark) should be >= 0.8
  }

  it should "round-trip params through the (pos, thr) frame" in {
    val df = vecsDF(30, 10, 11)
    val p = BinaryQuantizer.train(df, "embedding")
    BinaryQuantizer.paramsFrom(BinaryQuantizer.paramsDF(spark, p)) shouldBe p
  }

  it should "reject a gapped params frame and an undersized shortlist" in {
    val bad = Seq((0, 0.1), (2, 0.2)).toDF("pos", "thr")
    an[IllegalArgumentException] should be thrownBy BinaryQuantizer.paramsFrom(bad)
    val df = vecsDF(10, 4, 5)
    val p = BinaryQuantizer.train(df, "embedding")
    an[IllegalArgumentException] should be thrownBy
      BinaryQuantizer.topK(df, df, "vec_id", "embedding", k = 5, p, shortlist = 3)
  }
}
