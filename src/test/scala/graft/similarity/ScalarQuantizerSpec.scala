package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class ScalarQuantizerSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def vecsDF(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong,
      Array.fill(dim)((rnd.nextDouble() * 4 - 2).toFloat))).toDF("vec_id", "embedding")
  }

  behavior of "ScalarQuantizer"

  it should "bound reconstruction error by scale/2 per dimension" in {
    val df = vecsDF(50, 8, 1)
    val p = ScalarQuantizer.train(df, "embedding")
    val err = df.select(
        ScalarQuantizer.decodeCol(p, ScalarQuantizer.encodeCol(p, col("embedding"))).as("d"),
        col("embedding").cast("array<double>").as("v"))
      .select(posexplode(zip_with(col("d"), col("v"), (a, b) => abs(a - b))))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    err.foreach { case (pos, e) =>
      e should be <= p.scale(pos) / 2 + 1e-12
    }
  }

  it should "encode a constant dimension losslessly and clamp out-of-range values" in {
    val df = Seq((0L, Array(1.5f, -3f)), (1L, Array(1.5f, 3f))).toDF("vec_id", "embedding")
    val p = ScalarQuantizer.train(df, "embedding")
    p.scale(0) shouldBe 0.0
    val dec = df.orderBy("vec_id").select(
      ScalarQuantizer.decodeCol(p, ScalarQuantizer.encodeCol(p, col("embedding"))))
      .collect().map(_.getSeq[Double](0))
    dec.foreach(_.head shouldBe 1.5 +- 1e-12) // constant dim exact
    // values outside the trained range clamp to the boundary codes
    val out = Seq((9L, Array(99f, 0f))).toDF("vec_id", "embedding")
      .select(ScalarQuantizer.encodeCol(p, col("embedding"))).head.getSeq[Byte](0)
    out.head shouldBe (-128: Byte) // constant dim
    val big = Seq((9L, Array(1.5f, 999f))).toDF("vec_id", "embedding")
      .select(ScalarQuantizer.encodeCol(p, col("embedding"))).head.getSeq[Byte](0)
    big(1) shouldBe (127: Byte)
  }

  it should "equal brute force rank-for-rank at an unbounded shortlist" in {
    val df = vecsDF(60, 8, 7)
    val p = ScalarQuantizer.train(df, "embedding")
    val q = df.where(col("vec_id") < 5)
    val exact = Similarity.cosineTopK(q, df, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val sq = ScalarQuantizer.topK(q, df, "vec_id", "embedding", k = 5,
        p, shortlist = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    sq shouldBe exact
  }

  it should "keep high recall at a bounded shortlist" in {
    val df = vecsDF(200, 8, 11)
    val p = ScalarQuantizer.train(df, "embedding")
    val q = df.where(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, df, "vec_id", "embedding", k = 10)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = ScalarQuantizer.topK(q, df, "vec_id", "embedding", k = 10,
        p, shortlist = 20)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = sq.intersect(exact).size.toDouble / exact.size
    recall should be >= 0.9
  }

  it should "round-trip parameters through the persistable frame and validate input" in {
    val df = vecsDF(20, 4, 3)
    val p = ScalarQuantizer.train(df, "embedding")
    val p2 = ScalarQuantizer.paramsFrom(ScalarQuantizer.paramsDF(spark, p))
    p2 shouldBe p
    an[IllegalArgumentException] should be thrownBy
      ScalarQuantizer.paramsFrom(
        ScalarQuantizer.paramsDF(spark, p).where(col("pos") =!= 1))
    an[IllegalArgumentException] should be thrownBy
      ScalarQuantizer.topK(df, df, "vec_id", "embedding", k = 10, p, shortlist = 5)
  }
}
