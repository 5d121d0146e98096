package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit
import graft.similarity.{ProductQuantizer, RecallProbe, Similarity}

class ProductQuantizerSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "ProductQuantizer"

  private lazy val vecs = RecallProbe.corpus(spark).cache()
  private lazy val queries = vecs.where(col("vec_id") % 10 === 3)
  private lazy val cb =
    ProductQuantizer.train(vecs, "vec_id", "embedding", m = 8, ksub = 16, iters = 3)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  it should "train codebooks with the declared shape" in {
    cb.dim shouldBe 32
    cb.m shouldBe 8
    cb.dsub shouldBe 4
    cb.ksub shouldBe 16
    all(cb.cents.flatten.map(_.length)) shouldBe cb.dsub
  }

  it should "retrieve the exact top-10 on clustered data with a 2k shortlist" in {
    // the production claim: on data with actual neighborhood structure
    // (8 separated clusters) the ADC ranking needs only a ~2k shortlist
    // for full recall — the gate row's unbounded shortlist is the
    // data-independent fallback, not the expected operating point
    val exact = pairs(Similarity.cosineTopK(queries, vecs, "vec_id", "embedding", 10))
    val pq = pairs(ProductQuantizer.topK(
      queries, vecs, "vec_id", "embedding", 10, cb, shortlist = 20))
    pq.intersect(exact).size.toDouble / exact.size should be >= 0.9
  }

  it should "equal brute force rank-for-rank with an unbounded shortlist" in {
    // structural exactness: every candidate passes the exact re-rank, so
    // the result cannot depend on ADC scores or codebook quality
    val exact = Similarity.cosineTopK(queries, vecs, "vec_id", "embedding", 10)
      .select("qid", "cid", "cos_r6", "rnk")
    val pq = ProductQuantizer.topK(
      queries, vecs, "vec_id", "embedding", 10, cb, shortlist = Int.MaxValue)
      .select("qid", "cid", "cos_r6", "rnk")
    SparkTestKit.assertDataFrameEquals(pq, exact)
  }

  it should "emit exact cosines for every shortlisted pair" in {
    // even a tiny shortlist yields EXACT scores — only retrieval is
    // approximate (the emitted-pairs-are-exact contract of the family)
    val pq = ProductQuantizer.topK(
      queries, vecs, "vec_id", "embedding", 5, cb, shortlist = 5)
    val exactAll = Similarity.cosineTopK(queries, vecs, "vec_id", "embedding", 100)
      .select(col("qid"), col("cid"), col("cos_r6").as("cos_exact"))
    val joined = pq.join(exactAll, Seq("qid", "cid"), "left")
    joined.where(col("cos_exact").isNull || col("cos_r6") =!= col("cos_exact"))
      .count() shouldBe 0L
  }

  it should "encode a 100k-copy duplicate vector without exploding the code width" in {
    // codes are m ints regardless of data: the compression contract
    val codes = vecs.select(
      ProductQuantizer.encodeCol(cb, transform(col("embedding"), _.cast("double"))).as("c"))
    codes.select(org.apache.spark.sql.functions.size(col("c")))
      .distinct().as[Int].collect().toSeq shouldBe Seq(cb.m)
    // all codes within [0, ksub)
    codes.select(explode(col("c")).as("x"))
      .where(col("x") < 0 || col("x") >= cb.ksub).count() shouldBe 0L
  }

  it should "reject a shortlist smaller than k and a dim not divisible by m" in {
    an[IllegalArgumentException] should be thrownBy
      ProductQuantizer.topK(queries, vecs, "vec_id", "embedding", 10, cb, shortlist = 5)
    an[IllegalArgumentException] should be thrownBy
      ProductQuantizer.train(vecs, "vec_id", "embedding", m = 5, ksub = 4, iters = 1)
  }
}
