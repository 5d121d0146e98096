package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class IvfPqSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  // clustered corpus: 4 well-separated directions with small jitter —
  // deterministic (no RNG), cluster structure IVF can actually exploit
  private lazy val vecs = {
    val base = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0, 1.0))
    (0 until 120).map { i =>
      val b = base(i % 4)
      (i.toLong, b.zipWithIndex.map { case (x, d) =>
        x + 0.03 * (((i * 7 + d * 13) % 11) - 5)
      })
    }.toDF("vec_id", "embedding")
  }

  behavior of "IvfPq.topK"

  it should "equal brute force rank-for-rank at nprobe = nlist and unbounded shortlist" in {
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding", nlist = 4, iters = 3)
    val cb = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 4, ksub = 8, iters = 2)
    val exact = Similarity.cosineTopK(
        vecs.where($"vec_id" < 8), vecs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    val got = IvfPq.topK(
        vecs.where($"vec_id" < 8), vecs, cents, "vec_id", "embedding",
        k = 5, cb, nprobe = 4, shortlist = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted
    got shouldBe exact
  }

  it should "keep high recall probing a strict cell subset of a clustered corpus" in {
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding", nlist = 4, iters = 3)
    val cb = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 4, ksub = 8, iters = 2)
    val exact = Similarity.cosineTopK(
        vecs.where($"vec_id" < 8), vecs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = IvfPq.topK(
        vecs.where($"vec_id" < 8), vecs, cents, "vec_id", "embedding",
        k = 5, cb, nprobe = 2, shortlist = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    recall should be >= 0.8 // neighbors live in the query's own cluster
  }

  it should "validate parameters and refuse an empty quantizer" in {
    val cb = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 4, ksub = 8, iters = 1)
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding", nlist = 4, iters = 1)
    an[IllegalArgumentException] should be thrownBy
      IvfPq.topK(vecs, vecs, cents, "vec_id", "embedding", k = 0, cb, 2, 10)
    an[IllegalArgumentException] should be thrownBy
      IvfPq.topK(vecs, vecs, cents, "vec_id", "embedding", k = 5, cb, 2, 3)
    an[IllegalArgumentException] should be thrownBy
      IvfPq.topK(vecs, vecs, cents.limit(0), "vec_id", "embedding", k = 5, cb, 2, 10)
  }
}
