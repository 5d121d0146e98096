package graft.ml

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/** Pins [[IntKMeans]]: fixed-point quantization, md5-seeded init order,
  * nearest-centroid ties, truncating centroid updates, empty-cluster
  * retention, and the parameter guards. */
class IntKMeansSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "IntKMeans.assign"

  it should "separate two obvious blobs whatever the seed draw" in {
    val pts = Seq(
      (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.01f, 0.0f)), (3L, Seq(0.0f, 0.01f)),
      (11L, Seq(1.0f, 1.0f)), (12L, Seq(0.99f, 1.0f)), (13L, Seq(1.0f, 0.99f)))
      .toDF("id", "vec")
    val out = IntKMeans.assign(pts, "id", "vec", k = 2, rounds = 3)
      .as[(Long, Int, Long)].collect()
    val byCluster = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    byCluster.values.toSet shouldBe Set(Set(1L, 2L, 3L), Set(11L, 12L, 13L))
  }

  it should "be invariant to input partitioning (bit-identical ranks)" in {
    val pts = Seq.tabulate(40)(i =>
      (i.toLong, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 2.3).toFloat)))
    val a = IntKMeans.assign(pts.toDF("id", "vec"), "id", "vec", 3, 2)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    val b = IntKMeans.assign(pts.toDF("id", "vec").repartition(7), "id", "vec", 3, 2)
      .as[(Long, Int, Long)].collect().sortBy(_._1).toSeq
    a shouldBe b
  }

  it should "assign every input row exactly once" in {
    val pts = Seq.tabulate(25)(i => (i.toLong, Seq(i.toFloat / 25, 0.5f)))
      .toDF("id", "vec")
    val out = IntKMeans.assign(pts, "id", "vec", k = 4, rounds = 2)
    out.count() shouldBe 25L
    out.select("doc").distinct().count() shouldBe 25L
  }

  it should "truncate centroid updates toward zero (DuckDB // semantics)" in {
    // md5 order of ids 1,2,11,12 is 11 < 12 < 1 < 2, so the k=2 seeds
    // are doc 11 (negative blob) and doc 12 (positive blob). Round 1
    // groups {11, 1} and {12, 2}; the negative centroid update is
    // (-1 + -2) / 2 = -1 under truncation (floor would give -2), so
    // after the final assignment doc 11 (at -1) has d2 = 0 and doc 1
    // (at -2) has d2 = 1
    val pts = Seq(
      (11L, Seq(-0.000001f)), (1L, Seq(-0.000002f)),
      (12L, Seq(0.9f)), (2L, Seq(0.9f))).toDF("id", "vec")
    val out = IntKMeans.assign(pts, "id", "vec", k = 2, rounds = 1)
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r._3).toMap
    out(11L) shouldBe 0L
    out(1L) shouldBe 1L
  }

  it should "reject bad k, rounds, scale, and k > N" in {
    val pts = Seq((1L, Seq(0.1f)), (2L, Seq(0.2f))).toDF("id", "vec")
    an[IllegalArgumentException] should be thrownBy
      IntKMeans.assign(pts, "id", "vec", k = 1, rounds = 1)
    an[IllegalArgumentException] should be thrownBy
      IntKMeans.assign(pts, "id", "vec", k = 2, rounds = 0)
    an[IllegalArgumentException] should be thrownBy
      IntKMeans.assign(pts, "id", "vec", k = 2, rounds = 1, scale = 0)
    an[IllegalArgumentException] should be thrownBy
      IntKMeans.assign(pts, "id", "vec", k = 3, rounds = 1)
  }
}
