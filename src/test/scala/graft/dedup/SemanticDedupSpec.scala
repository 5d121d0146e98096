package graft.dedup

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * [[Dedup.semanticDedup]] contract: deterministic md5-sampled seeds,
 * nearest-seed cell assignment on round-6 cosine with ties to the
 * smallest seed id, and a duplicate flag iff a smaller-id row in the
 * same cell clears the tau cosine — partition-layout independent.
 */
class SemanticDedupSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def vecs(rows: (Long, Array[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  behavior of "Dedup.semanticDedup"

  it should "group identical vectors into one cell and flag the larger ids" in {
    val e1 = Array(1.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0)
    val df = vecs((1L, e1), (2L, e2), (3L, e1), (4L, e2))
    // k = N: every row is a seed; an identical twin's best cosine is 1.0
    // against BOTH copies, tie to the smaller seed id — same cell
    val got = Dedup.semanticDedup(df, "vec_id", "embedding", k = 4, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)
    got shouldBe Seq((1L, 1L, false), (2L, 2L, false), (3L, 1L, true), (4L, 2L, true))
  }

  it should "not flag near-orthogonal cell-mates below tau" in {
    // both assigned near seed 1's direction but only 0.6 cosine apart
    val df = vecs(
      (1L, Array(1.0, 0.1, 0.0)),
      (2L, Array(1.0, -0.1, 0.0)),
      (3L, Array(-1.0, 0.0, 5.0)))
    val got = Dedup.semanticDedup(df, "vec_id", "embedding", k = 1, tau = 0.999)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSeq.sortBy(_._1)
    // k=1: everyone shares the single cell, but no pair clears 0.999
    got.map(_._2) shouldBe Seq(false, false, false)
  }

  it should "emit every input row exactly once and never flag a cell's minimum id" in {
    val rnd = new scala.util.Random(7)
    val df = vecs((1L to 60L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian()))): _*)
    val out = Dedup.semanticDedup(df, "vec_id", "embedding", k = 5, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    out.length shouldBe 60
    out.map(_._1).distinct.length shouldBe 60
    val minPerCell = out.groupBy(_._2).map { case (_, rs) => rs.minBy(_._1) }
    all(minPerCell.map(_._3)) shouldBe false
  }

  it should "be independent of input partitioning" in {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 40L).map(i => (i, Array.fill(6)(rnd.nextGaussian())))
    val a = Dedup.semanticDedup(vecs(rows: _*).repartition(1),
      "vec_id", "embedding", k = 4, tau = 0.4).collect().map(_.toSeq).toSet
    val b = Dedup.semanticDedup(vecs(rows: _*).repartition(17),
      "vec_id", "embedding", k = 4, tau = 0.4).collect().map(_.toSeq).toSet
    a shouldBe b
  }

  it should "reject invalid arguments loudly" in {
    val df = vecs((1L, Array(1.0)))
    an[IllegalArgumentException] should be thrownBy
      Dedup.semanticDedup(df, "vec_id", "embedding", k = 0)
    an[IllegalArgumentException] should be thrownBy
      Dedup.semanticDedup(df, "vec_id", "embedding", tau = 1.5)
  }
}
