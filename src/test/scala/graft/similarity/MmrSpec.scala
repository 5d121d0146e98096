package graft.similarity

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

/** Pins [[Similarity.mmrRerank]]: the greedy diversified order on a
  * hand-built geometry, the λ=1 pure-relevance degeneration, and the
  * raw-objective (not truncated) argmax. */
class MmrSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  // query (0.8, 0.6); A points along x, B near C's direction but more
  // relevant, C most relevant. Plain top-2 = (C, B); MMR at λ=0.5 must
  // swap B out for the more-different A at rank 2.
  private val queries = Seq((100L, Seq(0.8f, 0.6f))).toDF("id", "vec")
  private val cands = Seq(
    (1L, Seq(1.0f, 0.0f)),       // A: rel ~0.800, far from C
    (2L, Seq(0.99f, 0.14f)),     // B: rel ~0.876, close to C? no — close to A
    (3L, Seq(0.7f, 0.71f)))      // C: rel ~0.989
    .toDF("id", "vec")

  behavior of "Similarity.mmrRerank"

  it should "diversify: rank 2 trades relevance for distance" in {
    val out = Similarity.mmrRerank(queries, cands, "id", "vec",
      k = 3, shortlist = 3, lambdaPpm = 500000L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).toList
    out.map(_._2) shouldBe List(1L, 2L, 3L)
    // C first (most relevant), then A (B is more relevant than A but
    // nearly collinear with A; A is farther from C), then B
    out.map(_._3) shouldBe List(3L, 1L, 2L)
    // later objectives can go negative (similarity dominates) — the
    // integer contract must carry them
    out.last._4 should be < out.head._4
  }

  it should "degenerate to pure relevance order at lambda = 1e6" in {
    val mmr = Similarity.mmrRerank(queries, cands, "id", "vec",
      k = 3, shortlist = 3, lambdaPpm = 1000000L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).map(_._3).toList
    val topk = Similarity.cosineTopK(queries, cands, "id", "vec", k = 3)
      .orderBy("rnk").as[(Long, Long, Double, Long)].collect()
      .map(_._2).toList
    mmr shouldBe topk
    // and rank-1 mmr_u equals the full relevance in micro-units
    val r1 = Similarity.mmrRerank(queries, cands, "id", "vec",
      k = 1, shortlist = 3, lambdaPpm = 1000000L)
      .as[(Long, Long, Long, Long)].collect().head
    val bestCos = Similarity.cosineTopK(queries, cands, "id", "vec", k = 1)
      .as[(Long, Long, Double, Long)].collect().head._3
    r1._4 shouldBe math.round(bestCos * 1e6)
  }

  it should "validate parameters" in {
    an[IllegalArgumentException] should be thrownBy
      Similarity.mmrRerank(queries, cands, "id", "vec", k = 5, shortlist = 3)
    an[IllegalArgumentException] should be thrownBy
      Similarity.mmrRerank(queries, cands, "id", "vec", k = 1,
        shortlist = 1, lambdaPpm = 2000000L)
  }
}
