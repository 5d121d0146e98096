package graft.dedup

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Semantic-decontamination contract: a corpus row is flagged iff its
 * rounded cosine against SOME benchmark embedding clears tau; hit
 * counts are exact, best = (cos desc, bench id asc); unflagged rows
 * emit nothing; and the benchmark side rides a broadcast so the corpus
 * never shuffles — the digest decontam's scale contract in embedding
 * space.
 */
class DecontamSemanticSpec extends AnyFlatSpec
    with Matchers with AdaptiveSparkPlanHelper {
  import SparkTestKit.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, Seq(1.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f)),
    (3L, Seq(0.6f, 0.8f))).toDF("id", "vec")

  behavior of "Dedup.decontamSemantic"

  it should "flag hits with exact counts and the deterministic best" in {
    val bench = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.8f, 0.6f)))
      .toDF("bid", "bvec")
    val out = Dedup.decontamSemantic(corpus, "id", "vec",
        bench, "bid", "bvec", tau = 0.9)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // doc 1: cos 1.0 vs 10, 0.8 vs 11 -> one hit; doc 3: 0.96 vs 11
    out.map(r => (r._1, r._2, r._3)) shouldBe Array((1L, 1L, 10L), (3L, 1L, 11L))
    out(0)._4 shouldBe 1.0
    out(1)._4 shouldBe 0.96
  }

  it should "break best ties toward the smaller benchmark id" in {
    val bench = Seq((12L, Seq(1.0f, 0.0f)), (10L, Seq(2.0f, 0.0f)))
      .toDF("bid", "bvec") // same direction, both cos 1.0 with doc 1
    val out = Dedup.decontamSemantic(corpus, "id", "vec",
        bench, "bid", "bvec", tau = 0.99)
      .as[(Long, Long, Long, Double)].collect().toList
    out shouldBe List((1L, 2L, 10L, 1.0))
  }

  it should "emit nothing when no pair clears tau" in {
    val bench = Seq((10L, Seq(-1.0f, 0.0f))).toDF("bid", "bvec")
    Dedup.decontamSemantic(corpus, "id", "vec", bench, "bid", "bvec",
      tau = 0.5).count() shouldBe 0L
  }

  it should "broadcast the benchmark side (corpus never shuffles)" in {
    val bench = Seq((10L, Seq(1.0f, 0.0f))).toDF("bid", "bvec")
    val plan = Dedup.decontamSemantic(corpus, "id", "vec",
      bench, "bid", "bvec", tau = 0.5).queryExecution.executedPlan
    collectFirst(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    } should not be empty
  }

  it should "reject tau outside [-1, 1]" in {
    val bench = Seq((10L, Seq(1.0f, 0.0f))).toDF("bid", "bvec")
    an[IllegalArgumentException] should be thrownBy
      Dedup.decontamSemantic(corpus, "id", "vec", bench, "bid", "bvec", 1.5)
  }
}
