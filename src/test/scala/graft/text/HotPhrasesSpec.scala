package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Hot-phrase mining (boilerplate discovery): df semantics (a document
 * counts once however often it repeats a phrase), minDf pre-filter,
 * deterministic (df desc, phrase asc) ranking, and the plan-shape
 * guarantee that the top-k never runs a window sort over phrases.
 */
class HotPhrasesSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "TextFunctions.hotPhrases"

  it should "rank phrases by document frequency with df semantics" in {
    val docs = Seq(
      // "a b c" in 3 docs of src A (doc 3 repeats it — still df 3);
      // "x y z" in 2; "q r s" in 1 (below minDf=2)
      ("A", "a b c tail one"),
      ("A", "lead a b c"),
      ("A", "a b c a b c"),
      ("A", "x y z pad pad2"),
      ("A", "pre x y z"),
      ("A", "q r s"),
      ("B", "x y z only")
    ).toDF("src", "text")
    val out = TextFunctions.hotPhrases(docs, "src", "text", n = 3, k = 2, minDf = 2L)
      .orderBy("src", "rank")
      .as[(String, Int, String, Long)].collect()
    // src A: "a b c" df=3 rank 1, "x y z" df=2 rank 2; src B: nothing
    // reaches minDf
    out shouldBe Array(("A", 1, "a b c", 3L), ("A", 2, "x y z", 2L))
  }

  it should "break df ties by ascending phrase" in {
    val docs = Seq(
      ("A", "b b b"), ("A", "b b b"),
      ("A", "a a a"), ("A", "a a a"),
      ("A", "c c c"), ("A", "c c c")
    ).toDF("src", "text")
    val out = TextFunctions.hotPhrases(docs, "src", "text", n = 3, k = 2, minDf = 1L)
      .orderBy("rank").as[(String, Int, String, Long)].collect()
    out shouldBe Array(("A", 1, "a a a", 2L), ("A", 2, "b b b", 2L))
  }

  it should "reject a stratum column that collides with an output column" in {
    val docs = Seq(("A", "a b c")).toDF("df", "text")
    an[IllegalArgumentException] should be thrownBy
      TextFunctions.hotPhrases(docs, "df", "text", n = 3, k = 1)
  }

  it should "keep the bounded aggregate — no window sort over phrases" in {
    val docs = Seq(("A", "a b c d e")).toDF("src", "text")
    val plan = TextFunctions.hotPhrases(docs, "src", "text", n = 3, k = 5)
      .queryExecution.executedPlan
    plan.toString should not include "Window"
    plan.toString should include("bounded_topk_set")
  }
}
