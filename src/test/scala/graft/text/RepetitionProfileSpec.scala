package graft.text

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Repetition-profile contract (Gopher-family quality filter): exact
 * fractions on hand-computable documents, and the pass-through rule for
 * documents too short to carry an n-gram.
 */
class RepetitionProfileSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  behavior of "TextFunctions.repetitionProfile"

  it should "pin machine-generated boilerplate near 1.0 and diverse text at 0" in {
    import spark.implicits._
    val df = Seq(
      // "a b" 2-gram at every other position: positions = 5, "a b" occurs 3x
      (1L, "a b a b a b"),
      // all tokens distinct: every gram unique
      (2L, "t0 t1 t2 t3 t4 t5 t6 t7"),
      // one 5-gram repeated verbatim: 10 tokens, 6 5-gram positions,
      // "x0 x1 x2 x3 x4" occurs twice -> dup covers 2 of 6
      (3L, "x0 x1 x2 x3 x4 x0 x1 x2 x3 x4")
    ).toDF("doc_id", "text")

    val got = TextFunctions.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq

    // doc 1: 2-grams "a b":3 of 5 positions; its two 5-grams are distinct
    got(0) shouldBe ((1L, 6L, 0.6, 0.0))
    // doc 2: 7 unique 2-grams -> top 1/7, rounded to 6 places
    got(1) shouldBe ((2L, 8L, 0.142857, 0.0))
    // doc 3: "x0 x1 x2 x3 x4" is the only repeated 5-gram (2 of 6
    // positions); top 2-gram "x0 x1" covers 2 of 9 positions
    got(2)._1 shouldBe 3L
    got(2)._3 shouldBe (0.222222 +- 1e-9)
    got(2)._4 shouldBe (0.333333 +- 1e-9)
  }

  it should "pass short documents through with zeros instead of dropping them" in {
    import spark.implicits._
    val df = Seq((1L, "solo"), (2L, ""), (3L, "two tokens here")).toDF("doc_id", "text")
    val got = TextFunctions.repetitionProfile(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    got should have size 3
    got(0) shouldBe ((1L, 1L, 0.0, 0.0))
    got(1) shouldBe ((2L, 0L, 0.0, 0.0))
    // 3 tokens: two distinct 2-grams (top 1/2), no 5-gram
    got(2) shouldBe ((3L, 3L, 0.5, 0.0))
  }

  it should "reject equal gram sizes (the tagged explode would double-count)" in {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      TextFunctions.repetitionProfile(df, "doc_id", "text", topN = 3, dupN = 3)
  }
}
