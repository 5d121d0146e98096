package graft.ml

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/** Pins [[Eval.knnLabelAccuracy]]: the leave-one-out neighbor rule,
  * per-class exact counts, micro-unit accuracy, and null-label
  * exclusion on both ends. */
class EvalSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "Eval.knnLabelAccuracy"

  it should "score a hand-built two-class layout exactly" in {
    // class a: 1=(1,0), 2=(0.9,0.1) — mutual neighbors, both correct.
    // class b: 3=(0,1) correct via 4; 4=(0.1,0.9) correct via 3;
    // 5=(0.6,0.55) labeled b but nearest to 2 (class a) — wrong.
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), "a"), (2L, Seq(0.9f, 0.1f), "a"),
      (3L, Seq(0.0f, 1.0f), "b"), (4L, Seq(0.1f, 0.9f), "b"),
      (5L, Seq(0.8f, 0.75f), "b")).toDF("id", "vec", "lbl")
    val out = Eval.knnLabelAccuracy(df, "id", "vec", "lbl")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // 5's nearest is 2 (cos ~0.985 vs ~0.99 for ... verify by construction):
    // cos(5, 2) > cos(5, 3): (0.8,0.75)·(0.9,0.1) vs ·(0,1)
    out.length shouldBe 2
    val a = out(0); val b = out(1)
    a._1 shouldBe "a"
    a._2 shouldBe 2L; a._3 shouldBe 2L; a._4 shouldBe 1000000L
    b._1 shouldBe "b"
    b._2 shouldBe 3L
    b._3 shouldBe 2L
    b._4 shouldBe (2L * 1000000L) / 3L
  }

  it should "exclude null-labeled rows as queries and neighbors" in {
    // the null-labeled row sits exactly on top of doc 1; if it were a
    // valid neighbor, doc 1 would score "wrong" (null != a) — instead
    // doc 1's neighbor is doc 2 and class a stays perfect
    val df = Seq(
      (1L, Seq(1.0f, 0.0f), Some("a")), (2L, Seq(0.95f, 0.05f), Some("a")),
      (9L, Seq(1.0f, 0.0f), None)).toDF("id", "vec", "lbl")
    val out = Eval.knnLabelAccuracy(df, "id", "vec", "lbl")
      .as[(String, Long, Long, Long)].collect().toList
    out shouldBe List(("a", 2L, 2L, 1000000L))
  }
}
