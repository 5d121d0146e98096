package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Bigram-LM scoring contract: hand-computed Laplace probabilities on a
 * tiny corpus, the minCount→`<unk>` vocabulary trim, unseen-context
 * flooring at 1/V, the short-document pass-through rule, and layout
 * invariance (repartitioning never changes a score — the micro-nat
 * integer summation is order-free by construction).
 */
class NgramLmSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  behavior of "NgramLm"

  it should "reproduce hand-computed add-one bigram log-probs" in {
    import spark.implicits._
    // training corpus: "a b", "a b", "a c"
    // vocab (minCount=1) = {a, b, c}; V = 3 + 1 = 4
    // bigrams: (a,b):2, (a,c):1 ; contexts: a:3
    val ref = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val lm = NgramLm.train(ref, "text")
    lm.vocab.as[String].collect().sorted shouldBe Array("a", "b", "c")
    lm.vocabSizeRow.as[Long].head() shouldBe 4L
    lm.bigrams.as[(String, String, Long)].collect().toSet shouldBe
      Set(("a", "b", 2L), ("a", "c", 1L))
    lm.contexts.as[(String, Long)].collect().toSet shouldBe Set(("a", 3L))

    // P(b|a) = (2+1)/(3+4) = 3/7 ; P(c|a) = (1+1)/(3+4) = 2/7
    // P(anything|b) = 1/(0+4) — b never a context
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val got = NgramLm.score(
      Seq((10L, "a b"), (11L, "a c"), (12L, "b a"), (13L, "a"), (14L, "")).toDF("doc_id", "text"),
      "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    got(0) shouldBe ((10L, 1L, r6(math.round(math.log(3.0 / 7.0) * 1e6) / 1e6)))
    got(1) shouldBe ((11L, 1L, r6(math.round(math.log(2.0 / 7.0) * 1e6) / 1e6)))
    // (b,a) unseen, context b unseen: P = (0+1)/(0+4)
    got(2) shouldBe ((12L, 1L, r6(math.round(math.log(1.0 / 4.0) * 1e6) / 1e6)))
    // short docs pass through with no positions
    got(3) shouldBe ((13L, 0L, 0.0))
    got(4) shouldBe ((14L, 0L, 0.0))
  }

  it should "trim the vocabulary tail into <unk> at minCount" in {
    import spark.implicits._
    // "rare" occurs once -> <unk> at minCount=2; vocab = {a, b}, V = 3
    // mapped training bigrams: (a,b):2, (b,a):1, (a,<unk>):1
    val ref = Seq((1L, "a b a b"), (2L, "a rare")).toDF("doc_id", "text")
    val lm = NgramLm.train(ref, "text", minCount = 2L)
    lm.vocab.as[String].collect().sorted shouldBe Array("a", "b")
    lm.vocabSizeRow.as[Long].head() shouldBe 3L
    lm.bigrams.as[(String, String, Long)].collect().toSet shouldBe
      Set(("a", "b", 2L), ("b", "a", 1L), ("a", NgramLm.Unk, 1L))

    // scoring-time novel token also maps to <unk>: doc "a zzz" ->
    // bigram (a, <unk>): c12 = 1, c1(a) = 3, V = 3 -> P = (1+1)/(3+3)
    val got = NgramLm.score(Seq((7L, "a zzz")).toDF("doc_id", "text"),
      "doc_id", "text", lm).collect()
    got.length shouldBe 1
    got(0).getLong(1) shouldBe 1L
    got(0).getDouble(2) shouldBe (math.round(math.log(2.0 / 6.0) * 1e6) / 1e6)
  }

  it should "average in micro-nats exactly and survive repartitioning" in {
    import spark.implicits._
    val docs = (1L to 200L)
      .map(i => (i, (0 until (i % 7 + 2).toInt).map(j => s"w${(i + j) % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val lm = NgramLm.train(docs, "text")
    val base = NgramLm.score(docs, "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val shuffled = NgramLm.score(docs.repartition(17, col("text")), "doc_id", "text", lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    shuffled shouldBe base
    base.size shouldBe 200
    // multi-bigram docs carry the exact mean of their per-position terms
    base.count(_._2 >= 2) should be > 100
  }

  it should "reject a non-positive minCount" in {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy NgramLm.train(df, "text", 0L)
  }
}
