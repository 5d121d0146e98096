package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit
import graft.functions.WinnowDigests

/**
 * Winnowed substring dedup contract: the detection guarantee (every
 * shared span >= w+k-1 tokens is found), the span_lb lower-bound with
 * its 2(w-1) tightness, the ~2/(w+1) fingerprint density that justifies
 * the operator at scale, the w=1 degeneracy to substringPairs, and the
 * monotone rightmost-tie selection invariants of the expression itself.
 */
class WinnowDedupSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def doc(tokens: Seq[String]): String = tokens.mkString(" ")
  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  behavior of "WinnowDigests"

  it should "select ascending positions at ~2/(w+1) density with valid digests" in {
    import spark.implicits._
    val df = Seq((1L, doc(toks("t", 400)))).toDF("doc_id", "text")
    val sel = df.select(explode(WinnowDigests.winnowDigests(col("text"), 8, 4)).as("s"))
      .select(col("s.p"), col("s.h")).collect()
      .map(r => (r.getInt(0), r.getAs[Array[Byte]](1)))
    // m = 400-8+1 = 393 digest positions; expected density 2/(w+1) = 0.4
    val m = 393
    sel.length should be < (m * 6 / 10) // well under all-positions
    sel.length should be > (m / (4 + 1)) // and at least 1/(w+1) (pigeonhole)
    sel.map(_._1).toSeq shouldBe sel.map(_._1).toSeq.sorted // monotone
    sel.map(_._1).distinct.length shouldBe sel.length // no duplicates
    all(sel.map(_._2.length)) shouldBe 16 // md5 digests
    // pigeonhole: no gap between consecutive selections exceeds w
    sel.map(_._1).toSeq.sliding(2).foreach {
      case Seq(a, b) => (b - a) should be <= 4
      case _ =>
    }
  }

  it should "fingerprint short texts through a single covering window" in {
    import spark.implicits._
    val df = Seq((1L, doc(toks("s", 9))), (2L, doc(toks("s", 7)))).toDF("doc_id", "text")
    val counts = df.select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        WinnowDigests.winnowDigests(col("text"), 8, 16)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    counts(1L) shouldBe 1 // m=2 < w: one window over all digests
    counts(2L) shouldBe 0 // fewer than k tokens: no digests at all
  }

  behavior of "Dedup.winnowedSubstringPairs"

  it should "find the 500-token quote in a 10x-longer host with a tight span lower bound" in {
    import spark.implicits._
    val quote = toks("q", 500)
    val host = toks("h", 2250) ++ quote ++ toks("z", 2250)
    val df = Seq(
      (1L, doc(quote)), (2L, doc(host)), (3L, doc(toks("u", 300)))
    ).toDF("doc_id", "text")
    val got = Dedup.winnowedSubstringPairs(df, "doc_id", "text",
      minSpanLb = 100, k = 40, w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.length shouldBe 1
    val (i, j, lb) = got.head
    (i, j) shouldBe ((1L, 2L))
    // span_lb is a lower bound on the true 500, tight to 2(w-1) = 14
    lb should be <= 500L
    lb should be >= (500L - 14L)
  }

  it should "guarantee detection of every shared span of at least w+k-1 tokens" in {
    import spark.implicits._
    // the minimum guaranteed-detectable span: w+k-1 = 4+8-1 = 11 tokens
    val span = toks("s", 11)
    val df = Seq(
      (1L, doc(toks("a", 200) ++ span ++ toks("b", 200))),
      (2L, doc(toks("c", 150) ++ span ++ toks("d", 100)))
    ).toDF("doc_id", "text")
    val got = Dedup.winnowedSubstringPairs(df, "doc_id", "text",
      minSpanLb = 8, k = 8, w = 4).collect()
    got.length shouldBe 1 // detected — span_lb >= k by construction
  }

  it should "degenerate to substringPairs at w = 1" in {
    import spark.implicits._
    val runA = toks("a", 60)
    val runB = toks("b", 45)
    val df = Seq(
      (10L, doc(toks("x", 30) ++ runA ++ toks("y", 30) ++ runB ++ toks("w", 10))),
      (20L, doc(toks("m", 80) ++ runB ++ toks("n", 25) ++ runA))
    ).toDF("doc_id", "text")
    val exact = Dedup.substringPairs(df, "doc_id", "text", minSpan = 40, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val winnowed = Dedup.winnowedSubstringPairs(df, "doc_id", "text",
      minSpanLb = 40, k = 40, w = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    winnowed shouldBe exact
  }

  it should "shrink the fingerprint index versus the full run-digest index" in {
    import spark.implicits._
    val df = (1L to 40L)
      .map(i => (i, doc(toks(s"d$i", 200)))).toDF("doc_id", "text")
    val full = df.select(explode(
      graft.functions.RunDigests.runDigests(col("text"), 8)).as("h")).count()
    val winnowed = df.select(explode(
      WinnowDigests.winnowDigests(col("text"), 8, 8)).as("s")).count()
    // expected density 2/(w+1) = 2/9; assert at least a 3x reduction
    winnowed.toDouble should be < (full.toDouble / 3.0)
  }

  it should "reject invalid parameters" in {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Dedup.winnowedSubstringPairs(df, "doc_id", "text", minSpanLb = 4, k = 8)
    an[IllegalArgumentException] should be thrownBy
      Dedup.winnowedSubstringPairs(df, "doc_id", "text", minSpanLb = 20, k = 8, w = 0)
  }
}
