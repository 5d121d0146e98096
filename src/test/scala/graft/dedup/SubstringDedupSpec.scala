package graft.dedup

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Exact-substring dedup contract: verbatim spans that SET-similarity
 * misses. The defining case — a 500-token quote embedded in a 10x-longer
 * host — keeps pairwise 3-gram Jaccard below 0.1 (the union is dominated
 * by the host) while substringPairs reports the span exactly.
 */
class SubstringDedupSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def doc(tokens: Seq[String]): String = tokens.mkString(" ")
  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  behavior of "Dedup.substringPairs"

  it should "find a 500-token verbatim quote inside a 10x-longer host that Jaccard misses" in {
    import spark.implicits._
    val quote = toks("q", 500)
    val host = toks("h", 2250) ++ quote ++ toks("z", 2250) // 5000 tokens
    val df = Seq(
      (1L, doc(quote)),
      (2L, doc(host)),
      (3L, doc(toks("u", 300))) // unrelated filler
    ).toDF("doc_id", "text")

    // set-similarity fails here: |A∩B| = 498 shared 3-shingles out of a
    // 4998-shingle union — jac ≈ 0.0996, under even a LOW 0.1 threshold
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", tau = 0.1).collect()
    jac shouldBe empty

    // the substring operator reports the exact span
    val got = Dedup.substringPairs(df, "doc_id", "text", minSpan = 100, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe Seq((1L, 2L, 500L))
  }

  it should "measure span lengths exactly and keep the longest span per pair" in {
    import spark.implicits._
    val runA = toks("a", 60) // shared run of exactly 60 tokens
    val runB = toks("b", 45) // second, shorter shared run
    val d1 = toks("x", 30) ++ runA ++ toks("y", 30) ++ runB ++ toks("w", 10)
    val d2 = toks("m", 80) ++ runB ++ toks("n", 25) ++ runA
    val df = Seq((10L, doc(d1)), (20L, doc(d2))).toDF("doc_id", "text")

    val got = Dedup.substringPairs(df, "doc_id", "text", minSpan = 40, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // both runs exceed k; the longest (60) is the reported span
    got.toSeq shouldBe Seq((10L, 20L, 60L))
  }

  it should "not emit pairs whose longest shared span is below minSpan" in {
    import spark.implicits._
    val shared = toks("s", 20)
    val df = Seq(
      (1L, doc(toks("p", 40) ++ shared)),
      (2L, doc(shared ++ toks("r", 40)))
    ).toDF("doc_id", "text")
    // span = 20 >= k = 8 is detected, but minSpan = 30 filters it
    Dedup.substringPairs(df, "doc_id", "text", minSpan = 30, k = 8)
      .collect() shouldBe empty
    // ... and at minSpan = 20 the same pair is reported exactly
    val got = Dedup.substringPairs(df, "doc_id", "text", minSpan = 20, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe Seq((1L, 2L, 20L))
  }

  it should "reject minSpan smaller than the window size" in {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Dedup.substringPairs(df, "doc_id", "text", minSpan = 10, k = 40)
  }

  it should "cap pathological boilerplate runs with maxDocFreq" in {
    import spark.implicits._
    val boiler = toks("bp", 12)
    // the same boilerplate run in 6 docs, plus one genuine long pair
    val genuine = toks("g", 30)
    val rows = (1L to 6L).map(i => (i, doc(boiler ++ toks(s"f$i", 10)))) ++
      Seq((7L, doc(genuine)), (8L, doc(toks("k", 15) ++ genuine)))
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.substringPairs(df, "doc_id", "text", minSpan = 10, k = 8,
      maxDocFreq = Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // boilerplate (df = 6 > 3) drops; the genuine pair survives
    got.toSeq shouldBe Seq((7L, 8L, 30L))
  }
}
