package graft.text

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class PhraseSearchSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "quick brown fox and quick brown fox again"),
    (2L, "fox brown quick"), // reversed: no phrase match
    (3L, "  quick   brown  fox  "), // whitespace-noisy, still matches
    (4L, ""),
    (5L, "quick brown")).toDF("doc_id", "text")

  behavior of "PhraseSearch.phraseHits"

  it should "count occurrences and report the first 0-based token offset" in {
    val out = PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("quick brown fox"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    out shouldBe Set(
      (0L, "quick brown fox", 1L, 1L),
      (1L, "quick brown fox", 2L, 0L),
      (3L, "quick brown fox", 1L, 0L))
  }

  it should "search mixed-length phrases in one call (per-k scan branches)" in {
    val out = PhraseSearch.phraseHits(docs, "doc_id", "text",
        Seq("lazy dog", "quick brown fox", "the"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    out((0L, "lazy dog")) shouldBe ((1L, 7L))
    out((0L, "the")) shouldBe ((2L, 0L))
    out((1L, "quick brown fox")) shouldBe ((2L, 0L))
    out.keySet.map(_._1) should not contain 2L
    out.keySet.map(_._1) should not contain 4L
  }

  it should "normalize needle whitespace with the corpus tokenizer" in {
    val a = PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("  quick   brown fox "))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val b = PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("quick brown fox"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    a shouldBe b
  }

  it should "collapse duplicate needles and reject empty ones" in {
    PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("lazy dog", "lazy dog"))
      .count() shouldBe 1L
    an[IllegalArgumentException] should be thrownBy
      PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("   "))
    an[IllegalArgumentException] should be thrownBy
      PhraseSearch.phraseHits(docs, "doc_id", "text", Nil)
  }

  it should "match a phrase longer than most docs only where it fits" in {
    val out = PhraseSearch.phraseHits(docs, "doc_id", "text",
        Seq("the quick brown fox jumps over the lazy dog"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq((0L, 1L, 0L))
  }
}
