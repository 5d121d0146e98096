package graft.text

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

/** Pins [[TextFunctions.noveltyScores]]: first-seen credit, the
  * per-doc distinct-shingle denominator, duplicate collapse, and the
  * too-short exclusion rule. */
class NoveltySpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "TextFunctions.noveltyScores"

  it should "credit each shingle to its lowest-id document" in {
    // doc 1: "a b c"   -> bigrams {a b, b c}, both new  -> 2/2
    // doc 2: "b c d"   -> {b c, c d}, c d new           -> 1/2
    // doc 3: "a b c d" -> {a b, b c, c d}, none new     -> 0/3
    val df = Seq((1L, "a b c"), (2L, "b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val out = TextFunctions.noveltyScores(df, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    out shouldBe List(
      (1L, 2L, 2L, 1000000L),
      (2L, 2L, 1L, 500000L),
      (3L, 3L, 0L, 0L))
  }

  it should "count repeated shingles within a document once" in {
    // "a b a b" -> distinct bigrams {a b, b a} — denominator 2, not 3
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = TextFunctions.noveltyScores(df, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long)].collect().toList
    out shouldBe List((1L, 2L, 2L, 1000000L))
  }

  it should "exclude documents with fewer than n tokens" in {
    val df = Seq((1L, "lonely"), (2L, "two words")).toDF("doc_id", "text")
    val out = TextFunctions.noveltyScores(df, "doc_id", "text", n = 2)
      .select("doc_id").as[Long].collect().toList
    out shouldBe List(2L)
  }

  it should "score an exact duplicate after the first at zero" in {
    val df = Seq((5L, "x y z"), (9L, "x y z")).toDF("doc_id", "text")
    val out = TextFunctions.noveltyScores(df, "doc_id", "text", n = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    out shouldBe List((5L, 2L, 2L, 1000000L), (9L, 2L, 0L, 0L))
  }
}
