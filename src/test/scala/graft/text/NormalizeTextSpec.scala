package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Dedup-keying normalization: case folding, punctuation→space, run
 * collapse, trim — and the composition with exact dedup that byte-exact
 * keying cannot achieve.
 */
class NormalizeTextSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "TextFunctions.normalizeText"

  it should "collapse case/punctuation/whitespace variants to one key" in {
    val variants = Seq(
      "Hello,  World!", "hello world", "  HELLO -- world\t", "hello; WORLD.")
    val out = variants.toDF("t")
      .select(TextFunctions.normalizeText(col("t")).as("n"))
      .as[String].collect().toSet
    out shouldBe Set("hello world")
  }

  it should "preserve alphanumerics and interior single spaces exactly" in {
    Seq("abc 123 xyz").toDF("t")
      .select(TextFunctions.normalizeText(col("t")).as("n"))
      .as[String].head() shouldBe "abc 123 xyz"
    // null flows through (SQL null semantics)
    Seq(Option.empty[String]).toDF("t")
      .select(TextFunctions.normalizeText(col("t")).as("n"))
      .collect().head.isNullAt(0) shouldBe true
  }

  it should "make exact dedup catch variants byte-exact keying misses" in {
    val docs = Seq((1L, "The cat."), (2L, "the CAT"), (3L, "dog")).toDF("id", "text")
    // byte-exact: three distinct canons
    graft.dedup.Dedup.exactCanon(docs, "id", "text")
      .select("canon_id").distinct().count() shouldBe 3L
    // normalized: 1 and 2 merge
    val canons = graft.dedup.Dedup.exactCanon(
      docs.withColumn("text", TextFunctions.normalizeText(col("text"))),
      "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    canons(1L) shouldBe 1L
    canons(2L) shouldBe 1L
    canons(3L) shouldBe 3L
  }
}
