package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class HashedFeaturesSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private val docs = Seq(
    (0L, "a b a b c"),
    (1L, "a"),
    (2L, ""),
    (3L, "x y z x y z x y z")).toDF("doc_id", "text")

  behavior of "TextFunctions.hashedFeatures"

  it should "conserve gram occurrences through hashing (counts sum to grams)" in {
    // doc 0: 5 unigrams + 4 bigrams = 9; doc 1: 1 + 0; doc 2: none; doc 3: 9 + 8
    val sums = TextFunctions.hashedFeatures(docs, "doc_id", "text", dim = 8)
      .groupBy("doc").agg(sum("cnt").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    sums shouldBe Map(0L -> 9L, 1L -> 1L, 3L -> 17L)
  }

  it should "be identical across partitionings and gram-size subsets behave" in {
    val a = TextFunctions.hashedFeatures(docs.repartition(5), "doc_id", "text", dim = 8)
      .orderBy("doc", "bucket").collect().map(_.toSeq).toSeq
    val b = TextFunctions.hashedFeatures(docs.coalesce(1), "doc_id", "text", dim = 8)
      .orderBy("doc", "bucket").collect().map(_.toSeq).toSeq
    a shouldBe b
    // unigrams only: doc 0 has 5 occurrences
    TextFunctions.hashedFeatures(docs, "doc_id", "text", dim = 8, ns = Seq(1))
      .where(col("doc") === 0).agg(sum("cnt")).head.getLong(0) shouldBe 5L
  }

  it should "agree with a direct per-gram recount at a collision-free dim" in {
    val direct = docs
      .select(col("doc_id").as("doc"), explode(concat(
        graft.functions.WordShingles.wordGrams(col("text"), 1),
        graft.functions.WordShingles.wordGrams(col("text"), 2))).as("g"))
      .groupBy("doc", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc").agg(max("cnt").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dim 4096 >> distinct grams: per-bucket counts == per-gram counts
    val hashed = TextFunctions.hashedFeatures(docs, "doc_id", "text", dim = 4096)
      .groupBy("doc").agg(max("cnt").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    hashed shouldBe direct
  }

  it should "reject non-power-of-two dims and bad gram sizes" in {
    an[IllegalArgumentException] should be thrownBy
      TextFunctions.hashedFeatures(docs, "doc_id", "text", dim = 100)
    an[IllegalArgumentException] should be thrownBy
      TextFunctions.hashedFeatures(docs, "doc_id", "text", ns = Seq(1, 1))
  }
}
