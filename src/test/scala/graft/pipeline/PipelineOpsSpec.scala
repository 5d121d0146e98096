package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark
import graft.dedup.Dedup
import graft.functions.{MinhashSignature, WordShingles}
import graft.similarity.Similarity
import graft.text.TextFunctions

/** Specs for the training-data pipeline operators: dedup, text analysis,
  * similarity search, and the custom codegen'd expressions backing them. */
class PipelineOpsSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "WordShingles"

  it should "match the composed higher-order-function formulation" in {
    val docs = Seq(
      "a b c d e", "one two three", "x x x x", "  spaced   out  words here ",
      "ab", "", "a b c").toDF("text")
    val native = docs.select(WordShingles.wordShingles(col("text"), 3).as("sh"))
    val composed = docs
      .select(TextFunctions.tokens(col("text")).as("ws"))
      .select(TextFunctions.shingles(col("ws"), 3).as("sh"))
    native.collect().map(_.getSeq[String](0)).toSeq shouldBe
      composed.collect().map(_.getSeq[String](0)).toSeq
  }

  it should "dedupe shingles keeping first occurrence" in {
    val out = Seq("p q p q p q p q").toDF("text")
      .select(WordShingles.wordShingles(col("text"), 2).as("sh"))
      .head.getSeq[String](0)
    out shouldBe Seq("p q", "q p")
  }

  behavior of "MinhashSignature"

  it should "be a permutation-stable minimum (superset shrinks it monotonically)" in {
    val sig1 = Seq(Seq("a b c", "b c d")).toDF("sh")
      .select(MinhashSignature.minhashSignature(col("sh"), 16)).head.getSeq[Long](0)
    val sig2 = Seq(Seq("b c d", "a b c")).toDF("sh")
      .select(MinhashSignature.minhashSignature(col("sh"), 16)).head.getSeq[Long](0)
    sig1 shouldBe sig2 // order-insensitive
    val sup = Seq(Seq("a b c", "b c d", "zz yy xx")).toDF("sh")
      .select(MinhashSignature.minhashSignature(col("sh"), 16)).head.getSeq[Long](0)
    sig1.zip(sup).foreach { case (s, t) => t should be <= s }
  }

  behavior of "Dedup"

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different text with other words entirely present"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "short one")).toDF("doc_id", "text")

  it should "group exact duplicates to the minimum id" in {
    val canon = Dedup.exactCanon(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    canon shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 4L)
  }

  it should "find near-dup pairs by exact shingle Jaccard" in {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 1L), (0L, 3L), (1L, 3L))
    // exact duplicates have jac exactly 1.0
    Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .where("doc_i = 0 and doc_j = 3").head.getDouble(2) shouldBe 1.0
  }

  it should "recall the same pairs via MinHash-LSH with exact verification" in {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    lsh shouldBe exact
  }

  it should "stay sound under a maxDocFreq skew cap (capped pairs are a subset)" in {
    // dropping hot shingles removes them from intersection counts only, so
    // capped Jaccard <= exact Jaccard: the cap may lose pairs (documented
    // recall trade-off) but can never invent them
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped.subsetOf(exact) shouldBe true
    // a generous cap changes nothing
    Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5, maxDocFreq = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe exact
  }

  it should "find exact duplicates by SimHash (identical fingerprints)" in {
    // exact duplicates have identical fingerprints (hamming 0)
    Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet should contain((0L, 3L))
    Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .where("doc_i = 0 and doc_j = 3").head.getInt(2) shouldBe 0
  }

  it should "find embedding-cosine near-dup pairs exactly" in {
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f)),
      (1L, Array(0.99f, 0.12f, 0.01f)), // near-parallel to 0
      (2L, Array(-0.5f, 0.9f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 1L))
  }

  behavior of "TextFunctions"

  it should "count tokens and compute exact ratios" in {
    val out = Seq("the cat the cat runs").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("ws"))
      .select(
        TextFunctions.tokenCount(col("ws")).as("n"),
        TextFunctions.stopwordRatio(col("ws")).as("sr"),
        TextFunctions.distinctTokenRatio(col("ws")).as("dr"),
        TextFunctions.avgTokenLen(col("ws")).as("al"))
      .head
    out.getLong(0) shouldBe 5L
    out.getDouble(1) shouldBe 2.0 / 5.0
    out.getDouble(2) shouldBe 3.0 / 5.0
    out.getDouble(3) shouldBe 16.0 / 5.0
  }

  it should "identify language by marker words with deterministic ties" in {
    val out = Seq("the cat and dog", "der hund und die katze", "xyzzy plugh")
      .toDF("text")
      .select(TextFunctions.langId(TextFunctions.tokens(col("text"))).as("lang"))
      .collect().map(_.getString(0)).toSeq
    out shouldBe Seq("en", "de", "und")
  }

  behavior of "Similarity"

  it should "rank exact cosine top-k with id tie-breaks" in {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f)),  // nearly parallel to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal to 0
      (3L, Array(-1.0f, 0.0f))). // opposite to 0
      toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(
      vecs.where("vec_id = 0"), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(3)))
    top.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L) // by descending cosine
  }

  it should "retrieve the near-neighbor through SimHash LSH buckets" in {
    val base = (0 until 50).map { i =>
      val ang = i * 0.12
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.1f, 0.2f))
    }
    val vecs = (base :+ (99L, base.head._2.map(v => v * 0.999f))).toDF("vec_id", "embedding")
    val out = Similarity.lshCosineTopK(
      vecs.where("vec_id = 99"), vecs, "vec_id", "embedding", k = 1,
      planes = 4, tables = 4)
    // the almost-identical vector 0 must land in the same bucket and rank 1
    out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((99L, 0L))
  }
}
