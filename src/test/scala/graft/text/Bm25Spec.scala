package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * BM25 contract: hand-computed scores on a tiny corpus (idf, length
 * normalization, the distinct-query-term convention), ranking order
 * with the doc-id tie-break, the top-k bound, empty-query/-document
 * rules, and layout invariance (the micro-unit integer summation makes
 * scores independent of partitioning and aggregation order).
 */
class Bm25Spec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  behavior of "Bm25.topK"

  // the operator's own contract, replayed in plain scala
  private def u(n: Long, df: Long, tf: Long, dl: Long, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Long = {
    val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
    val norm = tf.toDouble * (k1 + 1.0) /
      (tf.toDouble + k1 * ((1.0 - b) + b * dl.toDouble / avgdl))
    math.round(idf * norm * 1e6)
  }

  it should "reproduce hand-computed scores, rank order and tie-breaks" in {
    import spark.implicits._
    // corpus: d1 = "x x y", d2 = "x z", d3 = "y z z"
    // N = 3, avgdl = 8/3; df: x=2, y=2, z=2
    val corpus = Seq((1L, "x x y"), (2L, "x z"), (3L, "y z z"))
      .toDF("doc_id", "text")
    // q1 terms {x, y} (duplicate x collapses), q2 terms {z}
    val queries = Seq((10L, "x y x"), (20L, "z")).toDF("qid", "qtext")
    val got = Bm25.topK(queries, corpus, "qid", "qtext", "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(t => (t._1, t._4))

    val avgdl = 8.0 / 3.0
    // q1: d1 gets x(tf=2) + y(tf=1), d2 gets x(tf=1), d3 gets y(tf=1)
    val s11 = u(3, 2, 2, 3, avgdl) + u(3, 2, 1, 3, avgdl)
    val s12 = u(3, 2, 1, 2, avgdl)
    val s13 = u(3, 2, 1, 3, avgdl)
    // q2: d2 gets z(tf=1), d3 gets z(tf=2)
    val s22 = u(3, 2, 1, 2, avgdl)
    val s23 = u(3, 2, 2, 3, avgdl)
    s12 should be > s13 // same tf and df, shorter doc scores higher
    got shouldBe Array(
      (10L, 1L, s11 / 1e6, 1L), (10L, 2L, s12 / 1e6, 2L), (10L, 3L, s13 / 1e6, 3L),
      (20L, 3L, s23 / 1e6, 1L), (20L, 2L, s22 / 1e6, 2L))
  }

  it should "break exact score ties on ascending doc id" in {
    import spark.implicits._
    // d5 and d4 are identical documents — identical scores for any
    // query; the lower id must take the better rank
    val corpus = Seq((5L, "a b"), (4L, "a b"), (6L, "c")).toDF("doc_id", "text")
    val queries = Seq((1L, "a")).toDF("qid", "qtext")
    val got = Bm25.topK(queries, corpus, "qid", "qtext", "doc_id", "text", k = 10)
      .select("doc_id", "rnk").as[(Long, Long)].collect().sortBy(_._2)
    got shouldBe Array((4L, 1L), (5L, 2L))
  }

  it should "bound output at k rows per query" in {
    import spark.implicits._
    val corpus = (1L to 20L).map(i => (i, s"t d$i")).toDF("doc_id", "text")
    val queries = Seq((1L, "t")).toDF("qid", "qtext")
    val got = Bm25.topK(queries, corpus, "qid", "qtext", "doc_id", "text", k = 7)
    got.count() shouldBe 7L
    got.agg(max("rnk")).head().getLong(0) shouldBe 7L
  }

  it should "emit nothing for empty or out-of-vocabulary queries" in {
    import spark.implicits._
    val corpus = Seq((1L, "a b")).toDF("doc_id", "text")
    val queries = Seq((1L, ""), (2L, "zzz qqq")).toDF("qid", "qtext")
    Bm25.topK(queries, corpus, "qid", "qtext", "doc_id", "text", k = 3)
      .count() shouldBe 0L
  }

  it should "be invariant to input layout (order-free integer sums)" in {
    import spark.implicits._
    val corpus = (1L to 50L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)(s"w${i % 11}").mkString(" ")))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "w1 w2 w3"), (2L, "w4 w5")).toDF("qid", "qtext")
    def run(c: org.apache.spark.sql.DataFrame) =
      Bm25.topK(queries, c, "qid", "qtext", "doc_id", "text", k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSet
    run(corpus) shouldBe run(corpus.repartition(13, col("text")))
  }

  it should "reject invalid parameters" in {
    import spark.implicits._
    val d = Seq((1L, "a")).toDF("doc_id", "text")
    val q = Seq((1L, "a")).toDF("qid", "qtext")
    an[IllegalArgumentException] should be thrownBy
      Bm25.topK(q, d, "qid", "qtext", "doc_id", "text", k = 0)
    an[IllegalArgumentException] should be thrownBy
      Bm25.topK(q, d, "doc_id", "qtext", "doc_id", "text", k = 1)
    an[IllegalArgumentException] should be thrownBy
      Bm25.topK(q, d, "qid", "qtext", "doc_id", "text", k = 1, b = 1.5)
  }
}
