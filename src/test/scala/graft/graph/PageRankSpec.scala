package graft.graph

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestKit._

/** Pins [[PageRank]]'s integer fixed-point contract against an
  * in-test single-threaded replay of the same update (a Map-based
  * simulator using the identical truncating arithmetic) — any
  * divergence in partitioning, join shape, or aggregation order shows
  * up as a digit mismatch. */
class PageRankSpec extends AnyFunSuite {

  private val S = 1000000000000L

  /** Sequential replay of the documented update: same integer ops. */
  private def simulate(edges: Seq[(Long, Long)], iters: Int,
      seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val (base, r0) = seeds match {
      case None =>
        val n = nodes.size
        (nodes.map(_ -> (15L * S) / (100L * n)).toMap,
          nodes.map(_ -> S / n).toMap)
      case Some(sd) =>
        val s = nodes.count(sd.contains)
        (nodes.map(u => u -> (if (sd(u)) (15L * S) / (100L * s) else 0L)).toMap,
          nodes.map(u => u -> (if (sd(u)) S / s else 0L)).toMap)
    }
    var rank = r0
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges if outdeg.getOrElse(u, 0L) > 0)
        contrib(v) += rank(u) / outdeg(u)
      rank = nodes.map(u => u -> (base(u) + (85L * contrib(u)) / 100L)).toMap
    }
    rank
  }

  private def df(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("s", "d")
  }

  private def result(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(df(edges), "s", "d", iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two-node cycle is stationary at S/2") {
    val r = result(Seq((1L, 2L), (2L, 1L)), iters = 7)
    assert(r == Map(1L -> S / 2, 2L -> S / 2))
  }

  test("matches the sequential integer replay on a mixed graph") {
    // hub-and-spoke plus a chain and a dangling sink (node 9)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L),
      (4L, 5L), (5L, 6L), (6L, 7L), (7L, 5L), (3L, 9L))
    for (iters <- Seq(1, 3, 8)) {
      assert(result(edges, iters) == simulate(edges, iters),
        s"divergence at iterations=$iters")
    }
  }

  test("hub outranks leaves; dangling sink leaks mass (sum < S)") {
    val edges = Seq((2L, 1L), (3L, 1L), (4L, 1L), (1L, 2L), (1L, 9L))
    val r = result(edges, 8)
    assert(r(1L) > r(3L) && r(1L) > r(4L))
    assert(r.values.sum < S) // node 9 is dangling: damped mass leaks
  }

  test("personalized: teleport only to seeds, matches replay") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 2L), (5L, 1L))
    import spark.implicits._
    val got = PageRank.personalized(df(edges), Seq(1L, 4L).toDF("id"),
        "s", "d", "id", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == simulate(edges, 5, seeds = Some(Set(1L, 4L))))
    // node 5 has no in-edges and is not a seed: rank exactly 0
    assert(got(5L) == 0L)
  }

  test("personalized with NO seed in the graph fails loudly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      PageRank.personalized(df(Seq((1L, 2L), (2L, 1L))),
          Seq(99L).toDF("id"), "s", "d", "id", iterations = 2)
        .collect()
    }
    assert(ex.getMessage.contains("no seed id appears in the graph"))
  }

  test("seed ids outside the graph are ignored in S") {
    val edges = Seq((1L, 2L), (2L, 1L))
    import spark.implicits._
    val got = PageRank.personalized(df(edges), Seq(1L, 77L).toDF("id"),
        "s", "d", "id", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == simulate(edges, 3, seeds = Some(Set(1L))))
  }

  test("weighted with all weights 1 is bit-identical to unweighted") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val w1 = edges.map { case (a, b) => (a, b, 1L) }.toDF("s", "d", "w")
    val got = PageRank.runWeighted(w1, "s", "d", "w", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == result(edges, 5))
  }

  test("weighted matches a sequential weighted replay; bad weights dropped") {
    import spark.implicits._
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 1L, 2L), (3L, 1L, 2L))
    // sequential replay with the same integer ops
    def sim(iters: Int): Map[Long, Long] = {
      val nodes = Seq(1L, 2L, 3L)
      val wsum = Map(1L -> 4L, 2L -> 2L, 3L -> 2L)
      val base = nodes.map(_ -> (15L * S) / (100L * 3)).toMap
      var rank = nodes.map(_ -> S / 3).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((u, v, w) <- edges) contrib(v) += (rank(u) * w) / wsum(u)
        rank = nodes.map(u => u -> (base(u) + (85L * contrib(u)) / 100L)).toMap
      }
      rank
    }
    val got = PageRank.runWeighted(edges.toDF("s", "d", "w"), "s", "d", "w",
        iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == sim(4))
    // a zero/negative-weight edge is dropped entirely (here: it would
    // have been 2->3; node 3 then gets only 1->3 contributions)
    val withBad = (edges :+ ((2L, 3L, 0L))).toDF("s", "d", "w")
    val got2 = PageRank.runWeighted(withBad, "s", "d", "w", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("null endpoints are dropped; parameter validation is loud") {
    import spark.implicits._
    val e = Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]))
      .toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L))
    intercept[IllegalArgumentException] {
      PageRank.run(e, "s", "d", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.run(e, "s", "d", dampingNum = 101L)
    }
  }
}
