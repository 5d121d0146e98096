package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestKit._

class KCoreSpec extends AnyFunSuite {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], k: Int,
      rounds: Int = 8): Map[Long, Long] =
    KCore.kCore(edges.toDF("i", "j"), "i", "j", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 with a pendant tail: 3-core is exactly the K4") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L))
    assert(core(edges, k = 3) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("cascading peel: removing a leaf degrades its neighbor next round") {
    // path 1-2-3-4-5: 2-core is empty (peeling cascades end-in)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(core(edges, k = 2) == Map.empty)
    // a cycle survives k=2 intact
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(core(cyc, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("fixed rounds stop early: 1 round on the path peels only the endpoints") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    // round 1 drops nodes 1 and 5 (degree 1); 2-3-4 survive with the
    // edge 2-3 and 3-4, degrees now 1,2,1 — the contract reports the
    // post-round-1 subgraph, not the converged (empty) core
    assert(core(edges, k = 2, rounds = 1) ==
      Map(2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("duplicate/reversed/self-loop edges normalize; validation loud") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
    assert(core(edges, k = 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    intercept[IllegalArgumentException] {
      KCore.kCore(edges.toDF("i", "j"), "i", "j", k = 0)
    }
  }

  test("clustering coefficient: triangle node 1e6, star center 0, leaf 0") {
    // triangle {1,2,3} + star center 4 with leaves 5,6 + edge 4-1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (4L, 6L), (4L, 1L))
    val got = Triangles.clusteringCoef(edges.toDF("i", "j"), "i", "j")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(2L) == ((2L, 1L, 1000000L))) // closed pair: coef 1.0
    assert(got(3L) == ((2L, 1L, 1000000L)))
    // node 1: deg 3 (2,3,4), one triangle → 2·1e6/(3·2) = 333333
    assert(got(1L) == ((3L, 1L, 333333L)))
    assert(got(4L) == ((3L, 0L, 0L))) // open star center
    assert(got(5L) == ((1L, 0L, 0L))) // deg<2 scores 0 by definition
  }
}
