package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestKit._

class LabelPropSpec extends AnyFunSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] =
    LabelProp.propagate(edges.toDF("s", "d"), seeds.toDF("n", "lb"),
        "s", "d", "n", "lb", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labels spread one hop per synchronous round along a chain") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(chain, Seq((1L, 7L)), 1) == Map(1L -> 7L, 2L -> 7L))
    assert(run(chain, Seq((1L, 7L)), 3) ==
      Map(1L -> 7L, 2L -> 7L, 3L -> 7L, 4L -> 7L))
  }

  test("majority vote wins; ties pick the smallest label") {
    // node 9 hears label 5 from two neighbors, label 3 from one
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L))
    assert(run(e, Seq((1L, 5L), (2L, 5L), (3L, 3L)), 1)(9L) == 5L)
    // 1-1 tie between labels 5 and 3 → smallest (3) wins
    assert(run(Seq((1L, 9L), (3L, 9L)), Seq((1L, 5L), (3L, 3L)), 1)(9L) == 3L)
  }

  test("seeds are clamped and labels never retract") {
    // seed 1 surrounded by opposing labels keeps its own
    val e = Seq((2L, 1L), (3L, 1L), (1L, 2L))
    val got = run(e, Seq((1L, 7L), (2L, 9L), (3L, 9L)), 3)
    assert(got(1L) == 7L)
    // node 5 labeled in round 1 via 4→5, then 4 goes quiet (no labeled
    // in-neighbor for 5 would exist in a directed setup) — label kept
    val chain = Seq((4L, 5L), (6L, 4L))
    val kept = run(chain, Seq((4L, 2L)), 3)
    assert(kept(5L) == 2L)
  }

  test("duplicate seed labels for one node fail loudly") {
    intercept[IllegalArgumentException] {
      run(Seq((1L, 2L)), Seq((1L, 5L), (1L, 6L)), 1)
    }
    intercept[IllegalArgumentException] {
      run(Seq((1L, 2L)), Seq((1L, 5L)), 0)
    }
  }
}
