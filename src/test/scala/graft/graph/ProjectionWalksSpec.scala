package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestKit._

class ProjectionWalksSpec extends AnyFunSuite {
  import spark.implicits._

  test("co-occurrence counts shared left neighbors, i < j, dedup'd input") {
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (20L, 2L), (30L, 3L)).toDF("l", "r")
    val got = Projection.coOccurrence(pairs, "l", "r")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
  }

  test("maxDegree drops hub left nodes entirely") {
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L))
      .toDF("l", "r")
    val got = Projection.coOccurrence(pairs, "l", "r", maxDegree = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 1L)) // only left 20 survives the cap
    intercept[IllegalArgumentException] {
      Projection.coOccurrence(pairs, "l", "r", maxDegree = Some(0))
    }
  }

  test("walks on a directed cycle follow the only neighbor; step 0 is the start") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = Walks.walks(cyc, "s", "d", steps = 3, walksPerNode = 1)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(2)))
    // walk from 1: 1 → 2 → 3 → 1, deterministically (deg 1 everywhere)
    val w1 = got.filter(_._1 == "1#0").sortBy(_._3).map(_._2).toSeq
    assert(w1 == Seq(1L, 2L, 3L, 1L))
    assert(got.length == 3 * 4) // 3 starts × (1 + 3 steps)
  }

  test("walks are deterministic across runs and walk ids are distinct") {
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("s", "d")
    def run() = Walks.walks(g, "s", "d", steps = 4, walksPerNode = 2)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    val a = run()
    assert(a == run())
    assert(a.map(_._1) == Set("1#0", "1#1", "2#0", "2#1", "3#0", "3#1", "4#0", "4#1"))
  }

  test("corpusLines renders one step-ordered line per walk") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val lines = Walks.corpusLines(Walks.walks(cyc, "s", "d", steps = 3))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lines("1#0") == "1 2 3 1")
    assert(lines("2#0") == "2 3 1 2")
    assert(lines.size == 3)
  }

  test("a dead-end stops the walk; validation is loud") {
    val path = Seq((1L, 2L)).toDF("s", "d") // 2 has no out-edges
    val got = Walks.walks(path, "s", "d", steps = 3, walksPerNode = 1)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // start 1 only (2 has no out-neighbors so it launches no walk);
    // step 0 = 1, step 1 = 2, then the walk stops
    assert(got.toSet == Set((0L, 1L), (1L, 2L)))
    intercept[IllegalArgumentException] {
      Walks.walks(path, "s", "d", steps = 0)
    }
  }
}
