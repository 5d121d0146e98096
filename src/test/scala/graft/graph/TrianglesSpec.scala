package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestKit._

class TrianglesSpec extends AnyFunSuite {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Triangles.perNode(edges.toDF("i", "j"), "i", "j")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 has 4 triangles, every node in 3") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = counts(k4)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(Triangles.triangles(k4.toDF("i", "j"), "i", "j").count() == 4L)
  }

  test("a bridge or path contributes no triangle; extra edges don't double-count") {
    // triangle {1,2,3} plus a pendant 3-4 and a 4-5-6 path
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(counts(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("duplicates, reversed orientation and self-loops are normalized away") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 1L), (1L, 2L))
    assert(counts(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("two overlapping triangles count membership per node") {
    // {1,2,3} and {2,3,4} share edge 2-3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(edges) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("each triangle appears exactly once in the list, ordered by orientation") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val t = Triangles.triangles(edges.toDF("i", "j"), "i", "j").collect()
    assert(t.length == 1)
    val row = t.head
    assert(Set(row.getLong(0), row.getLong(1), row.getLong(2)) == Set(1L, 2L, 3L))
  }
}
