package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestKit._

class FusionSpec extends AnyFunSuite {
  import spark.implicits._

  private def lst(rows: (Long, Long, Long)*) =
    rows.toDF("qid", "id", "rnk")

  test("fuses two lists with exact integer reciprocal contributions") {
    val l1 = lst((1L, 10L, 1L), (1L, 20L, 2L))
    val l2 = lst((1L, 20L, 1L), (1L, 30L, 2L))
    val got = Fusion.rrf(Seq(l1, l2), "qid", "id", "rnk", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    // 1e6//61 = 16393, 1e6//62 = 16129
    assert(got === Array(
      (1L, 20L, 16393L + 16129L, 1L),
      (1L, 10L, 16393L, 2L),
      (1L, 30L, 16129L, 3L)))
  }

  test("equal fused scores break ties by ascending id; k cuts") {
    val l1 = lst((1L, 5L, 1L), (1L, 3L, 2L), (1L, 9L, 3L))
    val l2 = lst((1L, 3L, 1L), (1L, 5L, 2L))
    // 5: r1+r2, 3: r2+r1 — identical sums; 9: r3 alone
    val got = Fusion.rrf(Seq(l1, l2), "qid", "id", "rnk", k = 2)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(got === Array((3L, 1L), (5L, 2L)))
  }

  test("queries are independent strata; single list is rank-preserving") {
    val l = lst((1L, 10L, 1L), (1L, 11L, 2L), (2L, 12L, 1L))
    val got = Fusion.rrf(Seq(l), "qid", "id", "rnk", k = 10)
      .orderBy("qid", "rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got === Array((1L, 10L, 1L), (1L, 11L, 2L), (2L, 12L, 1L)))
  }

  test("parameter validation is loud") {
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq.empty, "qid", "id", "rnk", k = 1)
    }
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq(lst((1L, 1L, 1L))), "qid", "id", "rnk", k = 0)
    }
    intercept[IllegalArgumentException] {
      Fusion.rrf(Seq(lst((1L, 1L, 1L))), "qid", "id", "rnk", k = 1, rrfK = -1L)
    }
  }
}
