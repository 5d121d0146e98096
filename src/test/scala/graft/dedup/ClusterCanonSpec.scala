package graft.dedup

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestKit._

class ClusterCanonSpec extends AnyFunSuite {
  import spark.implicits._

  private def docs(rows: (Long, java.lang.Long)*) =
    rows.toDF("id", "len")

  private def pairs(rows: (Long, Long)*) =
    rows.toDF("doc_i", "doc_j")

  private def run(d: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Dedup.clusterCanonBy(d, "id", "len", p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("best score wins per component; singletons map to themselves") {
    // component {1,2,3} via 1-2, 2-3 (transitive); component {5,6}; 9 alone
    val d = docs((1L, 10L), (2L, 30L), (3L, 20L), (5L, 7L), (6L, 7L), (9L, 1L))
    val got = run(d, pairs((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      5L -> 5L, 6L -> 5L, // tie at 7 → ascending id
      9L -> 9L))
  }

  test("null scores never win but never disappear; all-null keeps min id") {
    val d = docs((1L, null), (2L, 4L), (7L, null), (8L, null))
    val got = run(d, pairs((1L, 2L), (7L, 8L)))
    assert(got == Map(1L -> 2L, 2L -> 2L, 7L -> 7L, 8L -> 7L))
  }

  test("ascending policy keeps the smallest score") {
    val d = docs((1L, 10L), (2L, 3L))
    val got = Dedup.clusterCanonBy(d, "id", "len", pairs((1L, 2L)),
        descending = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L))
  }
}
