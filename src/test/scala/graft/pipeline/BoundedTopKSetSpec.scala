package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark
import graft.functions.BoundedTopKSet

/** The k-nearest grid join's aggregation kernel: k smallest DISTINCT
  * values, ascending, O(k) state. Exercised through real group-bys so the
  * partial/merge/serialize path (map-side combine + shuffle) runs. */
class BoundedTopKSetSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "BoundedTopKSet"

  it should "keep the k smallest distinct values in ascending order" in {
    val df = Seq(
      ("a", 5L), ("a", 1L), ("a", 3L), ("a", 2L), ("a", 4L),
      ("b", 7L), ("b", 7L), ("b", 9L)).toDF("g", "v")
      // many partitions so merge() and serialize() actually run
      .repartition(8)
    val got = df.groupBy("g").agg(BoundedTopKSet.topKSet(col("v"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    got("a") shouldBe Seq(1L, 2L, 3L)
    got("b") shouldBe Seq(7L, 9L) // duplicates collapse, fewer than k stays short
  }

  it should "not let duplicates evict genuine k-th candidates" in {
    // the CollectTopK failure mode: [1, 1, 2] in a bounded heap of k=2
    // loses the 2. The set holds the 2 smallest DISTINCT values instead.
    val df = Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 2L), ("g", 3L))
      .toDF("g", "v").repartition(5)
    val got = df.groupBy("g").agg(BoundedTopKSet.topKSet(col("v"), 2).as("top"))
      .head.getSeq[Long](1)
    got shouldBe Seq(1L, 2L)
  }

  it should "order structs lexicographically and skip nulls" in {
    val df = Seq(
      (1L, Some(2.0), "x"), (1L, Some(1.0), "z"), (1L, Some(1.0), "a"),
      (1L, None, "dropped"), (1L, Some(9.0), "y")).toDF("g", "d", "s")
    val got = df.groupBy("g")
      .agg(BoundedTopKSet.topKSet(
        when(col("d").isNotNull, struct(col("d"), col("s"))), 3).as("top"))
      .head.getSeq[org.apache.spark.sql.Row](1)
    got.map(r => (r.getDouble(0), r.getString(1))) shouldBe
      Seq((1.0, "a"), (1.0, "z"), (2.0, "x"))
  }
}
