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

  it should "handle null-keyed structs in the quick-reject path (regression)" in {
    // structs whose FIRST field (the quick-reject key) is null sort
    // before every non-null key. Once the buffer is full of them, a
    // non-null-keyed candidate must be rejected WITHOUT comparing
    // against the null k-th key (keyOrd.compare(kv, null) would NPE).
    // One partition + null rows first forces exactly that update order.
    val df = Seq(
      (1L, Option.empty[Double], "a"),
      (1L, Option.empty[Double], "b"),
      (1L, Some(5.0), "d"),
      (1L, Some(7.0), "e")).toDF("g", "d", "s").coalesce(1)
    val got = df.groupBy("g")
      .agg(BoundedTopKSet.topKSet(struct(col("d"), col("s")), 2).as("top"))
      .head.getSeq[org.apache.spark.sql.Row](1)
    got.map(r => (if (r.isNullAt(0)) null else r.getDouble(0), r.getString(1))) shouldBe
      Seq((null, "a"), (null, "b"))
  }

  it should "degrade gracefully on a zero-field struct (regression)" in {
    // struct() is orderable (all instances compare equal) but has no
    // primary key for the quick-reject — the optimization must disable
    // itself instead of calling valExprs.head on an empty list
    val df = Seq(("g", 1), ("g", 2), ("g", 3)).toDF("g", "v")
    val got = df.groupBy("g")
      .agg(BoundedTopKSet.topKSet(struct(), 1).as("top"))
      .head.getSeq[org.apache.spark.sql.Row](1)
    // all empty structs are duplicates of each other — one survivor
    got.length shouldBe 1
    got.head.length shouldBe 0
  }
}
