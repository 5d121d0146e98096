package graft.curation

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class SnapshotDiffSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "SnapshotDiff"

  it should "classify added / removed / changed and drop unchanged" in {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val neu = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("doc_id", "text")
    val out = SnapshotDiff.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "removed", 3L -> "changed", 4L -> "added")
  }

  it should "treat null text as present content, not an absent row" in {
    val old = Seq((1L, Option("a")), (2L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val neu = Seq((1L, Option.empty[String]), (2L, Option("b")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = SnapshotDiff.diff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // null -> text and text -> null are CHANGES; null -> null is unchanged
    out shouldBe Map(1L -> "changed", 2L -> "changed")
  }

  it should "roll up to per-status counts" in {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e")).toDF("doc_id", "text")
    val neu = Seq((2L, "b2"), (3L, "c2"), (4L, "d"), (5L, "e")).toDF("doc_id", "text")
    val out = SnapshotDiff.diffSummary(old, neu, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L)
  }

  it should "emit nothing for identical snapshots" in {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    SnapshotDiff.diff(snap, snap, "doc_id", "text").count() shouldBe 0L
  }
}
