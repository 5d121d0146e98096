package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class ExpectationsSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "Expectations"

  it should "evaluate all row-level rules of a table in one pass" in {
    val df = Seq((1, Some(10)), (2, Some(-5)), (3, None)).toDF("id", "v")
    val out = Expectations.tableRules(df, Seq(
        "v_not_null" -> col("v").isNull,
        "v_positive" -> !(col("v") > 0),
        "id_positive" -> !(col("id") > 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    out("v_not_null") shouldBe ((3L, 1L, false))
    // null predicate counts as a violation: v=None makes !(v>0) null
    out("v_positive") shouldBe ((3L, 2L, false))
    out("id_positive") shouldBe ((3L, 0L, true))
  }

  it should "count surplus rows for key uniqueness" in {
    val df = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a")).toDF("k1", "k2")
    val r = Expectations.uniqueKey(df, Seq("k1", "k2"), "pk").head
    (r.getLong(1), r.getLong(2), r.getBoolean(3)) shouldBe ((4L, 1L, false))
    Expectations.uniqueKey(df.dropDuplicates(), Seq("k1", "k2"), "pk")
      .head.getBoolean(3) shouldBe true
  }

  it should "find FK orphans, excluding null child keys" in {
    val child = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Expectations.referential(child, Seq("fk"), parent, Seq("pk"), "fk").head
    // 3 non-null checked, 1 orphan (9); the null row is out of scope
    (r.getLong(1), r.getLong(2), r.getBoolean(3)) shouldBe ((3L, 1L, false))
  }

  it should "union checks into one report and validate inputs" in {
    val df = Seq((1, 2)).toDF("a", "b")
    val rep = Expectations.report(
      Expectations.tableRules(df, Seq("a_pos" -> !(col("a") > 0))),
      Expectations.uniqueKey(df, Seq("a"), "a_unique"))
    rep.columns.toSeq shouldBe Seq("rule", "n_checked", "n_bad", "pass")
    rep.count() shouldBe 2L
    an[IllegalArgumentException] should be thrownBy
      Expectations.tableRules(df, Nil)
    an[IllegalArgumentException] should be thrownBy
      Expectations.tableRules(df, Seq("x" -> lit(true), "x" -> lit(false)))
    an[IllegalArgumentException] should be thrownBy
      Expectations.referential(df, Seq("a"), df, Seq("a", "b"), "r")
  }

  it should "report empty tables as passing with zero checked rows" in {
    val empty = Seq.empty[(Int, Int)].toDF("a", "b")
    Expectations.tableRules(empty, Seq("a_pos" -> !(col("a") > 0)))
      .head.getLong(2) shouldBe 0L
    val r = Expectations.uniqueKey(empty, Seq("a"), "u").head
    (r.getLong(1), r.getLong(2), r.getBoolean(3)) shouldBe ((0L, 0L, true))
    val rr = Expectations.referential(empty, Seq("a"), empty, Seq("b"), "f").head
    (rr.getLong(1), rr.getLong(2), rr.getBoolean(3)) shouldBe ((0L, 0L, true))
  }
}
