package graft.transformer

import graft.SparkTestKit
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * broadcast="auto": cost-based choice between broadcasting the external
 * side and the partitioned grid kernel, driven by the external plan's
 * size estimate vs `spark.sql.autoBroadcastJoinThreshold` — the same
 * config Spark's own join planning honors. Both candidates share the
 * broadcast=external orientation, so results are identical; only the
 * physical plan changes.
 */
class CostBasedStrategySpec extends AnyFlatSpec with Matchers {

  import BroadcastSpatialJoinSpec.{points, pois}
  import SparkTestKit.{assertDataFrameEquals, spark}

  behavior of "broadcast=auto"

  private def transformer(view: String) = {
    pois("d1, 1.1, 1.1 | d2, 2.1, 2.1").createOrReplaceTempView(view)
    new BroadcastSpatialJoin()
      .setDataset(view).setDataColumns("poi_id")
      .setDatasetPoint("lon, lat").setInputPoint("lon, lat")
      .setBroadcast("auto")
  }

  private def withThreshold[A](value: String)(body: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", value)
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  it should "broadcast a small external table" in {
    val out = withThreshold("10MB") {
      transformer("poi_auto_small").transform(points("i1, 1, 1 | i2, 2, 2"))
    }
    // the broadcast kernel plans the custom Catalyst exec node
    out.queryExecution.executedPlan.toString should include ("BroadcastSpatialJoin")
    assertDataFrameEquals(out,
      BroadcastSpatialJoinSpec.joined("i1, 1, 1, d1 | i2, 2, 2, d2")
        .selectExpr("id", "lon", "lat", "poi_id"))
  }

  it should "grid-join a too-large external table, same results" in {
    // a 1-byte threshold makes every table "too large" — the decision
    // logic is what's under test, not actual table size
    val out = withThreshold("1") {
      transformer("poi_auto_large").transform(points("i1, 1, 1 | i2, 2, 2"))
    }
    out.queryExecution.executedPlan.toString should not include "BroadcastSpatialJoin"
    assertDataFrameEquals(out,
      BroadcastSpatialJoinSpec.joined("i1, 1, 1, d1 | i2, 2, 2, d2")
        .selectExpr("id", "lon", "lat", "poi_id"))
  }

  it should "never broadcast when the threshold is disabled (-1)" in {
    val out = withThreshold("-1") {
      transformer("poi_auto_off").transform(points("i1, 1, 1 | i2, 2, 2"))
    }
    out.queryExecution.executedPlan.toString should not include "BroadcastSpatialJoin"
    out.count() shouldBe 2
  }

  it should "match external-broadcast results under auto for withindist + distance" in {
    val input = points("i1, 1, 1 | i2, 2, 2")
    def make(view: String) = transformer(view)
      .setPredicate("withindist 20000").setDistColAlias("distance")
    val auto = withThreshold("10MB") { make("poi_auto_wd1").transform(input) }
    val grid = withThreshold("1") { make("poi_auto_wd2").transform(input) }
    assertDataFrameEquals(auto, grid)
  }
}
