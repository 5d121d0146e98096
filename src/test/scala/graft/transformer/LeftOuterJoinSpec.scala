package graft.transformer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

/** joinType="left": every INPUT row survives; match-less rows carry null
  * external columns (and null distance). Both physical strategies —
  * broadcast kernel and partitioned grid — must agree with each other
  * and with the inner variant on the matched subset. */
class LeftOuterJoinSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "BroadcastSpatialJoin joinType=left"

  // 10 customers on a line; pois only near the first 5 — the far half is
  // matchless under withindist, and a modular condition starves nearest
  private def input: DataFrame =
    (0 until 10).map(i => (i.toLong, i * 1.0, 0.0)).toDF("cid", "lon", "lat")

  private def pois: DataFrame =
    (0 until 5).map(i => (i.toLong, i * 1.0 + 0.001, 0.0)).toDF("poi_id", "plon", "plat")

  private def bsj(view: String) = new BroadcastSpatialJoin()
    .setDataset(view).setDatasetPoint("plon, plat").setInputPoint("lon, lat")
    .setDataColumns("poi_id")

  it should "keep unmatched input rows with null externals (kernel, withindist)" in {
    pois.createOrReplaceTempView("lo_poi_k")
    val out = bsj("lo_poi_k").setBroadcast("dataset")
      .setPredicate("withindist 50000").setDistColAlias("dm").setJoinType("left")
      .transform(input)
    out.count() shouldBe 10
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    (0 until 5).foreach { i => byId(i.toLong).getLong(3) shouldBe i.toLong }
    (5 until 10).foreach { i =>
      byId(i.toLong).isNullAt(3) shouldBe true
      byId(i.toLong).isNullAt(4) shouldBe true // distance null too
    }
  }

  it should "match the grid strategy row-for-row (withindist, left)" in {
    pois.createOrReplaceTempView("lo_poi_g")
    def run(mode: String): Set[String] =
      bsj("lo_poi_g").setBroadcast(mode)
        .setPredicate("withindist 50000").setDistColAlias("dm").setJoinType("left")
        .transform(input).collect().map(_.mkString("|")).toSet
    run("none") shouldBe run("dataset")
  }

  it should "null-match nearest rows starved by the extra condition (kernel + grid)" in {
    pois.createOrReplaceTempView("lo_poi_n")
    def run(mode: String): Map[Long, Any] =
      bsj("lo_poi_n").setBroadcast(mode).setPredicate("nearest").setJoinType("left")
        .setJoinCondition("right.poi_id = left.cid") // cid >= 5 has no poi
        .transform(input)
        .collect().map(r => r.getLong(0) -> r.get(3)).toMap
    val kernel = run("dataset")
    kernel.size shouldBe 10
    (0 until 5).foreach(i => kernel(i.toLong) shouldBe i.toLong)
    (5 until 10).foreach(i => assert(kernel(i.toLong) == null))
    run("none") shouldBe kernel
  }

  it should "null-match every input row against an EMPTY external side (grid nearest)" in {
    pois.where(lit(false)).createOrReplaceTempView("lo_poi_empty")
    val out = bsj("lo_poi_empty").setBroadcast("none")
      .setPredicate("nearest").setJoinType("left")
      .transform(input)
    out.count() shouldBe 10
    out.where(col("poi_id").isNotNull).count() shouldBe 0
  }

  it should "keep null-geometry input rows in left mode (kernel + grid)" in {
    val withNull = input.withColumn("lon",
      when(col("cid") === 7L, lit(null).cast("double")).otherwise(col("lon")))
    pois.createOrReplaceTempView("lo_poi_ng")
    def run(mode: String): Map[Long, Any] =
      bsj("lo_poi_ng").setBroadcast(mode)
        .setPredicate("withindist 50000").setJoinType("left")
        .transform(withNull).collect().map(r => r.getLong(0) -> r.get(3)).toMap
    val kernel = run("dataset")
    assert(kernel(7L) == null) // null lon -> null geometry -> kept, null match
    kernel(3L) shouldBe 3L
    run("none") shouldBe kernel
  }

  it should "agree with inner on the matched subset" in {
    pois.createOrReplaceTempView("lo_poi_sub")
    val left = bsj("lo_poi_sub").setBroadcast("dataset")
      .setPredicate("withindist 50000").setJoinType("left")
      .transform(input).where(col("poi_id").isNotNull)
      .collect().map(_.mkString("|")).toSet
    val inner = bsj("lo_poi_sub").setBroadcast("dataset")
      .setPredicate("withindist 50000")
      .transform(input).collect().map(_.mkString("|")).toSet
    left shouldBe inner
  }

  it should "reject joinType=left with broadcast=input" in {
    pois.createOrReplaceTempView("lo_poi_rej")
    val e = intercept[IllegalArgumentException] {
      bsj("lo_poi_rej").setBroadcast("input").setPredicate("nearest")
        .setJoinType("left").transform(input)
    }
    e.getMessage should include("iterated side")
  }

  it should "reject joinType=left with gridKnn > 1" in {
    pois.createOrReplaceTempView("lo_poi_rejk")
    val e = intercept[IllegalArgumentException] {
      bsj("lo_poi_rejk").setBroadcast("none").setPredicate("nearest")
        .setGridKnn("3").setJoinType("left").transform(input)
    }
    e.getMessage should include("gridKnn = 1")
  }

  it should "reject an unknown joinType" in {
    pois.createOrReplaceTempView("lo_poi_rejt")
    val e = intercept[IllegalArgumentException] {
      bsj("lo_poi_rejt").setJoinType("full").transform(input)
    }
    e.getMessage should include("joinType")
  }
}
