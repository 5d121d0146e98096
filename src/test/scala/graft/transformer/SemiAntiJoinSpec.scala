package graft.transformer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

/** joinType="semi"/"anti": existence filters over the spatial relation —
  * input schema only, one row per qualifying input row regardless of
  * match multiplicity; semi + anti partition the input exactly. */
class SemiAntiJoinSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "BroadcastSpatialJoin joinType=semi/anti"

  private def input: DataFrame =
    (0 until 10).map(i => (i.toLong, i * 1.0, 0.0)).toDF("cid", "lon", "lat")

  // two pois near customer 1 (multiplicity!), one near customer 4
  private def pois: DataFrame = Seq(
    (10L, 1.0001, 0.0), (11L, 0.9999, 0.0), (12L, 4.0001, 0.0))
    .toDF("poi_id", "plon", "plat")

  private def bsj(view: String) = new BroadcastSpatialJoin()
    .setDataset(view).setDatasetPoint("plon, plat").setInputPoint("lon, lat")

  it should "emit each covered input row ONCE (semi) and the complement (anti), kernel == grid" in {
    pois.createOrReplaceTempView("sa_poi")
    def run(mode: String, jt: String): Seq[Long] =
      bsj("sa_poi").setBroadcast(mode)
        .setPredicate("withindist 50000").setJoinType(jt)
        .transform(input).select("cid").as[Long].collect().toSeq.sorted
    val semiK = run("dataset", "semi")
    semiK shouldBe Seq(1L, 4L) // customer 1 matched TWICE, emitted once
    run("none", "semi") shouldBe semiK
    val antiK = run("dataset", "anti")
    antiK shouldBe Seq(0L, 2L, 3L, 5L, 6L, 7L, 8L, 9L)
    run("none", "anti") shouldBe antiK
    // exact partition of the input
    (semiK ++ antiK).sorted shouldBe (0L until 10L)
  }

  it should "keep the input schema untouched (no appended columns), dataColumns optional" in {
    pois.createOrReplaceTempView("sa_poi_schema")
    val out = bsj("sa_poi_schema").setBroadcast("dataset")
      .setPredicate("withindist 50000").setJoinType("semi")
      .transform(input)
    out.columns.toSeq shouldBe Seq("cid", "lon", "lat")
    out.schema shouldBe input.schema
  }

  it should "route null-geometry rows to anti, never semi (kernel + grid)" in {
    val withNull = input.withColumn("lon",
      when(col("cid") === 1L, lit(null).cast("double")).otherwise(col("lon")))
    pois.createOrReplaceTempView("sa_poi_null")
    for (mode <- Seq("dataset", "none")) {
      val semi = bsj("sa_poi_null").setBroadcast(mode)
        .setPredicate("withindist 50000").setJoinType("semi")
        .transform(withNull).select("cid").as[Long].collect().toSeq.sorted
      semi shouldBe Seq(4L) // customer 1's geometry is gone
      val anti = bsj("sa_poi_null").setBroadcast(mode)
        .setPredicate("withindist 50000").setJoinType("anti")
        .transform(withNull).select("cid").as[Long].collect().toSeq.sorted
      anti should contain(1L)
      (semi ++ anti).size shouldBe 10
    }
  }

  it should "honor the extra condition in the existence test" in {
    pois.createOrReplaceTempView("sa_poi_cond")
    val semi = bsj("sa_poi_cond").setBroadcast("dataset")
      .setPredicate("withindist 50000").setJoinType("semi")
      .setJoinCondition("right.poi_id = 12") // only the poi near cust 4 counts
      .transform(input).select("cid").as[Long].collect().toSeq.sorted
    semi shouldBe Seq(4L)
  }

  it should "reject nearest, a distance alias, and broadcast=input" in {
    pois.createOrReplaceTempView("sa_poi_rej")
    an[IllegalArgumentException] should be thrownBy
      bsj("sa_poi_rej").setBroadcast("dataset").setPredicate("nearest")
        .setJoinType("semi").transform(input)
    an[IllegalArgumentException] should be thrownBy
      bsj("sa_poi_rej").setBroadcast("dataset").setPredicate("withindist 50000")
        .setJoinType("anti").setDistColAlias("dm").transform(input)
    an[IllegalArgumentException] should be thrownBy
      bsj("sa_poi_rej").setBroadcast("input").setPredicate("withindist 50000")
        .setJoinType("semi").transform(input)
  }
}
