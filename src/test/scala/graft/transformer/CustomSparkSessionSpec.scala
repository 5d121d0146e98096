package graft.transformer

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Smoke test on a hand-rolled user session — NOT the shared SparkTestKit
 * one: `local[1]`, `shuffle.partitions=1`, own catalog. Port of the
 * reference's second-session suite (reference:
 * src/test/scala/me/valik/spark/transformer/
 * BroadcastSpatialJoinTestWithCustomSpark.scala:22-58 with
 * test/DataFrameTestTools.scala:50-59's SimpleLocalSpark fixture).
 *
 * Runs in its own forked JVM (see `Test / testGrouping` in build.sbt) —
 * one SparkContext per JVM, and this suite's whole point is that the
 * transformer works on a session the library did not configure.
 */
class CustomSparkSessionSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[1]")
      .appName("graft-custom-spark")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  behavior of "BroadcastSpatialJoin on a user-configured session"

  private def fixtures() = {
    val s = spark
    import s.implicits._
    val input = Seq(("i1", 1.0, 1.0), ("i2", 2.0, 2.0)).toDF("id", "lon", "lat")
    val poi = Seq(("d1", 1.1, 1.1), ("d2", 2.1, 2.1)).toDF("poi_id", "plon", "plat")
    (input, poi)
  }

  private def transformer(view: String) = new BroadcastSpatialJoin()
    .setDataset(view).setDataColumns("poi_id")
    .setDatasetPoint("plon, plat").setInputPoint("lon, lat")

  it should "run on local[1] with shuffle.partitions=1" in {
    spark.sparkContext.master shouldBe "local[1]"
    spark.conf.get("spark.sql.shuffle.partitions") shouldBe "1"

    val (input, poi) = fixtures()
    poi.createOrReplaceTempView("poi_custom")
    val out = transformer("poi_custom").transform(input)
    out.columns.toSeq shouldBe Seq("id", "lon", "lat", "poi_id")
    out.collect().map(r => (r.getString(0), r.getString(3))).sorted shouldBe
      Array(("i1", "d1"), ("i2", "d2"))
  }

  it should "produce the golden distances on the user session" in {
    val (input, poi) = fixtures()
    poi.createOrReplaceTempView("poi_custom_dist")
    val out = transformer("poi_custom_dist").setDistColAlias("distance").transform(input)
    out.collect().map(r => (r.getString(0), r.getInt(4))).sorted shouldBe
      Array(("i1", 15689), ("i2", 15685))
  }

  it should "run the grid kernel under one shuffle partition" in {
    val (input, poi) = fixtures()
    poi.createOrReplaceTempView("poi_custom_grid")
    val out = transformer("poi_custom_grid").setBroadcast("none").transform(input)
    out.collect().map(r => (r.getString(0), r.getString(3))).sorted shouldBe
      Array(("i1", "d1"), ("i2", "d2"))
  }

  it should "save and load through the pipeline API on the user session" in {
    import org.apache.spark.ml.Pipeline
    val (input, poi) = fixtures()
    poi.createOrReplaceTempView("poi_custom_pipe")
    val path = java.nio.file.Files.createTempDirectory("graft-pipe").toString + "/p"
    new Pipeline().setStages(Array(transformer("poi_custom_pipe"))).write.save(path)
    val loaded = Pipeline.load(path)
    loaded.fit(input).transform(input).count() shouldBe 2
  }
}
