package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark
import graft.transformer.BroadcastSpatialJoin

/**
 * Streaming spatial join: because the grid path (broadcast="none") is one
 * Catalyst plan (no RDD drop-out, no driver collect), the SAME transformer
 * works on a streaming input DataFrame as a stream-static inner join —
 * something the reference's collect+broadcast kernel architecture cannot
 * express at all.
 */
class StreamingSpatialJoinSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "grid spatial join on a stream"

  it should "join streaming points against a static polygon table" in {
    val polys = Seq(
      ("cell_a", "POLYGON((0 0,2 0,2 2,0 2,0 0))"),
      ("cell_b", "POLYGON((10 10,12 10,12 12,10 12,10 10))"))
      .toDF("cell_name", "wkt")
    polys.createOrReplaceTempView("stream_polys")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double, Double)]
    val streamIn = mem.toDF().toDF("id", "lon", "lat")
    streamIn.isStreaming shouldBe true

    val joined = new BroadcastSpatialJoin()
      .setDataset("stream_polys").setDatasetWKT("wkt")
      .setInputPoint("lon, lat").setDataColumns("cell_name")
      .setPredicate("within").setBroadcast("none")
      .transform(streamIn)
    joined.isStreaming shouldBe true

    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(("p1", 1.0, 1.0), ("p2", 11.0, 11.0), ("p3", 50.0, 50.0))
      q.processAllAvailable()
      val got = spark.table("ssj_test")
        .select("id", "cell_name").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      got shouldBe Set(("p1", "cell_a"), ("p2", "cell_b")) // p3 matches nothing

      mem.addData(("p4", 0.5, 1.5))
      q.processAllAvailable()
      spark.table("ssj_test").count() shouldBe 3
    } finally q.stop()
  }
}
