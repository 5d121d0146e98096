package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

/** The windowed aggregation must behave identically as a batch plan and
  * as a Structured Streaming query (watermark + window state). */
class EventWindowsSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private val rows = Seq(
    ("2024-01-01 10:05:00", "click", 1.5),
    ("2024-01-01 10:55:00", "click", 2.5),
    ("2024-01-01 10:30:00", "view", 10.0),
    ("2024-01-01 11:10:00", "click", 4.0))

  private def toDf(s: Seq[(String, String, Double)]) =
    s.toDF("t", "event_type", "value").selectExpr("timestamp(t) as ts", "event_type", "value")

  behavior of "EventWindows.hourly"

  it should "aggregate tumbling hourly windows in batch mode" in {
    val out = EventWindows.hourly(toDf(rows)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
    val h11 = Timestamp.valueOf("2024-01-01 11:00:00").getTime / 1000
    out shouldBe Set((h10, "click", 2L, 4.0), (h10, "view", 1L, 10.0), (h11, "click", 1L, 4.0))
  }

  it should "produce the same result through a streaming query" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val stream = EventWindows.hourly(
      mem.toDF().toDF("t", "event_type", "value")
        .selectExpr("timestamp(t) as ts", "event_type", "value"))
    stream.isStreaming shouldBe true
    val q = stream.writeStream.format("memory").queryName("ew_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("ew_test").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventWindows.hourly(toDf(rows)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      got shouldBe batch
    } finally q.stop()
  }
}
