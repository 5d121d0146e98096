package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class StreamingDedupSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "StreamingDedup.firstPerContent"

  private def ts(s: String) = Timestamp.valueOf(s"2026-01-01 $s")

  it should "drop in-watermark duplicates on a stream, keep distinct content" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val in = mem.toDF().toDF("id", "text", "ts")
    val out = StreamingDedup.firstPerContent(in, "text", "ts", "10 minutes")
    out.isStreaming shouldBe true
    out.columns.toSeq shouldBe Seq("id", "text", "ts") // digest column dropped

    val q = out.writeStream.format("memory").queryName("sdedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "aaa", ts("10:00:00")),
        (2L, "aaa", ts("10:00:05")), // duplicate content, within watermark
        (3L, "bbb", ts("10:00:01")))
      q.processAllAvailable()
      val first = spark.table("sdedup_test")
      first.count() shouldBe 2
      first.select("text").as[String].collect().toSet shouldBe Set("aaa", "bbb")

      // a later duplicate still inside the watermark horizon is dropped
      mem.addData((4L, "aaa", ts("10:01:00")))
      q.processAllAvailable()
      spark.table("sdedup_test").count() shouldBe 2

      // genuinely new content flows through
      mem.addData((5L, "ccc", ts("10:02:00")))
      q.processAllAvailable()
      spark.table("sdedup_test").count() shouldBe 3
    } finally q.stop()
  }

  it should "keep the min-event-time row per content in batch mode" in {
    val batch = Seq(
      (2L, "aaa", ts("10:00:05")),
      (1L, "aaa", ts("10:00:00")),
      (3L, "bbb", ts("10:00:01"))).toDF("id", "text", "ts")
    val out = StreamingDedup.firstPerContent(batch, "text", "ts")
    out.columns.toSeq shouldBe Seq("id", "text", "ts")
    out.select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 3L)
  }

  behavior of "StreamingDedup.firstPerNormalized"

  it should "collapse case/punctuation variants on a stream, keep the original text" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingDedup.firstPerNormalized(
      mem.toDF().toDF("id", "text", "ts"), "text", "ts", "10 minutes")
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName("sdedupn_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "Hello, World", ts("10:00:00")),
        (2L, "  hello world !!", ts("10:00:05")), // same normalized key
        (3L, "other text", ts("10:00:01")))
      q.processAllAvailable()
      val got = spark.table("sdedupn_test").select("id", "text")
        .as[(Long, String)].collect().toSet
      // the survivor keeps its ORIGINAL (un-normalized) text
      got shouldBe Set((1L, "Hello, World"), (3L, "other text"))
    } finally q.stop()
  }

  it should "match the batch twin's min-ts survivor per normalized key" in {
    val batch = Seq(
      (2L, "HELLO world", ts("10:00:05")),
      (1L, "hello, world!", ts("10:00:00")),
      (3L, "bbb", ts("10:00:01"))).toDF("id", "text", "ts")
    val out = StreamingDedup.firstPerNormalized(batch, "text", "ts")
    out.select("id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 3L)
    // original text preserved on the survivor
    out.where($"id" === 1L).select("text").as[String].collect().head shouldBe
      "hello, world!"
  }
}
