package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class TrendingSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  behavior of "Trending.gramWindows"

  it should "count distinct-per-doc grams per tumbling window (batch)" in {
    val docs = Seq(
      (ts(1), "hot phrase here"), (ts(2), "hot phrase again"),
      (ts(3), "hot phrase hot phrase"), // duplicate bigram counts ONCE
      (ts(70), "hot phrase later window"))
      .toDF("ts", "text")
    val out = Trending.gramWindows(docs, "ts", "text", n = 2,
        windowDur = "1 minute", minDf = 2)
      .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
    // only "hot phrase" clears minDf=2, in the first window (df=3)
    out.map(t => (t._2, t._3)) shouldBe Set(("hot phrase", 3L))
  }

  it should "emit closed windows under a watermark and match the batch twin" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val in = mem.toDF().toDF("ts", "text")
    val out = Trending.gramWindows(in, "ts", "text", n = 2,
      windowDur = "1 minute", minDf = 2, watermark = "0 seconds")
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName("trending_test")
      .outputMode("append").start()
    try {
      val batch1 = Seq((ts(1), "alpha beta one"), (ts(5), "alpha beta two"))
      val batch2 = Seq((ts(130), "gamma delta x"), (ts(131), "gamma delta y"))
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable() // watermark passes window 1
      val emitted = spark.table("trending_test")
        .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
      emitted.map(t => (t._2, t._3)) shouldBe Set(("alpha beta", 2L))
      // batch twin over ALL data agrees on the emitted window
      val batchAll = Trending.gramWindows((batch1 ++ batch2).toDF("ts", "text"),
          "ts", "text", 2, "1 minute", 2)
        .collect().map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3))).toSet
      emitted.subsetOf(batchAll) shouldBe true
    } finally q.stop()
  }

  it should "validate inputs" in {
    val docs = Seq((ts(1), "a b")).toDF("ts", "text")
    an[IllegalArgumentException] should be thrownBy
      Trending.gramWindows(docs, "ts", "text", n = 0)
    an[IllegalArgumentException] should be thrownBy
      Trending.gramWindows(docs, "ts", "text", n = 2, minDf = 0)
  }
}
