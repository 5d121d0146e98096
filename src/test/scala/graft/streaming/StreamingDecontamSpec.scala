package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class StreamingDecontamSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "StreamingDecontam.contaminated"

  private def ts(s: String) = Timestamp.valueOf(s"2026-01-01 $s")
  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  private val question = toks("q", 30)
  private lazy val bench = Seq(Tuple1(question)).toDF("text")

  it should "flag only contaminated documents on a stream, once per content within the watermark" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val in = mem.toDF().toDF("id", "text", "ts")
    val out = StreamingDecontam.contaminated(in, bench, "text", "text", "ts",
      k = 8, watermark = "10 minutes")
    out.isStreaming shouldBe true
    out.columns.toSeq shouldBe Seq("id", "text", "ts")

    val dirty = toks("h", 50) + " " + question // the quote inside a host
    val q = out.writeStream.format("memory").queryName("sdecontam_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, dirty, ts("10:00:00")),
        (2L, toks("u", 60), ts("10:00:01"))) // clean
      q.processAllAvailable()
      spark.table("sdecontam_test").select("id").as[Long].collect().toSeq shouldBe Seq(1L)

      // the same contaminated content re-crawled within the horizon is
      // flagged once; a NEW contaminated doc flows through
      mem.addData(
        (3L, dirty, ts("10:01:00")),
        (4L, question + " " + toks("z", 40), ts("10:01:30")))
      q.processAllAvailable()
      spark.table("sdecontam_test").select("id").as[Long].collect().toSet shouldBe Set(1L, 4L)
    } finally q.stop()
  }

  it should "match the batch decontamination verdict doc for doc" in {
    val docs = Seq(
      (1L, toks("h", 50) + " " + question, ts("10:00:00")),
      (2L, toks("u", 60), ts("10:00:01")),
      (3L, question, ts("10:00:02"))).toDF("id", "text", "ts")
    val got = StreamingDecontam.contaminated(docs, bench, k = 8)
      .select("id").as[Long].collect().toSeq.sorted
    val batch = graft.dedup.Dedup.decontaminate(docs, "id", "text", bench, "text", k = 8)
      .select("doc").as[Long].collect().toSeq.sorted
    got shouldBe batch
    got shouldBe Seq(1L, 3L)
  }

  it should "reject a streaming benchmark side" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val in = mem.toDF().toDF("id", "text", "ts")
    an[IllegalArgumentException] should be thrownBy
      StreamingDecontam.contaminated(in, in, "text", "text", "ts", k = 8)
  }
}
