package graft.curation

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class ChangeHistorySpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "ChangeHistory.scd2"

  it should "collapse consecutive repeats into episodes with valid ranges and versions" in {
    val log = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "bronze"), (1L, 30L, "gold"),
      (1L, 40L, "gold"), (1L, 50L, "bronze"),
      (2L, 10L, "gold")).toDF("id", "ts", "tier")
    val out = ChangeHistory.scd2(log, "id", "ts", Seq("tier"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4))).toSet
    out shouldBe Set(
      (1L, "bronze", 10L, 30L, 1L),
      (1L, "gold", 30L, 50L, 2L),
      (1L, "bronze", 50L, -1L, 3L), // re-entered value opens a NEW episode
      (2L, "gold", 10L, -1L, 1L))
  }

  it should "treat null-to-value flips as changes (null-safe compare)" in {
    val log = Seq((1L, 1L, Option.empty[String]), (1L, 2L, Some("a")),
      (1L, 3L, Option.empty[String]), (1L, 4L, Option.empty[String]))
      .toDF("id", "ts", "v")
    val out = ChangeHistory.scd2(log, "id", "ts", Seq("v"))
      .collect().map(r => (Option(r.getString(1)), r.getLong(2))).toSet
    out shouldBe Set((None, 1L), (Some("a"), 2L), (None, 3L))
  }

  it should "order duplicate timestamps deterministically and collapse exact duplicates" in {
    val log = Seq((1L, 10L, "b"), (1L, 10L, "a"), (1L, 10L, "a")).toDF("id", "ts", "v")
    val out = ChangeHistory.scd2(log, "id", "ts", Seq("v"))
      .collect().map(r => (r.getString(1), r.getLong(4))).toSet
    // (ts, value) order: a before b; exact duplicate 'a' collapses
    out shouldBe Set(("a", 1L), ("b", 2L))
  }

  behavior of "ChangeHistory.scd2Stream"

  it should "emit closed episodes online and finalize open ones on idle timeout" in {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.OutputMode
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val in = mem.toDF().toDF("id", "ts", "tier")
    val out = ChangeHistory.scd2Stream(in, "id", "ts", "tier",
      watermark = "0 seconds", idleTimeoutMicros = 60L * 1000000)
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName("scd2_stream_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts(10), "bronze"), (1L, ts(20), "bronze"))
      q.processAllAvailable()
      spark.table("scd2_stream_test").count() shouldBe 0L // episode still open
      // a flip in a LATER batch closes the first episode
      mem.addData((1L, ts(30), "gold"))
      q.processAllAvailable()
      val closed = spark.table("scd2_stream_test")
        .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      closed.toSeq shouldBe Seq(("bronze", ts(10).getTime * 1000, ts(30).getTime * 1000, 1L))
      // advancing the watermark past maxTs + idleTimeout finalizes the
      // open gold episode with null valid_to
      mem.addData((2L, ts(500), "x"))
      q.processAllAvailable()
      mem.addData((2L, ts(501), "x")) // one more batch so timeouts fire
      q.processAllAvailable()
      val all = spark.table("scd2_stream_test")
        .collect().map(r => (r.getString(0), r.getString(1), r.isNullAt(3)))
      all should contain (("1", "gold", true))
    } finally q.stop()
  }

  it should "equal the batch twin's closed episodes when run on a batch frame" in {
    import java.sql.Timestamp
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val rnd = new scala.util.Random(17)
    val log = Seq.tabulate(400)(i =>
      (rnd.nextInt(8).toLong, ts(rnd.nextInt(200).toLong), s"v${rnd.nextInt(3)}"))
      .toDF("id", "ts", "tier")
    val streamOp = ChangeHistory.scd2Stream(log, "id", "ts", "tier")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val batch = ChangeHistory.scd2(
        log.selectExpr("cast(id as string) id", "unix_micros(ts) us", "tier"),
        "id", "us", Seq("tier"))
      .where("valid_to is not null")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    streamOp shouldBe batch
  }

  it should "chain valid ranges gaplessly per key and validate inputs" in {
    val rnd = new scala.util.Random(5)
    val log = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, s"v${rnd.nextInt(3)}"))
      .toDF("id", "ts", "v")
    val rows = ChangeHistory.scd2(log, "id", "ts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).values.foreach { eps =>
      val sorted = eps.sortBy(_._4)
      sorted.map(_._4).toSeq shouldBe (1L to sorted.size).toSeq // dense versions
      sorted.sliding(2).foreach {
        case Array((_, _, to1, _), (_, from2, _, _)) => to1 shouldBe from2
        case _ =>
      }
      sorted.last._3 shouldBe Long.MaxValue // the current episode is open
    }
    an[IllegalArgumentException] should be thrownBy
      ChangeHistory.scd2(log, "id", "ts", Nil)
    an[IllegalArgumentException] should be thrownBy
      ChangeHistory.scd2(log, "id", "ts", Seq("ts"))
  }

  behavior of "ChangeHistory.pointInTime"

  it should "attach the episode valid at each fact timestamp" in {
    val log = Seq((1L, 10L, "bronze"), (1L, 30L, "gold"), (1L, 50L, "bronze"),
      (2L, 20L, "gold")).toDF("id", "ts", "tier")
    val hist = ChangeHistory.scd2(log, "id", "ts", Seq("tier"))
    val facts = Seq((100L, 1L, 10L), (101L, 1L, 29L), (102L, 1L, 30L),
      (103L, 1L, 99L), (104L, 2L, 25L), (105L, 3L, 10L), (106L, 1L, 5L))
      .toDF("fact_id", "id", "fts")
    val out = ChangeHistory.pointInTime(facts, hist, Seq("id"), "fts")
      .select("fact_id", "tier", "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    out shouldBe Set(
      (100L, "bronze", 1L), // at episode start: inclusive
      (101L, "bronze", 1L), (102L, "gold", 2L), (103L, "bronze", 3L),
      (104L, "gold", 1L))   // 105 (unknown key) and 106 (before first) drop
  }

  it should "not let zero-length same-instant episodes shadow the live one" in {
    // same-instant flip at ts=10: 'a' episode is zero-length; a fact AT
    // ts=10 must match the surviving 'b' episode, not drop
    val log = Seq((1L, 10L, "b"), (1L, 10L, "a")).toDF("id", "ts", "tier")
    val hist = ChangeHistory.scd2(log, "id", "ts", Seq("tier"))
    val facts = Seq((100L, 1L, 10L)).toDF("fact_id", "id", "fts")
    val out = ChangeHistory.pointInTime(facts, hist, Seq("id"), "fts")
      .select("fact_id", "tier").collect().map(r => (r.getLong(0), r.getString(1)))
    out.toSeq shouldBe Seq((100L, "b"))
  }

  it should "respect gaps in the history and keep gap facts on a left join" in {
    // hand-gapped history: [10,20) then [40,null) — nothing valid in [20,40)
    val hist = Seq((1L, "x", 10L, Some(20L), 1L), (1L, "y", 40L, None, 2L))
      .toDF("id", "tier", "valid_from", "valid_to", "version")
    val facts = Seq((100L, 1L, 15L), (101L, 1L, 25L), (102L, 1L, 45L))
      .toDF("fact_id", "id", "fts")
    val inner = ChangeHistory.pointInTime(facts, hist, Seq("id"), "fts")
      .select("fact_id", "tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    inner shouldBe Set((100L, "x"), (102L, "y")) // 101 falls in the gap
    val left = ChangeHistory.pointInTime(facts, hist, Seq("id"), "fts",
        joinType = "left")
      .select("fact_id", "tier")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    left shouldBe Set((100L, Some("x")), (101L, None), (102L, Some("y")))
  }

  it should "reject colliding payload names and bad join types" in {
    val hist = Seq((1L, "x", 10L, Some(20L))).toDF("id", "fts", "valid_from", "valid_to")
    val facts = Seq((100L, 1L, 15L)).toDF("fact_id", "id", "fts")
    an[IllegalArgumentException] should be thrownBy
      ChangeHistory.pointInTime(facts, hist, Seq("id"), "fts") // `fts` collides
    val hist2 = Seq((1L, "x", 10L, Some(20L))).toDF("id", "tier", "valid_from", "valid_to")
    an[IllegalArgumentException] should be thrownBy
      ChangeHistory.pointInTime(facts, hist2, Seq("id"), "fts", joinType = "full")
    an[IllegalArgumentException] should be thrownBy
      ChangeHistory.pointInTime(facts, hist2.drop("valid_to"), Seq("id"), "fts")
  }
}
