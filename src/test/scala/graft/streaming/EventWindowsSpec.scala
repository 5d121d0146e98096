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

  behavior of "EventWindows.sliding"

  it should "assign every event to width/slide overlapping windows" in {
    // one event at 10:05 with 1h/15m windows: starts 09:15..10:00
    val one = toDf(Seq(("2024-01-01 10:05:00", "click", 2.0)))
    val out = EventWindows.sliding(one, "1 hour", "15 minutes").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    def s(t: String) = Timestamp.valueOf(t).getTime / 1000
    out shouldBe Set(s("2024-01-01 09:15:00") -> 1L, s("2024-01-01 09:30:00") -> 1L,
      s("2024-01-01 09:45:00") -> 1L, s("2024-01-01 10:00:00") -> 1L)
  }

  it should "produce the same sliding result through a streaming query" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val stream = EventWindows.sliding(
      mem.toDF().toDF("t", "event_type", "value")
        .selectExpr("timestamp(t) as ts", "event_type", "value"),
      "1 hour", "15 minutes")
    stream.isStreaming shouldBe true
    val q = stream.writeStream.format("memory").queryName("ew_slide")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("ew_slide").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = EventWindows.sliding(toDf(rows), "1 hour", "15 minutes").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      got shouldBe batch
      // every event is in exactly 4 windows
      batch.toSeq.map(_._3).sum shouldBe rows.size * 4L
    } finally q.stop()
  }

  behavior of "EventWindows.intervalJoin"

  private val clickRows = Seq(
    (1L, "u1", "2024-01-01 10:00:00"),
    (2L, "u1", "2024-01-01 10:20:00"),
    (3L, "u1", "2024-01-01 11:30:00"),
    (4L, "u2", "2024-01-01 10:25:00"))
  private val buyRows = Seq(
    (101L, "u1", "2024-01-01 10:25:00"), // within 30m of clicks 1 and 2
    (102L, "u1", "2024-01-01 11:45:00"), // within 30m of click 3
    (103L, "u2", "2024-01-01 11:25:00"), // 60m after click 4 — outside
    (104L, "u3", "2024-01-01 10:05:00")) // keyless on the left

  private def clicks(s: Seq[(Long, String, String)]) =
    s.toDF("click_id", "user_id", "t").selectExpr("click_id", "user_id", "timestamp(t) as ts")
  private def buys(s: Seq[(Long, String, String)]) =
    s.toDF("buy_id", "user_id", "bt").selectExpr("buy_id", "user_id", "timestamp(bt) as b_ts")

  private val expectedPairs = Set((1L, 101L), (2L, 101L), (3L, 102L))

  it should "pair events inside the key-scoped interval in batch mode" in {
    val out = EventWindows.intervalJoin(
      clicks(clickRows), buys(buyRows), "user_id", "ts", "b_ts", upper = "30 minutes")
      .select("click_id", "buy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out shouldBe expectedPairs
  }

  it should "produce the same pairs through a watermarked stream-stream join" in {
    implicit val sqlCtx = spark.sqlContext
    val memL = MemoryStream[(Long, String, String)]
    val memR = MemoryStream[(Long, String, String)]
    val stream = EventWindows.intervalJoin(
      memL.toDF().toDF("click_id", "user_id", "t")
        .selectExpr("click_id", "user_id", "timestamp(t) as ts"),
      memR.toDF().toDF("buy_id", "user_id", "bt")
        .selectExpr("buy_id", "user_id", "timestamp(bt) as b_ts"),
      "user_id", "ts", "b_ts", upper = "30 minutes")
    stream.isStreaming shouldBe true
    val q = stream.writeStream.format("memory").queryName("ij_test")
      .outputMode(OutputMode.Append()).start()
    try {
      memL.addData(clickRows: _*)
      memR.addData(buyRows: _*)
      q.processAllAvailable()
      // advance both watermarks past every candidate interval so all
      // joined rows are emitted
      memL.addData((99L, "z_left", "2024-01-02 00:00:00"))
      memR.addData((99L, "z_right", "2024-01-02 00:00:00"))
      q.processAllAvailable()
      val got = spark.table("ij_test").select("click_id", "buy_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got shouldBe expectedPairs
    } finally q.stop()
  }

  it should "honour a nonzero lower bound" in {
    // [10m, 30m] after the click: buy 101 (25m after click 1, 5m after
    // click 2) now only pairs with click 1
    val out = EventWindows.intervalJoin(
      clicks(clickRows), buys(buyRows), "user_id", "ts", "b_ts",
      upper = "30 minutes", lower = "10 minutes")
      .select("click_id", "buy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    out shouldBe Set((1L, 101L), (3L, 102L))
  }

  it should "reject colliding non-key columns and identical ts names" in {
    val l = clicks(clickRows)
    an[IllegalArgumentException] should be thrownBy
      EventWindows.intervalJoin(l, l, "user_id", "ts", "ts", upper = "30 minutes")
    val r = buys(buyRows).withColumnRenamed("buy_id", "click_id")
    an[IllegalArgumentException] should be thrownBy
      EventWindows.intervalJoin(l, r, "user_id", "ts", "b_ts", upper = "30 minutes")
  }

  behavior of "EventWindows.sessions"

  private val sessionRows = Seq(
    // user a: two events 10 min apart (one session), then a 2h gap (new session)
    ("2024-01-01 10:00:00", "a", 1.0),
    ("2024-01-01 10:10:00", "a", 2.0),
    ("2024-01-01 12:30:00", "a", 4.0),
    // user b: single event
    ("2024-01-01 11:00:00", "b", 8.0))

  private def toUserDf(s: Seq[(String, String, Double)]) =
    s.toDF("t", "user_id", "value").selectExpr("timestamp(t) as ts", "user_id", "value")

  it should "split sessions at the gap in batch mode" in {
    val out = EventWindows.sessions(toUserDf(sessionRows), gap = "1 hour")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    def us(t: String) = Timestamp.valueOf(t).getTime * 1000L
    val hour = 3600L * 1000000L
    out shouldBe Set(
      ("a", us("2024-01-01 10:00:00"), us("2024-01-01 10:10:00") + hour, 2L, 3.0),
      ("a", us("2024-01-01 12:30:00"), us("2024-01-01 12:30:00") + hour, 1L, 4.0),
      ("b", us("2024-01-01 11:00:00"), us("2024-01-01 11:00:00") + hour, 1L, 8.0))
  }

  it should "produce the same sessions through a streaming query" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val stream = EventWindows.sessions(
      mem.toDF().toDF("t", "user_id", "value")
        .selectExpr("timestamp(t) as ts", "user_id", "value"),
      gap = "1 hour", watermark = "0 seconds")
    stream.isStreaming shouldBe true
    val q = stream.writeStream.format("memory").queryName("es_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(sessionRows: _*)
      q.processAllAvailable()
      // push the watermark past every session's end so all sessions emit
      mem.addData(("2024-01-02 12:00:00", "zz", 0.0))
      q.processAllAvailable()
      val got = spark.table("es_test").where("user_id != 'zz'").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      val batch = EventWindows.sessions(toUserDf(sessionRows), gap = "1 hour")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        .toSet
      got shouldBe batch
    } finally q.stop()
  }

  behavior of "EventWindows.sessionLines"

  it should "render each session as one chronological event-type line" in {
    val df = Seq(
      ("2024-01-01 10:00:00", "a", 1L, "view"),
      ("2024-01-01 10:10:00", "a", 2L, "click"),
      ("2024-01-01 12:30:00", "a", 3L, "purchase"), // 2h gap: new session
      // same-instant pair: tie must break by event_id
      ("2024-01-01 11:00:00", "b", 5L, "click"),
      ("2024-01-01 11:00:00", "b", 4L, "view"))
      .toDF("t", "user_id", "event_id", "event_type")
      .selectExpr("timestamp(t) ts", "user_id", "event_id", "event_type")
    val out = EventWindows.sessionLines(df, gap = "1 hour")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getString(4)))
      .toSet
    out shouldBe Set(
      ("a", 2L, "view click"),
      ("a", 1L, "purchase"),
      ("b", 2L, "view click")) // event_id 4 (view) before 5 (click)
  }

  it should "emit identical lines through a streaming query" in {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Long, String)]
    val rows = Seq(
      ("2024-01-01 10:00:00", "a", 1L, "view"),
      ("2024-01-01 10:10:00", "a", 2L, "click"))
    val stream = EventWindows.sessionLines(
      mem.toDF().toDF("t", "user_id", "event_id", "event_type")
        .selectExpr("timestamp(t) ts", "user_id", "event_id", "event_type"),
      gap = "1 hour", watermark = "0 seconds")
    stream.isStreaming shouldBe true
    val q = stream.writeStream.format("memory").queryName("esl_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      mem.addData(("2024-01-02 12:00:00", "zz", 9L, "view"))
      q.processAllAvailable()
      val got = spark.table("esl_test").where("user_id != 'zz'")
        .select("user_id", "line").as[(String, String)].collect().toSet
      got shouldBe Set(("a", "view click"))
    } finally q.stop()
  }

  behavior of "EventWindows.trailingCount"

  it should "count same-key events in the half-open trailing window" in {
    val ev = Seq(
      (1L, 1L, 0L), (2L, 1L, 50L), (3L, 1L, 100L),  // all within 100 of each other
      (4L, 1L, 100L),                                 // same instant as 3: EXCLUDED from each other
      (5L, 1L, 250L),                                 // sees only ts in [150, 249]: none
      (6L, 2L, 60L))                                  // other key
      .toDF("event_id", "user_id", "us")
    val out = EventWindows.trailingCount(ev, "user_id", "us", windowMicros = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    out shouldBe Map(
      1L -> 0L,  // nothing before
      2L -> 1L,  // sees event 1
      3L -> 2L,  // sees 1 (at -100, inclusive) and 2; NOT 4 (same instant)
      4L -> 2L,  // symmetric
      5L -> 0L,  // window [150, 249] is empty
      6L -> 0L)
    an[IllegalArgumentException] should be thrownBy
      EventWindows.trailingCount(ev, "user_id", "us", windowMicros = 0)
    an[IllegalArgumentException] should be thrownBy
      EventWindows.trailingCount(ev.withColumn("trail_cnt", ev("us")),
        "user_id", "us", 100L)
  }

  it should "match a brute-force trailing count on random data" in {
    val rnd = new scala.util.Random(29)
    val data = Seq.tabulate(1500)(i =>
      (i.toLong, rnd.nextInt(10).toLong, rnd.nextInt(2000).toLong))
    val out = EventWindows.trailingCount(
        data.toDF("event_id", "user_id", "us"), "user_id", "us", 150L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    data.foreach { case (id, u, t) =>
      val want = data.count { case (id2, u2, t2) =>
        id2 != id && u2 == u && t2 >= t - 150 && t2 < t
      } + data.count { case (id2, u2, t2) =>
        id2 != id && u2 == u && t2 == t && false // same-instant excluded
      }
      out(id) shouldBe want.toLong
    }
  }

  behavior of "EventWindows.decayedSum"

  it should "halve weights per step back with missing lags as 0" in {
    // steps=2: weights current 2, previous 1
    val ev = Seq((1L, 7L, 10L, 1L), (2L, 7L, 20L, 2L), (3L, 7L, 30L, 3L))
      .toDF("event_id", "user_id", "us", "v")
    val out = EventWindows.decayedSum(ev, "user_id", "us", "event_id", "v",
        steps = 2)
      .select("event_id", "decay_sum").as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 2L, 2L -> 5L, 3L -> 8L)
  }

  it should "order same-timestamp events by the tie column" in {
    val ev = Seq((2L, 7L, 10L, 100L), (1L, 7L, 10L, 1L))
      .toDF("event_id", "user_id", "us", "v")
    val out = EventWindows.decayedSum(ev, "user_id", "us", "event_id", "v",
        steps = 2)
      .select("event_id", "decay_sum").as[(Long, Long)].collect().toMap
    // order is (us, event_id): id 1 first (2·1), then id 2 (2·100 + 1)
    out shouldBe Map(1L -> 2L, 2L -> 201L)
  }

  it should "keep users independent" in {
    val ev = Seq((1L, 7L, 10L, 5L), (2L, 8L, 20L, 5L))
      .toDF("event_id", "user_id", "us", "v")
    val out = EventWindows.decayedSum(ev, "user_id", "us", "event_id", "v",
        steps = 3)
      .select("event_id", "decay_sum").as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 20L, 2L -> 20L) // both are their user's first
  }

  it should "reject bad steps, non-integral values, and column clashes" in {
    val ev = Seq((1L, 7L, 10L, 1L)).toDF("event_id", "user_id", "us", "v")
    an[IllegalArgumentException] should be thrownBy
      EventWindows.decayedSum(ev, "user_id", "us", "event_id", "v", steps = 0)
    an[IllegalArgumentException] should be thrownBy
      EventWindows.decayedSum(ev, "user_id", "us", "event_id", "v", steps = 63)
    an[IllegalArgumentException] should be thrownBy
      EventWindows.decayedSum(ev.withColumn("vd", ev("v").cast("double")),
        "user_id", "us", "event_id", "vd")
    an[IllegalArgumentException] should be thrownBy
      EventWindows.decayedSum(ev.withColumn("decay_sum", ev("v")),
        "user_id", "us", "event_id", "v")
  }
}
