package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class FunnelSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  private val events = Seq(
    // user 1: full conversion inside the window
    (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
    // user 2: reaches click only
    (2L, "view", ts(0)), (2L, "click", ts(5)),
    // user 3: purchase BEFORE the click — not a chain
    (3L, "view", ts(0)), (3L, "purchase", ts(5)), (3L, "click", ts(10)),
    // user 4: full chain but the purchase falls outside the window
    (4L, "view", ts(0)), (4L, "click", ts(50)), (4L, "purchase", ts(5000)),
    // user 5: no view at all — not in the funnel
    (5L, "click", ts(0)), (5L, "purchase", ts(1)),
    // user 6: click at EXACTLY the view ts (at-or-after inclusive)
    (6L, "view", ts(0)), (6L, "click", ts(0)), (6L, "purchase", ts(1))
  ).toDF("user_id", "event_type", "ts")

  behavior of "Funnel.earliestChain"

  it should "chain greedily, count steps, and bound conversion by the window" in {
    val out = Funnel.earliestChain(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowMicros = 100L * 1000000)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("steps_reached")), r.getBoolean(r.fieldIndex("converted"))))
      .toMap
    out shouldBe Map(
      1L -> ((3L, true)),
      2L -> ((2L, false)),
      3L -> ((2L, false)), // purchase(5) precedes click(10): no step 3
      4L -> ((3L, false)), // completed but outside the window
      6L -> ((3L, true))) // equal-ts step counts
  }

  it should "not resurrect an out-of-order step" in {
    // user 3's only purchase precedes the click: step 3 must be null
    val r3 = Funnel.earliestChain(events.where(col("user_id") === 3), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"), windowMicros = 100L * 1000000)
      .head
    r3.getLong(r3.fieldIndex("steps_reached")) shouldBe 2L
    r3.isNullAt(r3.fieldIndex("step3_ts")) shouldBe true
  }

  it should "match a window-free brute force on random event logs" in {
    val rnd = new scala.util.Random(99)
    val types = Array("view", "click", "purchase", "other")
    val evs = Seq.tabulate(800)(i =>
      (rnd.nextInt(40).toLong, types(rnd.nextInt(4)), ts(rnd.nextInt(1000))))
      .toDF("user_id", "event_type", "ts")
    val W = 300L * 1000000
    val got = Funnel.earliestChain(evs, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), W)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(r.fieldIndex("steps_reached")), r.getBoolean(r.fieldIndex("converted"))))
      .toMap
    // driver-side replay
    val byUser = evs.collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .groupBy(_._1)
    val expect = byUser.flatMap { case (u, rows) =>
      val of = (t: String) => rows.filter(_._2 == t).map(_._3.getTime).sorted
      of("view").headOption.map { t1 =>
        val t2 = of("click").find(_ >= t1)
        val t3 = t2.flatMap(b => of("purchase").find(_ >= b))
        val reached = 1L + t2.size + t3.size
        val conv = t3.exists(c => (c - t1) * 1000 <= W)
        u -> ((reached, conv))
      }
    }
    got shouldBe expect
  }

  it should "validate parameters" in {
    an[IllegalArgumentException] should be thrownBy
      Funnel.earliestChain(events, "user_id", "ts", "event_type", Seq("view"), 1L)
    an[IllegalArgumentException] should be thrownBy
      Funnel.earliestChain(events, "user_id", "ts", "event_type",
        Seq("view", "view"), 1L)
    an[IllegalArgumentException] should be thrownBy
      Funnel.earliestChain(events, "user_id", "ts", "event_type",
        Seq("view", "click"), 0L)
  }
}
