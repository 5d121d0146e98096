package graft.streaming

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class RetentionSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "Retention.cohorts"

  private val P = 100L // period

  it should "build the triangular cohort matrix with distinct-user counts" in {
    val ev = Seq(
      // user 1: signup at 100 (cohort 1), active periods 0, 0, 2
      (1L, 100L, "signup"), (1L, 150L, "click"), (1L, 199L, "view"), (1L, 320L, "click"),
      // user 2: signup at 130 (cohort 1), active period 0 and EXACT
      // boundary anchor+P -> offset 1
      (2L, 130L, "signup"), (2L, 230L, "click"),
      // user 3: two signups — earliest (250, cohort 2) anchors; the
      // pre-anchor click at 240 drops
      (3L, 240L, "click"), (3L, 250L, "signup"), (3L, 400L, "signup"),
      // user 4: no signup — never counted
      (4L, 100L, "click"), (4L, 300L, "view"))
      .toDF("u", "ts", "t")
    val out = Retention.cohorts(ev, "u", "ts", "t", "signup", periodMicros = P)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set(
      (1L, 0L, 2L), // users 1 and 2 active in their signup period
      (1L, 1L, 1L), // user 2 at the exact boundary
      (1L, 2L, 1L), // user 1 at 320
      (2L, 0L, 1L), // user 3's signup itself
      (2L, 1L, 1L)) // user 3's second signup at 400 is plain activity
  }

  it should "ignore null users/timestamps and validate inputs" in {
    val ev = Seq(
      (Some(1L), Some(100L), "signup"), (Some(1L), None, "click"),
      (None, Some(100L), "signup"))
      .toDF("u", "ts", "t")
    val out = Retention.cohorts(ev, "u", "ts", "t", "signup", periodMicros = P)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((1L, 0L, 1L))
    an[IllegalArgumentException] should be thrownBy
      Retention.cohorts(ev, "u", "ts", "t", "signup", periodMicros = 0)
    an[IllegalArgumentException] should be thrownBy
      Retention.cohorts(ev, "nope", "ts", "t", "signup")
  }

  it should "match a brute-force computation on random data" in {
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(2000)(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(5000).toLong,
        if (rnd.nextInt(5) == 0) "signup" else "click"))
    val ev = rows.toDF("u", "ts", "t")
    val got = Retention.cohorts(ev, "u", "ts", "t", "signup", periodMicros = P)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val anchors = rows.filter(_._3 == "signup").groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).min
    }
    val brute = rows.flatMap { case (u, ts, _) =>
      anchors.get(u).filter(ts >= _).map(a => (u, a / P, (ts - a) / P))
    }.distinct.groupBy(t => (t._2, t._3))
      .map { case ((c, o), us) => (c, o, us.size.toLong) }.toSet
    got shouldBe brute
  }

  it should "floor-divide negative (pre-1970) anchors into single-width cohorts" in {
    import spark.implicits._
    // period 10: anchors -25, -5, 5 must land in cohorts -3, -1, 0 —
    // truncating division would fold -5 and 5 into a double-width 0
    val ev = Seq((1L, -25L, "signup"), (2L, -5L, "signup"), (3L, 5L, "signup"))
      .toDF("user_id", "ts", "event_type")
    val out = Retention.cohorts(ev, "user_id", "ts", "event_type", "signup",
        periodMicros = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    out shouldBe Set((-3L, 0L, 1L), (-1L, 0L, 1L), (0L, 0L, 1L))
  }
}
