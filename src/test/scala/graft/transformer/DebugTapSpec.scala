package graft.transformer

import java.io.ByteArrayOutputStream

import graft.SparkTestKit.spark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * The U6 debug tap: `BroadcastSpatialJoin.show` prints a tagged preview +
 * partition count only when the session conf `spark.graft.debug` is
 * `true`; by default every internal call site is a silent no-op (the
 * `@elidable(FINE)` annotation additionally lets a user's build compile
 * the taps out — this build does not, so the taps stay testable).
 */
class DebugTapSpec extends AnyFlatSpec with Matchers {

  behavior of "BroadcastSpatialJoin.show"

  private def withDebug[A](on: Boolean)(body: => A): A = {
    if (on) spark.conf.set("spark.graft.debug", "true")
    try body finally spark.conf.unset("spark.graft.debug")
  }

  it should "print a tagged preview when spark.graft.debug is on" in {
    val df = spark.range(3).toDF("n")
    val out = new ByteArrayOutputStream()
    withDebug(on = true) {
      Console.withOut(out) { BroadcastSpatialJoin.show(df, "tap-test", n = 3) }
    }
    val s = out.toString
    s should include ("msg: `tap-test` parts")
    s should include ("|  n|")
  }

  it should "tap the transform pipeline when enabled, stay silent by default" in {
    import BroadcastSpatialJoinSpec.{makeTransformer, points, pois}
    val input = points("i1, 1, 1")
    val data = pois("d1, 1.1, 1.1")

    val silent = new ByteArrayOutputStream()
    val res = Console.withOut(silent) {
      makeTransformer(data, "poi_tap").transform(input).collect()
    }
    res.length shouldBe 1
    silent.toString should not include "msg: `"

    val chatty = new ByteArrayOutputStream()
    withDebug(on = true) {
      Console.withOut(chatty) {
        makeTransformer(data, "poi_tap2").transform(input).collect()
      }
    }
    chatty.toString should include ("msg: `input` parts")
    chatty.toString should include ("msg: `dataset` parts")
    chatty.toString should include ("msg: `join result` parts")
  }
}
