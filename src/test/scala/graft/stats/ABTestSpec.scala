package graft.stats

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class ABTestSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "ABTest.twoProportions"

  it should "compute the pooled two-proportion z from unit-level conversions" in {
    // A: 4 units, 3 convert (multiple rows per unit collapse);
    // B: 4 units, 1 converts
    val ev = Seq(
      ("A", 1L, true), ("A", 1L, false), ("A", 2L, true), ("A", 3L, true),
      ("A", 4L, false),
      ("B", 11L, true), ("B", 12L, false), ("B", 13L, false), ("B", 14L, false))
      .toDF("variant", "uid", "conv")
    val r = ABTest.twoProportions(ev, "uid", "variant", "conv").head()
    r.getString(0) shouldBe "A"
    (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)) shouldBe (4L, 3L, 4L, 1L)
    val pPool = 4.0 / 8.0
    val se = math.sqrt(pPool * (1 - pPool) * (1.0 / 4 + 1.0 / 4))
    r.getLong(6) shouldBe math.floor(1e6 * (0.75 - 0.25) / se).toLong
  }

  it should "null the z for degenerate pools and reject non-2-variant data" in {
    val allConv = Seq(("A", 1L, true), ("B", 2L, true)).toDF("variant", "uid", "conv")
    ABTest.twoProportions(allConv, "uid", "variant", "conv")
      .head().isNullAt(6) shouldBe true // pooled rate 1: no variance
    val three = Seq(("A", 1L, true), ("B", 2L, false), ("C", 3L, true))
      .toDF("variant", "uid", "conv")
    val ex = intercept[Exception] {
      ABTest.twoProportions(three, "uid", "variant", "conv").collect()
    }
    ex.getMessage should include ("exactly 2 variants")
    an[IllegalArgumentException] should be thrownBy
      ABTest.twoProportions(three, "nope", "variant", "conv")
  }
}
