package graft.stats

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/** Pins [[GroupStats.robustOutliers]]: the integer median/MAD contract
  * (quantiles' p50 rank rule twice), the strict `dev > k·MAD` flag, the
  * MAD = 0 degenerate case, null handling, and the input guards. */
class RobustOutliersSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "GroupStats.robustOutliers"

  it should "flag by hand-computed median and MAD" in {
    // g: values 1,2,3,100 -> med 2 (cum rule), devs 1,0,1,98 -> MAD 1
    // k=3: only dev 98 > 3
    val df = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 3L, 3L), ("g", 4L, 100L))
      .toDF("grp", "id", "v")
    val out = GroupStats.robustOutliers(df, Seq("grp"), "v", k = 3)
      .select("id", "group_med", "abs_dev", "group_mad", "is_outlier")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    out.map(_._2).distinct.toSeq shouldBe Seq(2L)
    out.map(_._4).distinct.toSeq shouldBe Seq(1L)
    out.map(r => r._1 -> r._5).toMap shouldBe
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> true)
  }

  it should "flag every off-median row when MAD is 0" in {
    // more than half the group at the median -> MAD 0; strict > flags
    // exactly the rows off the median
    val df = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L), ("g", 4L, 9L))
      .toDF("grp", "id", "v")
    val out = GroupStats.robustOutliers(df, Seq("grp"), "v", k = 3)
      .select("id", "is_outlier").as[(Long, Boolean)].collect().toMap
    out shouldBe Map(1L -> false, 2L -> false, 3L -> false, 4L -> true)
  }

  it should "give null values null flags without perturbing the group stats" in {
    val df = Seq(("g", 1L, Some(1L)), ("g", 2L, Some(2L)), ("g", 3L, Some(3L)),
      ("g", 4L, None)).toDF("grp", "id", "v")
    val rows = GroupStats.robustOutliers(df, Seq("grp"), "v", k = 3)
      .select("id", "group_med", "is_outlier").collect()
      .map(r => r.getLong(0) -> (r.get(1), r.get(2))).toMap
    rows(1L)._1 shouldBe 2L                       // median over non-nulls only
    Option(rows(4L)._2) shouldBe None             // null value -> null flag
    rows(1L)._2 shouldBe false
  }

  it should "compute stats per group independently" in {
    val df = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("b", 4L, 1L), ("b", 5L, 2L), ("b", 6L, 3L)).toDF("grp", "id", "v")
    val meds = GroupStats.robustOutliers(df, Seq("grp"), "v")
      .select("grp", "group_med").distinct()
      .as[(String, Long)].collect().toMap
    meds shouldBe Map("a" -> 10L, "b" -> 2L)
  }

  it should "reject non-integral values, bad k, and reserved names" in {
    val dbl = Seq(("g", 1.5)).toDF("grp", "v")
    an[IllegalArgumentException] should be thrownBy
      GroupStats.robustOutliers(dbl, Seq("grp"), "v")
    val ok = Seq(("g", 1L)).toDF("grp", "v")
    an[IllegalArgumentException] should be thrownBy
      GroupStats.robustOutliers(ok, Seq("grp"), "v", k = 0)
    val clash = Seq(("g", 1L, true)).toDF("grp", "v", "is_outlier")
    an[IllegalArgumentException] should be thrownBy
      GroupStats.robustOutliers(clash, Seq("grp"), "v")
  }
}
