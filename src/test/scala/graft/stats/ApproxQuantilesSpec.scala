package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * [[GroupStats.approxQuantiles]] contract: estimates are actual group
 * elements whose rank is within n/accuracy of the target — the bound the
 * gate row pins — with input types preserved and the same collision
 * guards as the exact variant.
 */
class ApproxQuantilesSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  behavior of "GroupStats.approxQuantiles"

  it should "return group elements whose rank meets the n/accuracy bound" in {
    import spark.implicits._
    // skewed: group a = 1..1000 (uniform), group b = 990 ones + 10 big
    val rows = (1 to 1000).map(v => ("a", v.toLong)) ++
      (1 to 990).map(_ => ("b", 1L)) ++ (1 to 10).map(v => ("b", 1000L + v))
    val df = rows.toDF("g", "v").repartition(13)
    val acc = 100
    val est = GroupStats.approxQuantiles(df, Seq("g"), "v", Seq(50, 99), accuracy = acc)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    est.map(_._2) shouldBe Seq(1000L, 1000L) // n per group
    for ((g, n, a50, a99) <- est; (q, v) <- Seq((50, a50), (99, a99))) {
      val vals = rows.filter(_._1 == g).map(_._2)
      vals should contain(v) // an actual element, not an interpolation
      val lt = vals.count(_ < v); val le = vals.count(_ <= v)
      val t = q / 100.0 * n; val b = n.toDouble / acc + 1.0
      assert(lt < t + b && le >= t - b,
        s"group $g p$q estimate $v rank [$lt,$le] outside target $t +- $b")
    }
  }

  it should "preserve the value column's input type" in {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("g", "v")
    val out = GroupStats.approxQuantiles(df, Seq("g"), "v", Seq(50))
    out.schema("ap50").dataType shouldBe org.apache.spark.sql.types.LongType
    out.collect().head.getLong(2) shouldBe 2L
  }

  it should "drop null values from the count and the sketch" in {
    import spark.implicits._
    val df = Seq(("a", Some(1L)), ("a", None), ("a", Some(3L))).toDF("g", "v")
    val r = GroupStats.approxQuantiles(df, Seq("g"), "v", Seq(100)).collect().head
    r.getLong(1) shouldBe 2L
    r.getLong(2) shouldBe 3L
  }

  it should "reject colliding and invalid arguments loudly" in {
    import spark.implicits._
    val df = Seq(("a", 1L)).toDF("n", "v")
    an[IllegalArgumentException] should be thrownBy
      GroupStats.approxQuantiles(df, Seq("n"), "v", Seq(50)) // group col named n
    an[IllegalArgumentException] should be thrownBy
      GroupStats.approxQuantiles(df.toDF("g", "ap50"), Seq("g"), "ap50", Seq(50))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.approxQuantiles(df.toDF("g", "v"), Seq("g"), "v", Seq(0))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.approxQuantiles(df.toDF("g", "v"), Seq("g"), "v", Seq(50), accuracy = 0)
  }
}
