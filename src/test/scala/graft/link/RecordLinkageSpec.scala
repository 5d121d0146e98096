package graft.link

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * [[RecordLinkage.blockedPairs]] contract: exact edit distances on
 * within-block pairs only, with the maxBlock skew guard and null-key
 * non-pairing of equi-join semantics.
 */
class RecordLinkageSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  behavior of "RecordLinkage.blockedPairs"

  it should "emit exactly the within-block pairs within maxDist, with exact distances" in {
    import spark.implicits._
    val recs = Seq(
      (1L, "red widget"), (2L, "red widgets"), (3L, "red wodget"),
      (4L, "blue bolt"), (5L, "blue boat"), (6L, "blue hinge"),
      (7L, "green lamp"))
    val df = recs.toDF("id", "name").repartition(5)
    val got = RecordLinkage.blockedPairs(df, "id", "name",
        split(col("name"), " ").getItem(0), maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expect = (for {
      (i, a) <- recs; (j, b) <- recs
      if i < j && a.split(" ")(0) == b.split(" ")(0) && lev(a, b) <= 2
    } yield (i, j, lev(a, b))).toSet
    got shouldBe expect
    got.map(p => (p._1, p._2)) should contain allOf ((1L, 2L), (1L, 3L), (4L, 5L))
    got should not contain ((4L, 6L, lev("blue bolt", "blue hinge"))) // dist 5 > 2
  }

  it should "never pair across blocks even for identical names" in {
    import spark.implicits._
    val df = Seq((1L, "x same"), (2L, "y same")).toDF("id", "name")
    RecordLinkage.blockedPairs(df, "id", "name",
      split(col("name"), " ").getItem(0), maxDist = 5).count() shouldBe 0L
  }

  it should "drop blocks above maxBlock before pairing" in {
    import spark.implicits._
    val hot = (1L to 20L).map(i => (i, s"hot item$i"))
    val cold = Seq((100L, "cold alpha"), (101L, "cold alphb"))
    val df = (hot ++ cold).toDF("id", "name")
    val got = RecordLinkage.blockedPairs(df, "id", "name",
        split(col("name"), " ").getItem(0), maxDist = 6, maxBlock = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((100L, 101L)) // the 20-record hot block is gone
  }

  it should "never pair rows with null block keys" in {
    import spark.implicits._
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "name")
      .withColumn("bk", lit(null).cast("string"))
    RecordLinkage.blockedPairs(df, "id", "name", col("bk"), maxDist = 3)
      .count() shouldBe 0L
  }

  it should "reject invalid arguments loudly" in {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "name")
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.blockedPairs(df, "id", "name", col("name"), maxDist = -1)
    an[IllegalArgumentException] should be thrownBy
      RecordLinkage.blockedPairs(df, "id", "name", col("name"), maxDist = 1,
        maxBlock = Some(0))
  }
}
