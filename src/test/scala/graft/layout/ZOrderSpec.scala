package graft.layout

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * [[ZOrder]] contract: exact Morton keys (hand-computed interleave),
 * row-preserving layout rewrite, and the property the operator exists
 * for — a non-leading-column range predicate overlaps FAR fewer
 * z-clustered partitions than single-column-sorted ones, which is
 * precisely what file-level min/max skipping prunes on.
 */
class ZOrderSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  behavior of "ZOrder"

  it should "compute the exact Morton interleave" in {
    import spark.implicits._
    // buckets (3, 5) at 3 bits: 3=011 lands on even bits, 5=101 on odd
    // → z = 0b100111 = 39; identity stats make bucket(v) = v
    val df = Seq((3L, 5L)).toDF("a", "b")
      .select(ZOrder.zvalue(Seq(col("a"), col("b")),
        Seq(lit(0L), lit(0L)), Seq(lit(7L), lit(7L)), bits = 3).as("z"))
    df.collect().head.getLong(0) shouldBe 39L
  }

  it should "bucket by exact integer division with nulls first" in {
    import spark.implicits._
    val df = Seq(Some(0L), Some(49L), Some(99L), None).toDF("v")
      .select(col("v"),
        ZOrder.bucket(col("v"), lit(0L), lit(99L), bits = 2).as("b"))
    df.collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getLong(1))
      .toMap shouldBe Map(0L -> 0L, 49L -> 1L, 99L -> 3L, -1L -> 0L)
  }

  it should "preserve the exact row multiset through the layout rewrite" in {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, (i * 37) % 101, s"p$i")).toDF("x", "y", "payload")
    val out = ZOrder.zorderBy(df, Seq("x", "y"), partitions = 8, bits = 8)
    out.columns.toSeq shouldBe Seq("x", "y", "payload")
    out.rdd.getNumPartitions shouldBe 8
    out.exceptAll(df).count() shouldBe 0L
    df.exceptAll(out).count() shouldBe 0L
  }

  it should "let a y-band predicate skip most partitions, unlike an x-sorted layout" in {
    import spark.implicits._
    // uniform 64x64 grid; 16 partitions
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y").repartition(7)
    def overlapping(df: org.apache.spark.sql.DataFrame): Long = df
      .select(spark_partition_id().as("p"), col("y"))
      .groupBy("p").agg(min("y").as("lo"), max("y").as("hi"))
      .where(col("lo") <= 11L && col("hi") >= 8L) // the y in [8, 11] band
      .count()
    val zParts = overlapping(ZOrder.zorderBy(grid, Seq("x", "y"), partitions = 16, bits = 6))
    val xParts = overlapping(grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // x-sorted: every vertical strip spans all y — nothing skippable
    xParts shouldBe 16L
    // z-clustered: only the tiles intersecting the band remain
    zParts should be <= 8L
  }

  it should "reject invalid arguments loudly" in {
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("x", "y")
    an[IllegalArgumentException] should be thrownBy
      ZOrder.zorderBy(df, Seq("x", "y"), partitions = 4, bits = 32) // 64 > 63
    an[IllegalArgumentException] should be thrownBy
      ZOrder.zorderBy(df, Seq.empty, partitions = 4)
    an[IllegalArgumentException] should be thrownBy
      ZOrder.zorderBy(df, Seq("x"), partitions = 0)
    an[IllegalArgumentException] should be thrownBy
      ZOrder.zorderBy(df.withColumn("__graft_z", lit(1L)), Seq("x"), partitions = 2)
  }
}
