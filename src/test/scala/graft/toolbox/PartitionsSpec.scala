package graft.toolbox

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Partition-hygiene helpers: [[Partitions.spreadCompute]] (scan-side
 * floor, r14) and [[Partitions.floorWidth]] (exchange-side floor for
 * compute-heavy post-shuffle stages, r15). The contracts under test:
 * the floors fire ONLY in the under-split regime, never change row
 * multisets, and leave exchange-bearing inputs (spread) / gauges
 * (floor) strictly alone.
 */
class PartitionsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark
  import spark.implicits._

  behavior of "spreadCompute"

  it should "floor an under-split exchange-free frame at defaultParallelism" in {
    val df = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
    val out = Partitions.spreadCompute(df)
    out.rdd.getNumPartitions shouldBe spark.sparkContext.defaultParallelism
    out.select(sum($"id")).head.getLong(0) shouldBe 4950L
  }

  it should "leave an already-wide frame unchanged" in {
    val want = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 100, 1, numPartitions = want + 3).toDF("id")
    Partitions.spreadCompute(df).rdd.getNumPartitions shouldBe (want + 3)
  }

  it should "leave an exchange-bearing frame unchanged" in {
    val df = spark.range(0, 100, 1, numPartitions = 1).toDF("id")
      .repartition(col("id"))
    // the plan already has an Exchange: the helper must not touch it
    // (inspecting .rdd there would materialize query stages)
    Partitions.spreadCompute(df).queryExecution.logical shouldBe
      df.queryExecution.logical
  }

  behavior of "floorWidth"

  it should "spread a frame when the gauge is under-split" in {
    val gauge = spark.range(0, 10, 1, numPartitions = 1).toDF("g")
    val df = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val out = Partitions.floorWidth(df, gauge)
    out.rdd.getNumPartitions shouldBe spark.sparkContext.defaultParallelism
    out.as[(Long, Long)].collect().toSet shouldBe Set((1L, 2L), (3L, 4L), (5L, 6L))
  }

  it should "be a no-op when the gauge arrives in >= cores splits" in {
    val want = spark.sparkContext.defaultParallelism
    val gauge = spark.range(0, 100, 1, numPartitions = want).toDF("g")
    val df = Seq((1L, 2L)).toDF("a", "b")
    Partitions.floorWidth(df, gauge).queryExecution.logical shouldBe
      df.queryExecution.logical
  }

  it should "be a no-op for an exchange-bearing gauge (conservative)" in {
    val gauge = spark.range(0, 10, 1, numPartitions = 1).toDF("g")
      .repartition(col("g"))
    val df = Seq((1L, 2L)).toDF("a", "b")
    Partitions.floorWidth(df, gauge).queryExecution.logical shouldBe
      df.queryExecution.logical
  }
}
