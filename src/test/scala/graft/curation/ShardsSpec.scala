package graft.curation

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

/** Pins [[Shards.assign]]: the contiguous weight-quantile cut, its
  * integer tie rule, the balance bound, and the loud weight contract. */
class ShardsSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "Shards.assign"

  it should "cut exact weight quantiles on a hand-checked frame" in {
    // ids 1..4 with weights 3,1,3,1 (total 8), 2 shards:
    // starts are 0,3,4,7 -> shard = start*2 div 8 = 0,0,1,1
    val df = Seq((1L, 3L), (2L, 1L), (3L, 3L), (4L, 1L)).toDF("id", "w")
    val out = Shards.assign(df, "id", "w", 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    out shouldBe List((1L, 3L, 0L), (2L, 1L, 0L), (3L, 3L, 1L), (4L, 1L, 1L))
  }

  it should "keep shards id-contiguous, complete, and weight-balanced" in {
    // skewed weights: doc i has weight (i % 97) + 1
    val df = spark.range(1, 2001)
      .selectExpr("id", "(id % 97) + 1 AS w")
    val out = Shards.assign(df, "id", "w", 8)
    out.count() shouldBe 2000
    val byShard = out.groupBy("shard")
      .agg(org.apache.spark.sql.functions.min("id").as("lo"),
        org.apache.spark.sql.functions.max("id").as("hi"),
        org.apache.spark.sql.functions.sum("weight").as("ws"),
        org.apache.spark.sql.functions.count("*").as("n"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
    byShard.map(_._1) shouldBe (0L to 7L).toList
    // contiguity: shard i's ids end before shard i+1's begin
    byShard.sliding(2).foreach {
      case List((_, _, hi1, _, _), (_, lo2, _, _, _)) => lo2 should be > hi1
      case _ =>
    }
    byShard.map(_._5).sum shouldBe 2000L
    // balance: every shard's mass within total/8 ± max single weight
    val total = byShard.map(_._4).sum
    val bound = total / 8 + 97
    byShard.foreach { case (s, _, _, ws, _) =>
      withClue(s"shard $s weight $ws vs bound $bound:") {
        ws should be <= bound
        ws should be >= (total / 8 - 97)
      }
    }
  }

  it should "never plan a data-sized global window" in {
    // the per-row cumsum window must be keyed by the coarse group —
    // only the <= targetGroups offsets window may be single-partition
    val df = spark.range(1, 5001).selectExpr("id", "(id % 11) + 1 AS w")
    val plan = Shards.assign(df, "id", "w", 8)
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include regex "windowspecdefinition\\(__g#\\d+L?, __id#"
    }
  }

  it should "land zero-total and empty frames in shard 0 / empty output" in {
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("id", "w")
    Shards.assign(zeros, "id", "w", 4)
      .select("shard").as[Long].collect().toSet shouldBe Set(0L)
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    Shards.assign(empty, "id", "w", 4).count() shouldBe 0L
  }

  it should "fail loudly on negative or null weights" in {
    val df = Seq((1L, Some(5L)), (2L, None)).toDF("id", "w")
    val e = intercept[Exception] {
      Shards.assign(df, "id", "w", 2).collect()
    }
    e.getMessage should include("non-negative and non-null")
    val neg = Seq((1L, 5L), (2L, -3L)).toDF("id", "w")
    intercept[Exception] {
      Shards.assign(neg, "id", "w", 2).collect()
    }.getMessage should include("non-negative and non-null")
  }

  behavior of "Shards.writeShards"

  it should "write exactly one data file per shard and keep content" in {
    val df = spark.range(1, 501).selectExpr("id", "(id % 13) + 1 AS w")
    val assigned = Shards.assign(df, "id", "w", 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val stats = Shards.writeShards(assigned, dir, 8)
    withClue(stats) {
      stats.shards shouldBe 8
      stats.dataFiles shouldBe 8 // one file per shard, collisions split
      stats.rows shouldBe 500L
    }
    // read-back identity (shard comes back as a partition column)
    val back = spark.read.parquet(dir)
      .select("id", "weight", "shard").as[(Long, Long, Long)]
      .collect().toSet
    back shouldBe assigned.as[(Long, Long, Long)].collect().toSet
  }

  it should "require the shard column" in {
    val df = spark.range(3).selectExpr("id")
    an[IllegalArgumentException] should be thrownBy
      Shards.writeShards(df, "/tmp/never", 2)
  }

  it should "produce a manifest that accounts for every row and unit of weight" in {
    val df = spark.range(0, 500).selectExpr("id", "id % 13 + 1 AS w")
    val m = Shards.manifest(Shards.assign(df, "id", "w", 5))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    m.map(_._2).sum shouldBe 500L
    m.map(_._3).sum shouldBe (0L until 500L).map(_ % 13 + 1).sum
  }
}
