package graft.join

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit
import graft.SparkTestKit.assertDataFrameEquals
import graft.functions.GeoExpressions

/**
 * Executor-loss-survival story, integration-tested: the iterative
 * operators default to `localCheckpoint` snapshots (fast, but blocks die
 * with their executor); on a real cluster callers pass
 * [[GridNearestJoin.ReliableMaterialize]] (reliable `checkpoint` into a
 * checkpoint dir). These specs run both operators through the reliable
 * path end-to-end and pin result equality with the local path — the
 * documented contract had no coverage before.
 */
class ReliableMaterializeSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark
  import spark.implicits._

  private def withCheckpointDir[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.getAbsolutePath)
    try body
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  behavior of "GridNearestJoin with ReliableMaterialize"

  it should "produce exactly the local-checkpoint result through ring rounds" in withCheckpointDir {
    val left = (0 until 400).map { i =>
      (s"L$i", -10.0 + (i % 20) * 1.01, -10.0 + (i / 20) * 0.97)
    }.toDF("lid", "llon", "llat")
    val right = (0 until 60).map { i =>
      (s"R$i", -9.0 + (i % 10) * 1.83, -9.0 + (i / 10) * 2.71)
    }.toDF("rid", "rlon", "rlat")
    def run(mat: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      GridNearestJoin.nearest(
        left, right,
        GeoExpressions.wkbPoint(col("llon"), col("llat")),
        GeoExpressions.wkbPoint(col("rlon"), col("rlat")),
        cellDeg = 2.0, tieBreak = Some(col("rid")),
        // force the ring rounds (the loop is where snapshots matter)
        fallbackBelow = 0L, fallbackPairs = 0L,
        materialize = mat)
        .select("lid", "rid")
    val reliable = run(GridNearestJoin.ReliableMaterialize)
    val local = run(GridNearestJoin.LocalMaterialize)
    reliable.count() shouldBe 400
    assertDataFrameEquals(reliable, local)
  }

  behavior of "Dedup.clusterPairs with ReliableMaterialize"

  it should "produce exactly the local-checkpoint clustering on a chain graph" in withCheckpointDir {
    // a path graph exercises several propagation+jump rounds
    val pairs = (0L until 30L).map(i => (i, i + 1)).toDF("doc_i", "doc_j")
    def run(mat: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      graft.dedup.Dedup.clusterPairs(pairs, materialize = mat)
    val reliable = run(GridNearestJoin.ReliableMaterialize)
    val local = run(_.localCheckpoint(false))
    reliable.collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      (0L to 30L).map(i => (i, 0L)).toSet
    assertDataFrameEquals(reliable, local)
  }
}
