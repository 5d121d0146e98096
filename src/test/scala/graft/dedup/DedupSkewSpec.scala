package graft.dedup

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.graft.ListenerBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Hot-digest skew contract of the exact-dedup shapes: at 100 TB a
 * boilerplate page produces a 100M-copy duplicate cluster, and the
 * operator must never put that whole cluster on ONE task. The
 * min-over-window-partitionBy(digest) shape does exactly that (a window
 * has no partial aggregation and AQE cannot split its partition); the
 * shipped groupBy(digest).agg(min) + equi-join-back shape collapses the
 * hot digest map-side and leaves a join AQE's skew split can break up.
 * These specs construct a pathological single-text cluster and measure
 * per-task shuffle-read records.
 */
class DedupSkewSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private val Cluster = 200000L
  private val Uniques = 5000L

  /** One text duplicated `Cluster` times + `Uniques` distinct rows,
    * spread over 16 input partitions. */
  private def pathological: DataFrame =
    spark.range(0, Cluster + Uniques, 1, 16)
      .select(col("id").as("doc_id"),
        when(col("id") < Cluster, lit("the same boilerplate page text"))
          .otherwise(concat(lit("unique "), col("id"))).as("text"))

  /** Runs `body` under a unique job group while recording the max
    * shuffle-read record count any single task OF THIS BODY'S JOBS
    * sees. Scoping by job group (job-start events carry the group;
    * AQE stage jobs inherit it via SQLExecution's thread-local
    * capture) keeps the metric immune to tasks from any other work on
    * the shared test session — the saturated-host pollution class the
    * r13 full run flaked on once (r14, VERDICT directive 8). The
    * listener bus delivers job-start before that job's task-end
    * events, so the stage filter is always populated in time. */
  private def maxTaskShuffleRecords(body: => Unit): Long = {
    val group = s"dedup-skew-${java.util.UUID.randomUUID()}"
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val max = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (j.properties != null &&
            group == j.properties.getProperty("spark.jobGroup.id"))
          j.stageInfos.foreach(si => stages.add(si.stageId))
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && stages.contains(t.stageId)) {
          val r = m.shuffleReadMetrics.recordsRead
          var cur = max.get()
          while (r > cur && !max.compareAndSet(cur, r)) cur = max.get()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "dedup skew probe")
      try body finally spark.sparkContext.clearJobGroup()
      ListenerBridge.drain(spark.sparkContext)
      max.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withSkewConf[A](body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // 100 TB regime: neither join side broadcasts; toy-size the skew
      // thresholds (defaults 256 MB / 64 MB) so AQE's split engages at
      // spec scale the way it would on a real multi-GB hot key. AQE
      // measures COMPRESSED map-output sizes, and a hot partition of
      // 200k identical digests lz4-compresses brutally well — the
      // thresholds must sit below that compressed size, not the raw one
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4k")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  behavior of "Dedup.exactCanon on a pathological duplicate cluster"

  it should "canonicalize correctly without any task processing the whole cluster" in withSkewConf {
    val out = Dedup.exactCanon(pathological, "doc_id", "text")
    var rows: Array[org.apache.spark.sql.Row] = null
    val maxRecords = maxTaskShuffleRecords { rows = out.collect() }
    // exactness: every cluster member canonicalizes to id 0, every
    // unique row to itself
    rows.length shouldBe (Cluster + Uniques)
    rows.count(r => r.getLong(1) == 0L) shouldBe Cluster
    rows.count(r => r.getLong(1) == r.getLong(0)) shouldBe (Uniques + 1) // +1: id 0 itself
    // the scale assertion: the window shape shuffle-reads all `Cluster`
    // rows in one task; here map-side combine bounds the agg side (one
    // row per digest per map task) and AQE splits the join's hot
    // partition into mapper-range chunks
    withClue(s"max single-task shuffle-read records = $maxRecords: ") {
      // lower bound keeps the group-scoped metric honest: a hash agg +
      // join MUST shuffle, so 0 would mean the listener missed our jobs
      maxRecords should be > 0L
      maxRecords should be < (Cluster / 4)
    }
    // and the executed plan records the skew split engaging
    val plan = out.queryExecution.executedPlan.toString
    withClue(plan.linesIterator.filter(_.contains("Join")).mkString("\n")) {
      plan should include("skew=true")
    }
  }

  behavior of "Dedup.exactCanon null-text rows"

  it should "keep null-text rows as their own group (the window form's semantics)" in {
    import spark.implicits._
    val df = Seq((1L, Option("x")), (2L, None), (3L, Option("x")), (4L, None))
      .toDF("doc_id", "text")
    val got = Dedup.exactCanon(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nulls group together (min id 2), never silently drop — an equi-join
    // back on a bare null digest would lose rows 2 and 4
    got shouldBe Set((1L, 1L), (3L, 1L), (2L, 2L), (4L, 2L))
  }

  behavior of "StreamingDedup.firstPerContent (batch path) on a pathological duplicate cluster"

  it should "keep the min-ts row per content without any task processing the whole cluster" in withSkewConf {
    val docs = pathological.withColumn("ts", col("doc_id"))
    val out = graft.streaming.StreamingDedup.firstPerContent(docs, "text", "ts")
    var rows: Array[org.apache.spark.sql.Row] = null
    val maxRecords = maxTaskShuffleRecords { rows = out.collect() }
    // one survivor per distinct text: the cluster keeps doc_id 0 (min
    // ts), every unique row survives as itself; schema = input schema
    out.columns.toSeq shouldBe Seq("doc_id", "text", "ts")
    rows.length shouldBe (Uniques + 1)
    rows.map(_.getLong(0)).min shouldBe 0L
    rows.count(_.getLong(0) < Cluster) shouldBe 1
    // no join back at all on this shape — partial aggregation alone
    // bounds every task far below the cluster size
    withClue(s"max single-task shuffle-read records = $maxRecords: ") {
      maxRecords should be > 0L
      maxRecords should be < (Cluster / 4)
    }
  }
}
