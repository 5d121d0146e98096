package graft.streaming

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

/**
 * State-store PROVIDER-independence sweep — the alt-session discipline
 * applied to streaming state (round-12 directive): at 100 TB users run
 * the stateful operators on the RocksDB state store
 * (`spark.sql.streaming.stateStore.providerClass`), not the default
 * HDFS-backed in-memory provider, so every stateful operator family is
 * driven through identical MemoryStream batch sequences under BOTH
 * providers and must produce identical output:
 *
 *  - dropDuplicates watermark state ([[StreamingDedup.firstPerContent]])
 *  - flatMapGroupsWithState custom state with event-time timeouts
 *    ([[graft.curation.ChangeHistory.scd2Stream]])
 *  - session-window merge state ([[EventWindows.sessions]])
 *  - stream-stream interval-join buffers ([[EventWindows.intervalJoin]])
 *
 * Engagement is asserted, not assumed: the RocksDB runs must report
 * rocksdb* custom state-store metrics in their progress (a typo'd
 * provider class would otherwise silently fall back and the sweep
 * would pin nothing).
 */
class RocksDbStateParitySpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[T](provider: Option[String])(body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    provider.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
    try body
    finally prev.fold(spark.conf.unset(ProviderKey))(spark.conf.set(ProviderKey, _))
  }

  private def ts(s: String) = Timestamp.valueOf(s"2026-01-01 $s")

  /** Drive `build`'s pipeline over the given MemoryStream batches with
    * a processAllAvailable barrier after each (pinning batch
    * boundaries, so both providers see identical state transitions);
    * returns (sorted stringified rows, rocksdb metrics seen?). */
  private def drain(name: String, batches: Seq[Seq[(Long, String, Timestamp)]])(
      build: DataFrame => DataFrame): (Seq[String], Boolean) = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = build(mem.toDF().toDF("id", "text", "ts"))
    out.isStreaming shouldBe true
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val rows = spark.table(name).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      val sawRocks = q.recentProgress.flatMap(_.stateOperators)
        .flatMap(_.customMetrics.keySet.asScala)
        .exists(_.toLowerCase.contains("rocksdb"))
      (rows, sawRocks)
    } finally {
      q.stop()
      spark.catalog.dropTempView(name)
    }
  }

  /** Run the same pipeline under default and RocksDB providers; assert
    * non-trivial identical output and real RocksDB engagement. */
  private def parity(name: String, batches: Seq[Seq[(Long, String, Timestamp)]],
      minRows: Int)(build: DataFrame => DataFrame): Seq[String] = {
    val (base, baseRocks) = withProvider(None)(drain(s"${name}_hdfs", batches)(build))
    val (rock, rockRocks) =
      withProvider(Some(RocksDb))(drain(s"${name}_rdb", batches)(build))
    baseRocks shouldBe false
    rockRocks shouldBe true
    base.size should be >= minRows
    rock shouldBe base
    base
  }

  behavior of "stateful streaming under the RocksDB state store"

  it should "dedup identically (dropDuplicates watermark state)" in {
    val batches = Seq(
      Seq((1L, "aaa", ts("10:00:00")), (2L, "aaa", ts("10:00:05")),
        (3L, "bbb", ts("10:00:01"))),
      Seq((4L, "aaa", ts("10:01:00")), (5L, "ccc", ts("10:02:00"))))
    val rows = parity("rp_dedup", batches, minRows = 3)(
      StreamingDedup.firstPerContent(_, "text", "ts", "10 minutes"))
    rows.count(_.contains("aaa")) shouldBe 1 // the dedup itself still holds
  }

  it should "fold SCD2 episodes identically (flatMapGroupsWithState + event-time timeout)" in {
    val batches = Seq(
      Seq((1L, "view", ts("10:00:00")), (1L, "click", ts("10:10:00")),
        (2L, "view", ts("10:05:00"))),
      Seq((1L, "view", ts("10:20:00")), (2L, "purchase", ts("10:25:00"))),
      // far-future event drags the watermark past every idle horizon,
      // firing the event-time timeouts that finalize open episodes —
      // timeout state transitions must also be provider-independent
      Seq((9L, "view", ts("23:00:00"))))
    parity("rp_scd2", batches, minRows = 4)(in =>
      graft.curation.ChangeHistory.scd2Stream(
        in.select(col("id").as("user_id"), col("ts"), col("text").as("event_type")),
        "user_id", "ts", "event_type",
        watermark = "5 minutes", idleTimeoutMicros = 600L * 1000000))
  }

  it should "merge session windows identically (session_window state)" in {
    val batches = Seq(
      Seq((1L, "a", ts("10:00:00")), (1L, "a", ts("10:02:00")),
        (2L, "b", ts("10:00:30"))),
      Seq((1L, "a", ts("10:03:00")), (2L, "b", ts("10:30:00"))),
      Seq((9L, "z", ts("23:00:00")))) // flush: watermark past session ends
    parity("rp_sess", batches, minRows = 3)(in =>
      EventWindows.sessions(
        in.select(col("id").as("user_id"), col("ts"),
          (col("id") * 1.5).as("value")),
        gap = "5 minutes", watermark = "10 minutes"))
  }

  it should "buffer stream-stream interval joins identically" in {
    implicit val sqlCtx = spark.sqlContext
    val batches = Seq(
      Seq((1L, "k1", ts("10:00:00")), (2L, "k1", ts("10:04:00")),
        (3L, "k2", ts("10:01:00"))),
      Seq((4L, "k1", ts("10:09:00")), (5L, "k2", ts("10:30:00"))))
    parity("rp_ij", batches, minRows = 2) { in =>
      val left = in.select(col("text").as("k"), col("id").as("l_id"),
        col("ts").as("ts_l"))
      val right = in.select(col("text").as("k"), col("id").as("r_id"),
        col("ts").as("ts_r"))
      EventWindows.intervalJoin(left, right, "k", "ts_l", "ts_r",
          upper = "10 minutes", watermark = "30 minutes")
        .where(col("l_id") =!= col("r_id"))
        .select(col("k"), col("l_id"), col("r_id"), unix_micros(col("ts_r")))
    }
  }
}
