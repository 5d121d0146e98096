package graft.join

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class AsOfJoinSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "AsOfJoin.asof"

  it should "pick the greatest right ts at-or-before each left ts per key (inner)" in {
    val l = Seq((1, 10L, "a"), (1, 5L, "b"), (2, 7L, "c"), (3, 4L, "d"))
      .toDF("k", "lts", "lpay")
    val r = Seq((1, 8L, 80), (1, 3L, 30), (1, 10L, 100), (2, 9L, 90))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts")
    out.columns.toSeq shouldBe Seq("k", "lts", "lpay", "rts", "v")
    out.collect().map(x =>
      (x.getInt(0), x.getLong(1), x.getString(2), x.getLong(3), x.getInt(4))).toSet shouldBe Set(
      (1, 10L, "a", 10L, 100), // right row at EXACTLY lts matches (at-or-before)
      (1, 5L, "b", 3L, 30))    // k=2: only rts 9 > 7 => drop; k=3: no right rows => drop
  }

  it should "break identical (key, ts) right ties by the greatest payload, deterministically" in {
    val l = Seq((1, 6L)).toDF("k", "lts")
    val r = Seq((1, 5L, 1), (1, 5L, 9), (1, 5L, 4)).toDF("k", "rts", "v")
    val got = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts").collect()
    got.length shouldBe 1
    got.head.getInt(3) shouldBe 9
  }

  it should "drop null keys and null timestamps on both sides (SQL join-condition semantics)" in {
    val l = Seq((Some(1), Some(10L), "a"), (Some(1), None, "b"), (None, Some(9L), "c"))
      .toDF("k", "lts", "pay")
    val r = Seq((Some(1), Some(8L), 80), (Some(1), None, 99), (None, Some(1L), 77))
      .toDF("k", "rts", "v")
    val got = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts").collect()
    // only (k=1, lts=10) survives, matched to (rts=8, 80) — the null-ts
    // right row must never be carried into it, null keys never match
    got.map(x => (x.getInt(0), x.getLong(1), x.getInt(4))).toSeq shouldBe Seq((1, 10L, 80))
  }

  it should "reject overlapping non-key columns and missing keys" in {
    val l = Seq((1, 1L, "x")).toDF("k", "ts", "pay")
    val r = Seq((1, 1L, "y")).toDF("k", "rts", "pay")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asof(l, r, Seq("k"), "ts", "rts")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asof(l, r.withColumnRenamed("pay", "rpay"), Seq("nope"), "ts", "rts")
  }

  it should "execute as ONE keyed shuffle — no join, no pair blow-up (plan audit)" in {
    val l = Seq.tabulate(50)(i => (i % 5, i.toLong, i)).toDF("k", "lts", "lid")
    val r = Seq.tabulate(30)(i => (i % 5, i.toLong * 3, i)).toDF("k", "rts", "rid")
    val out = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts")
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    withClue(plan) {
      // union -> ONE hash(keys) exchange -> sort -> window; never a join
      plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
      plan should not include "Join"
      plan should include("Window")
    }
  }

  it should "produce exactly the plain as-of result under any bucketing (hot-key-safe variant)" in {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val l = Seq.tabulate(300)(i => (rnd.nextInt(4), rnd.nextInt(1000).toLong, i)).toDF("k", "lts", "lid")
    val r = Seq.tabulate(180)(i => (rnd.nextInt(4), rnd.nextInt(1000).toLong, i)).toDF("k", "rts", "rid")
    val plain = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts")
      .collect().map(_.mkString("|")).toSet
    // width 1 = every ts its own bucket (carry-in does all the work);
    // width 50 = mixed local/carry; width 1e6 = one bucket (degenerates
    // to the plain shape)
    for (w <- Seq(1.0, 50.0, 1e6)) {
      val bucketed = AsOfJoin.asofBucketed(l, r, Seq("k"), "lts", "rts",
        t => floor(t.cast("double") / w).cast("long"))
        .collect().map(_.mkString("|")).toSet
      withClue(s"bucketWidth=$w: ") { bucketed shouldBe plain }
    }
  }

  it should "spread ONE pathologically hot key across tasks (bucketed), where the plain shape cannot" in {
    import org.apache.spark.graft.ListenerBridge
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import org.apache.spark.sql.functions._
    // a single key owning every row: the plain shape must put all of it
    // on one task (per-key window semantics); the bucketed shape splits
    // it over floor(ts/1000) buckets
    val n = 120000L
    val l = spark.range(0, n, 1, 8).select(lit(1).as("k"), col("id").as("lts"), col("id").as("lid"))
    val r = spark.range(0, n, 7, 8).select(lit(1).as("k"), col("id").as("rts"), col("id").as("rid"))
    def maxTaskShuffleRecords(body: => Unit): Long = {
      val max = new java.util.concurrent.atomic.AtomicLong(0L)
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            val rec = m.shuffleReadMetrics.recordsRead
            var cur = max.get()
            while (rec > cur && !max.compareAndSet(cur, rec)) cur = max.get()
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; ListenerBridge.drain(spark.sparkContext); max.get() }
      finally spark.sparkContext.removeSparkListener(listener)
    }
    // AQE rightly COALESCES these toy partitions into one (sequential
    // longs lz4-compress below any sane advisory size); disable
    // coalescing so the partition layout shows the at-scale shape —
    // real partitions dwarf the 64 MB advisory and never merge
    val conf = spark.conf
    val savedAdv = conf.getOption("spark.sql.adaptive.coalescePartitions.enabled")
    try {
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      var rows = 0L
      val maxRecords = maxTaskShuffleRecords {
        rows = AsOfJoin.asofBucketed(l, r, Seq("k"), "lts", "rts",
          t => floor(t.cast("double") / 1000d).cast("long")).count()
      }
      rows shouldBe n // every left row has an at-or-before match (rts 0)
      val total = n + n / 7
      withClue(s"max single-task shuffle-read records = $maxRecords of ~$total: ") {
        maxRecords should be < (total / 2)
      }
    } finally savedAdv match {
      case Some(v) => conf.set("spark.sql.adaptive.coalescePartitions.enabled", v)
      case None => conf.unset("spark.sql.adaptive.coalescePartitions.enabled")
    }
  }

  it should "fail LOUDLY when bucketOf yields null for a non-null ts" in {
    import org.apache.spark.sql.functions._
    val l = Seq((1, 10L)).toDF("k", "lts")
    val r = Seq((1, 5L, 50)).toDF("k", "rts", "v")
    // a bucket function that nulls out some timestamps would make the
    // final bucket equi-join silently drop rows — it must throw instead
    val ex = intercept[Exception] {
      AsOfJoin.asofBucketed(l, r, Seq("k"), "lts", "rts",
        t => when(t < 0, t)).collect() // null bucket for every ts >= 0
    }
    ex.getMessage should include("bucketOf returned null")
  }

  it should "match a window-free brute force on random data" in {
    val rnd = new scala.util.Random(7)
    val l = Seq.tabulate(300)(i => (rnd.nextInt(5), rnd.nextInt(1000).toLong, i)).toDF("k", "lts", "lid")
    val r = Seq.tabulate(200)(i => (rnd.nextInt(5), rnd.nextInt(1000).toLong * 7 % 997, i)).toDF("k", "rts", "rid")
    // brute force: max (rts, rid) per left row via join + groupBy
    import org.apache.spark.sql.functions._
    val brute = l.join(r, Seq("k")).where(col("rts") <= col("lts"))
      .groupBy(col("k"), col("lts"), col("lid"))
      .agg(max(struct(col("rts"), col("rid"))).as("b"))
      .select(col("lid"), col("b.rts").as("rts"), col("b.rid").as("rid"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2))).toSet
    val got = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts")
      .select("lid", "rts", "rid")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2))).toSet
    got shouldBe brute
  }

  behavior of "AsOfJoin directions"

  it should "pick the smallest right ts at-or-after each left ts (forward)" in {
    val l = Seq((1, 10L, "a"), (1, 5L, "b"), (2, 7L, "c")).toDF("k", "lts", "lpay")
    val r = Seq((1, 8L, 80), (1, 3L, 30), (1, 10L, 100), (2, 5L, 50))
      .toDF("k", "rts", "v")
    val out = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", direction = "forward")
      .collect().map(x =>
        (x.getInt(0), x.getLong(1), x.getLong(3), x.getInt(4))).toSet
    out shouldBe Set(
      (1, 10L, 10L, 100), // at-or-after inclusive
      (1, 5L, 8L, 80))    // k=2: only rts 5 < 7 => no forward match
  }

  it should "pick the closer side with ties to backward (nearest)" in {
    val l = Seq((1, 10L), (1, 6L), (1, 1L), (2, 7L)).toDF("k", "lts")
    val r = Seq((1, 4L, 40), (1, 8L, 80), (2, 20L, 200)).toDF("k", "rts", "v")
    val out = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", direction = "nearest")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSet
    out shouldBe Set(
      (1, 10L, 8L, 80),  // only backward exists at distance 2
      (1, 6L, 4L, 40),   // TIE (|6-4| == |8-6|): backward wins
      (1, 1L, 4L, 40),   // only forward exists
      (2, 7L, 20L, 200)) // nearest keeps rows any single direction drops
  }

  it should "match window-free brute forces on random data in every direction" in {
    val rnd = new scala.util.Random(13)
    val l = Seq.tabulate(300)(i => (rnd.nextInt(5), rnd.nextInt(1000).toLong, i)).toDF("k", "lts", "lid")
    val r = Seq.tabulate(200)(i => (rnd.nextInt(5), rnd.nextInt(1000).toLong * 7 % 997, i)).toDF("k", "rts", "rid")
    import org.apache.spark.sql.functions._
    // forward: min (rts, rid) among at-or-after
    val bruteF = l.join(r, Seq("k")).where(col("rts") >= col("lts"))
      .groupBy(col("k"), col("lts"), col("lid"))
      .agg(min(struct(col("rts"), col("rid"))).as("b"))
      .select(col("lid"), col("b.rts"), col("b.rid"))
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2))).toSet
    AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", direction = "forward")
      .select("lid", "rts", "rid")
      .collect().map(x => (x.getInt(0), x.getLong(1), x.getInt(2))).toSet shouldBe bruteF
    // nearest: argmin (|dist|, backward-first, payload rule) — the
    // payload tie rule differs per side, so compare via the SAME
    // (distance, side) argmin then the matched ts only (rid ties
    // cannot arise here: rts values are distinct per (k, rid) stream)
    val bruteN = l.join(r, Seq("k"))
      .groupBy(col("k"), col("lts"), col("lid"))
      .agg(min(struct(abs(col("rts") - col("lts")),
        when(col("rts") <= col("lts"), 0).otherwise(1).as("fwd"),
        col("rts"))).as("b"))
      .select(col("lid"), col("b.rts"))
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
    AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", direction = "nearest")
      .select("lid", "rts")
      .collect().map(x => (x.getInt(0), x.getLong(1))).toSet shouldBe bruteN
  }

  it should "handle timestamp-typed ts in nearest mode and reject bad directions" in {
    import org.apache.spark.sql.functions._
    val l = Seq((1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:40:00"))
      .toDF("k", "s").select(col("k"), to_timestamp(col("s")).as("lts"))
    val r = Seq((1, "2024-01-01 09:00:00", 9), (1, "2024-01-01 12:00:00", 12))
      .toDF("k", "s", "v")
      .select(col("k"), to_timestamp(col("s")).as("rts"), col("v"))
    AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", direction = "nearest")
      .select("v").collect().map(_.getInt(0)).sorted.toSeq shouldBe Seq(9, 12)
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", direction = "sideways")
  }

  behavior of "AsOfJoin left outer"

  it should "keep unmatched left rows with null right columns, matched rows identical to inner" in {
    import org.apache.spark.sql.functions._
    val l = Seq((1, 10L, "early"), (1, 30L, "late"), (2, 5L, "lone"))
      .toDF("k", "lts", "tag2")
    val r = Seq((1, 20L, 200)).toDF("k", "rts", "v")
    val left = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", joinType = "left")
      .select("tag2", "rts", "v")
      .collect().map(x => (x.getString(0), Option(x.get(1)), Option(x.get(2)))).toSet
    left shouldBe Set(
      ("early", None, None), // before any right row: kept, nulls
      ("late", Some(20L), Some(200)),
      ("lone", None, None)) // key 2 has no right rows at all
    // inner = left minus the null-matched rows, row-for-row
    val inner = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts")
      .select("tag2", "rts", "v").collect().toSet
    AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", joinType = "left")
      .where(col("rts").isNotNull)
      .select("tag2", "rts", "v").collect().toSet shouldBe inner
  }

  it should "emit null-key/null-ts left rows on the outer path (unsatisfiable, not dropped)" in {
    val l = Seq((Option(1), Option(10L), "ok"), (None, Option(10L), "nullkey"),
      (Option(1), Option.empty[Long], "nullts")).toDF("k", "lts", "tag2")
    val r = Seq((1, 5L, 50)).toDF("k", "rts", "v")
    val got = AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", joinType = "left")
      .select("tag2", "v")
      .collect().map(x => (x.getString(0), Option(x.get(1)))).toSet
    got shouldBe Set(("ok", Some(50)), ("nullkey", None), ("nullts", None))
    // inner still drops them
    AsOfJoin.asof(l, r, Seq("k"), "lts", "rts").count() shouldBe 1L
  }

  it should "produce identical left-outer results through the bucketed variant" in {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(200)(i => (rnd.nextInt(4), rnd.nextInt(1000).toLong, i)).toDF("k", "lts", "lid")
    val r = Seq.tabulate(60)(i => (rnd.nextInt(4), rnd.nextInt(500).toLong + 400, i)).toDF("k", "rts", "rid")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rts", "rid").collect()
        .map(x => (x.getInt(0), Option(x.get(1)), Option(x.get(2)))).toSet
    val plain = norm(AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", joinType = "left"))
    val bucketed = norm(AsOfJoin.asofBucketed(l, r, Seq("k"), "lts", "rts",
      t => floor(t / 100), joinType = "left"))
    bucketed shouldBe plain
    plain.size shouldBe 200 // every left row present exactly once
  }

  it should "reject an unknown joinType" in {
    val l = Seq((1, 10L)).toDF("k", "lts")
    val r = Seq((1, 5L, 50)).toDF("k", "rts", "v")
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asof(l, r, Seq("k"), "lts", "rts", joinType = "full")
  }

  it should "bound match age with tolerance (inner drops, left nulls)" in {
    import spark.implicits._
    val l = Seq((1L, 100L), (1L, 500L), (2L, 90L)).toDF("k", "lts")
    val r = Seq((1L, 95L, "a"), (1L, 200L, "b"), (2L, 10L, "c")).toDF("k", "rts", "pay")
    // backward matches: (1,100)->95 d=5; (1,500)->200 d=300; (2,90)->10 d=80
    val inner = AsOfJoin.asofWithin(l, r, Seq("k"), "lts", "rts", tolerance = 100L)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(3))).toSet
    inner shouldBe Set((1L, 100L, "a"), (2L, 90L, "c"))
    val left = AsOfJoin.asofWithin(l, r, Seq("k"), "lts", "rts",
        tolerance = 100L, joinType = "left")
      .collect().map(x => (x.getLong(0), x.getLong(1),
        if (x.isNullAt(3)) null else x.getString(3))).toSet
    left shouldBe Set((1L, 100L, "a"), (1L, 500L, null), (2L, 90L, "c"))
    // nearest under tolerance: chosen side's distance governs
    val near = AsOfJoin.asofWithin(l, r, Seq("k"), "lts", "rts",
        tolerance = 100L, direction = "nearest")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(3))).toSet
    near shouldBe Set((1L, 100L, "a"), (2L, 90L, "c")) // 500's nearest is 200, d=300 > 100
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.asofWithin(l, r, Seq("k"), "lts", "rts", tolerance = -1L)
  }
}
