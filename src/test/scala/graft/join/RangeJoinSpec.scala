package graft.join

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class RangeJoinSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "RangeJoin.pointInInterval"

  it should "join points to enclosing intervals inclusively on both ends" in {
    val pts = Seq((1, 5.0), (2, 10.0), (3, 20.0), (4, -3.0)).toDF("pid", "v")
    val ivs = Seq(("a", 5.0, 10.0), ("b", 9.0, 9.5), ("c", -10.0, 0.0), ("d", 30.0, 25.0))
      .toDF("iid", "lo", "hi") // d inverted => dropped
    val got = RangeJoin.pointInInterval(pts, ivs, col("v"), col("lo"), col("hi"), 5.0)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    got shouldBe Set((1, "a"), (2, "a"), (4, "c")) // 5 and 10 are both IN [5,10]
  }

  it should "match the brute-force BETWEEN join on random data (negative values included)" in {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(400)(i => (i, rnd.nextDouble() * 200 - 100)).toDF("pid", "v")
    val ivs = Seq.tabulate(150) { i =>
      val lo = rnd.nextDouble() * 200 - 100
      (i, lo, lo + rnd.nextDouble() * 12)
    }.toDF("iid", "lo", "hi")
    val w = RangeJoin.autoWidth(ivs, col("lo"), col("hi"))
    w should be > 0.0
    val brute = pts.crossJoin(ivs).where(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val got = RangeJoin.pointInInterval(pts, ivs, col("v"), col("lo"), col("hi"), w)
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    got shouldBe brute
    got.size should be > 0
  }

  it should "keep unmatched and null-valued points on a left join (brute-force parity)" in {
    val rnd = new scala.util.Random(13)
    val pts = Seq.tabulate(300)(i =>
      (i, if (i % 29 == 0) None else Some(rnd.nextDouble() * 220 - 110)))
      .toDF("pid", "v")
    val ivs = Seq.tabulate(40) { i =>
      val lo = rnd.nextDouble() * 160 - 80 // narrower than the point domain: gaps
      (i, lo, lo + rnd.nextDouble() * 6)
    }.toDF("iid", "lo", "hi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "iid").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .sorted.toSeq
    val brute = canon(pts.join(ivs,
      col("v") >= col("lo") && col("v") <= col("hi"), "left"))
    val got = canon(RangeJoin.pointInInterval(
      pts, ivs, col("v"), col("lo"), col("hi"), 5.0, joinType = "left"))
    got shouldBe brute
    got.count(_._2 == -1) should be > 0 // real misses exercised
    // wide channel active too: a 1-bucket cap routes everything wide
    val gotWide = canon(RangeJoin.pointInInterval(
      pts, ivs, col("v"), col("lo"), col("hi"), 5.0,
      maxBucketsPerInterval = 1, joinType = "left"))
    gotWide shouldBe brute
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(pts, ivs, col("v"), col("lo"), col("hi"),
        5.0, joinType = "full")
  }

  it should "plan a bucket equi-join, never a cartesian, with broadcast disabled (plan audit)" in {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val pts = Seq.tabulate(100)(i => (i, i.toDouble)).toDF("pid", "v")
      val ivs = Seq.tabulate(40)(i => (i, i * 2.0, i * 2.0 + 3.0)).toDF("iid", "lo", "hi")
      val out = RangeJoin.pointInInterval(pts, ivs, col("v"), col("lo"), col("hi"), 2.0)
      out.count()
      val plan = out.queryExecution.executedPlan.toString
      withClue(plan) {
        // the 100 TB shape: shuffle equi-join on the bucket id
        (plan should not).include("CartesianProduct")
        (plan should not).include("BroadcastNestedLoopJoin")
        plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 2
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  it should "emit each qualifying pair exactly once even for multi-bucket intervals" in {
    val pts = Seq((1, 7.0)).toDF("pid", "v")
    val ivs = Seq(("wide", 0.0, 100.0)).toDF("iid", "lo", "hi") // spans many 1.0-buckets
    val rows = RangeJoin.pointInInterval(pts, ivs, col("v"), col("lo"), col("hi"), 1.0)
      .collect()
    rows.length shouldBe 1
  }

  /** Final physical plan after adaptive execution (the plan whose nodes
    * carry real metrics). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  it should "bound the explode fan-out of a domain-spanning interval (broadcast side-channel)" in {
    // one sentinel interval spanning 2 BILLION 0.5-buckets: exploding it
    // would manufacture 2e9 shuffle rows from a single input row. With
    // the cap it joins via the broadcast channel; the explode (Generate)
    // processes only the narrow intervals.
    val pts = Seq.tabulate(200)(i => (i, i.toDouble)).toDF("pid", "v")
    val ivs = (Seq.tabulate(50)(i => (i, i * 4.0, i * 4.0 + 2.0)) :+
      ((999, -1e8, 1e9))).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, col("v"), col("lo"), col("hi"),
      bucketWidth = 0.5, maxBucketsPerInterval = 1000)
    val got = out.select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val brute = pts.crossJoin(ivs).where(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    got shouldBe brute
    got.count(_._2 == 999) shouldBe 200 // the wide interval matches everything
    // bounded fan-out, observed on the executed plan's own metrics: the
    // Generate nodes emitted narrow-interval rows only (<= 50 intervals
    // x 5 buckets each), nowhere near the 2e9 a capless explode produces
    val generated = finalPlan(out).collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g.metrics("numOutputRows").value
    }.sum
    withClue(s"explode output rows = $generated: ") {
      generated should be <= 300L
    }
    finalPlan(out).toString should include("BroadcastNestedLoopJoin")
  }

  it should "collapse the empty wide channel under AQE (no extra pass over the points side)" in {
    // no interval exceeds the cap: AQE observes the empty broadcast side
    // at runtime and propagates the empty relation, so the final plan
    // carries no nested-loop join and the points side is scanned once
    val pts = Seq.tabulate(100)(i => (i, i.toDouble)).toDF("pid", "v")
    val ivs = Seq.tabulate(40)(i => (i, i * 2.0, i * 2.0 + 3.0)).toDF("iid", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, ivs, col("v"), col("lo"), col("hi"), 2.0)
    out.count()
    finalPlan(out).toString should not include "BroadcastNestedLoopJoin"
  }

  behavior of "RangeJoin.overlapJoin"

  it should "keep unmatched left intervals on the left overlap join (brute-force parity)" in {
    val rnd = new scala.util.Random(19)
    val lhs = Seq.tabulate(200) { i =>
      if (i % 31 == 0) (i, None, None) // null bounds: miss by definition
      else {
        val lo = rnd.nextDouble() * 200 - 100
        (i, Some(lo), Some(lo + rnd.nextDouble() * 8))
      }
    }.toDF("lid_", "alo", "ahi")
    val rhs = Seq.tabulate(25) { i =>
      val lo = rnd.nextDouble() * 120 - 60 // narrower domain: gaps exist
      (i, lo, lo + rnd.nextDouble() * 4)
    }.toDF("rid_", "blo", "bhi")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("lid_", "rid_").collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .sorted.toSeq
    val brute = canon(lhs.join(rhs,
      col("alo") <= col("bhi") && col("blo") <= col("ahi"), "left"))
    val got = canon(RangeJoin.overlapJoinLeft(lhs, rhs,
      col("alo"), col("ahi"), col("blo"), col("bhi"), 5.0))
    got shouldBe brute
    got.count(_._2 == -1) should be > 0
    // wide channel exercised: 1-bucket cap routes everything wide
    canon(RangeJoin.overlapJoinLeft(lhs, rhs,
      col("alo"), col("ahi"), col("blo"), col("bhi"), 5.0,
      maxBucketsPerInterval = 1)) shouldBe brute
  }

  it should "match intervals that intersect, touching endpoints included" in {
    val a = Seq((1, 0.0, 5.0), (2, 10.0, 12.0), (3, 20.0, 19.0)).toDF("aid", "alo", "ahi")
    val b = Seq(("x", 5.0, 8.0), ("y", 6.0, 9.9), ("z", -3.0, 0.0)).toDF("bid", "blo", "bhi")
    val got = RangeJoin.overlapJoin(a, b,
      col("alo"), col("ahi"), col("blo"), col("bhi"), bucketWidth = 4.0)
      .select("aid", "bid").collect().map(r => (r.getInt(0), r.getString(1))).toSet
    // 3 is inverted => dropped; [0,5] touches [5,8] and [-3,0]
    got shouldBe Set((1, "x"), (1, "z"))
  }

  it should "match the brute-force overlap join exactly once per pair on random data" in {
    val rnd = new scala.util.Random(23)
    def ivs(n: Int, seed: Int) = Seq.tabulate(n) { i =>
      val lo = rnd.nextDouble() * 200 - 100
      (i, lo, lo + rnd.nextDouble() * 15)
    }
    val a = ivs(300, 1).toDF("aid", "alo", "ahi")
    val b = ivs(200, 2).toDF("bid", "blo", "bhi")
    val brute = a.crossJoin(b)
      .where(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val got = RangeJoin.overlapJoin(a, b,
      col("alo"), col("ahi"), col("blo"), col("bhi"), bucketWidth = 7.0)
      .select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // multiset equality: no pair lost, none double-counted by the
    // shared-bucket dedup rule
    got.sorted shouldBe brute.sorted
    got.size should be > 100
  }

  it should "plan the overlap join as a bucket equi-join, never a cartesian (plan audit)" in {
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val a = Seq.tabulate(100)(i => (i, i * 1.0, i * 1.0 + 2.0)).toDF("aid", "alo", "ahi")
      val b = Seq.tabulate(80)(i => (i, i * 1.5, i * 1.5 + 1.0)).toDF("bid", "blo", "bhi")
      val out = RangeJoin.overlapJoin(a, b,
        col("alo"), col("ahi"), col("blo"), col("bhi"), bucketWidth = 2.0)
      out.count()
      val plan = out.queryExecution.executedPlan.toString
      withClue(plan) {
        (plan should not).include("CartesianProduct")
        (plan should not).include("BroadcastNestedLoopJoin")
        plan.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 2
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  it should "bound the fan-out of domain-spanning intervals on either side" in {
    // one sentinel on EACH side spanning ~2e9 half-width buckets; both
    // must route through the broadcast channels, and the pair space
    // still partitions exactly (wide-left meets all right, wide-right
    // meets narrow-left only => the wide-wide pair appears once)
    val a = (Seq.tabulate(60)(i => (i, i * 3.0, i * 3.0 + 2.0)) :+
      ((888, -1e8, 1e9))).toDF("aid", "alo", "ahi")
    val b = (Seq.tabulate(40)(i => (i, i * 4.0, i * 4.0 + 2.0)) :+
      ((999, -1e8, 1e9))).toDF("bid", "blo", "bhi")
    val out = RangeJoin.overlapJoin(a, b,
      col("alo"), col("ahi"), col("blo"), col("bhi"),
      bucketWidth = 0.5, maxBucketsPerInterval = 1000)
    val got = out.select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val brute = a.crossJoin(b)
      .where(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    got.sorted shouldBe brute.sorted
    got.count(_ == ((888, 999))) shouldBe 1 // wide-wide exactly once
    val generated = finalPlan(out).collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g.metrics("numOutputRows").value
    }.sum
    withClue(s"explode output rows = $generated: ") {
      generated should be <= 700L // narrow intervals only, ~5 buckets each
    }
  }
}
