package graft.stats

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Group-wise exact quantiles: explicit-rank contract (pN = smallest v
 * with 100·cum >= N·n), null handling, duplicate-heavy input (the
 * histogram collapse), and the plan guarantee that the rank window
 * never sorts data rows.
 */
class GroupStatsSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "GroupStats.quantiles"

  it should "compute explicit-rank percentiles per group" in {
    // group a: values 1..10 — p50 = 5 (cum 5, 100*5 >= 50*10),
    // p90 = 9, p100 = 10; group b: all-equal values
    val df = ((1 to 10).map(v => ("a", v)) ++ Seq.fill(4)(("b", 7))).toDF("g", "v")
    val out = GroupStats.quantiles(df, Seq("g"), "v", Seq(50, 90, 100))
      .orderBy("g")
      .as[(String, Long, Int, Int, Int, Int, Int)].collect()
    out(0) shouldBe (("a", 10L, 1, 10, 5, 9, 10))
    out(1) shouldBe (("b", 4L, 7, 7, 7, 7, 7))
  }

  it should "drop nulls and collapse duplicates before ranking" in {
    val df = Seq(("a", Some(1)), ("a", None), ("a", Some(1)), ("a", Some(3)))
      .toDF("g", "v")
    val out = GroupStats.quantiles(df, Seq("g"), "v", Seq(50))
      .as[(String, Long, Int, Int, Int)].collect()
    // n counts non-null rows (3); p50 = 1 (cum 2 of 3: 200 >= 150)
    out.head shouldBe (("a", 3L, 1, 3, 1))
  }

  it should "match percentile_cont-free brute force on random data" in {
    val rnd = new scala.util.Random(13)
    val df = Seq.tabulate(500)(i => (s"g${i % 3}", rnd.nextInt(40))).toDF("g", "v")
    val got = GroupStats.quantiles(df, Seq("g"), "v", Seq(25, 75))
      .collect().map(r => r.getString(0) -> ((r.getInt(4), r.getInt(5)))).toMap
    val data = df.collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- data) {
      def pick(q: Int) = vs((q * vs.length + 99) / 100 - 1) // ceil rank
      got(g) shouldBe ((pick(25), pick(75)))
    }
  }

  it should "rank over histogram rows, not data rows (plan audit)" in {
    val df = Seq.fill(1000)(("a", 5)).toDF("g", "v")
    val plan = GroupStats.quantiles(df, Seq("g"), "v", Seq(50))
      .queryExecution.executedPlan.toString
    // the aggregation below the window is the histogram collapse — the
    // window input is grouped (g, v) rows, so a 1000-duplicate group
    // feeds a 1-row window partition
    plan.indexOf("Window") should be > 0
    plan.substring(plan.indexOf("Window")) should include("HashAggregate")
  }

  it should "validate percentile bounds and duplicates" in {
    val df = Seq(("a", 1)).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(df, Seq("g"), "v", Seq(0))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(df, Seq("g"), "v", Seq(101))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(df, Seq("g"), "v", Seq(50, 50))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(df, Seq.empty, "v", Seq(50))
    // a value or group column named like an output column must be rejected
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(Seq(("a", 1)).toDF("g", "n"), Seq("g"), "n", Seq(50))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(Seq(("a", 1)).toDF("p50", "v"), Seq("p50"), "v", Seq(50))
    // ... and so must a column named like an INTERNAL temp column, which
    // would alias the histogram count/cumsum/total and corrupt the rank
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(Seq(("a", 1)).toDF("g", "__c"), Seq("g"), "__c", Seq(50))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(Seq(("a", 1)).toDF("__cum", "v"), Seq("__cum"), "v", Seq(50))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantiles(Seq(("a", 1)).toDF("__tot", "v"), Seq("__tot"), "v", Seq(50))
  }

  it should "profile hot values with deterministic ties and null counting" in {
    import org.apache.spark.sql.functions.col
    val df = Seq(Some("a"), Some("a"), Some("a"), Some("b"), Some("b"),
      Some("c"), None, None).toDF("v")
    val top = GroupStats.topValues(df, "v", k = 3)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    top.toSeq shouldBe Seq(
      (Some("a"), 3L, 1L), (Some("b"), 2L, 2L), (None, 2L, 3L))
    // tie between b(2) and null(2): non-null sorts first (asc_nulls_last)
    // k larger than distinct values: everything, still ranked
    GroupStats.topValues(df, "v", k = 10).count() shouldBe 4L
    // TakeOrdered shape: no global sort exchange materializes the full
    // count table (the limit rides into the sort)
    val plan = GroupStats.topValues(df, "v", k = 3)
      .queryExecution.executedPlan.toString
    plan should include ("TakeOrderedAndProject")
    an[IllegalArgumentException] should be thrownBy GroupStats.topValues(df, "v", 0)
  }

  behavior of "GroupStats.standardize"

  it should "stamp exact micro-unit z-scores and null degenerate groups" in {
    val df = Seq(("g", 1), ("g", 2), ("g", 3), ("g", 4),
      ("h", 7), ("h", 7), ("i", 5)).toDF("grp", "v")
    val out = GroupStats.standardize(df, Seq("grp"), "v")
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // g: mean 2.5, pop-var 1.25, std ~1.1180
    val std = math.sqrt(1.25)
    out(("g", 1)) shouldBe Some(math.floor(1e6 * (1 - 2.5) / std).toLong)
    out(("g", 4)) shouldBe Some(math.floor(1e6 * (4 - 2.5) / std).toLong)
    out(("h", 7)) shouldBe None // zero variance
    out(("i", 5)) shouldBe None // singleton
    an[IllegalArgumentException] should be thrownBy
      GroupStats.standardize(df.withColumn("d", col("v").cast("double")),
        Seq("grp"), "d") // non-integral value column
    an[IllegalArgumentException] should be thrownBy
      GroupStats.standardize(df.withColumn("z_micro", col("v")), Seq("grp"), "v")
  }

  behavior of "GroupStats.quantileBins"

  it should "assign equal-frequency bins without an ntile sort, ties sharing a bin" in {
    // group g: values 1..8 once each -> quartiles of 2
    val g = (1 to 8).map(v => ("g", v))
    // group h: value 5 holds half the mass -> its bin swallows a quartile
    val h = Seq(("h", 1), ("h", 2), ("h", 5), ("h", 5), ("h", 5), ("h", 9))
    val df = (g ++ h).toDF("grp", "v")
    val out = GroupStats.quantileBins(df, Seq("grp"), "v", numBins = 4)
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    (1 to 8).map(v => out(("g", v))).toSeq shouldBe
      Seq(0L, 0L, 1L, 1L, 2L, 2L, 3L, 3L)
    out(("h", 1)) shouldBe 0L
    out(("h", 2)) shouldBe 0L // cum=2 of 6 -> (1*4) div 6 = 0
    out(("h", 5)) shouldBe 2L // cum=5 -> (4*4) div 6 = 2; all ties share
    out(("h", 9)) shouldBe 3L
  }

  it should "null-bin null values and validate inputs" in {
    val df = Seq((Some(1), "g"), (None, "g"), (Some(2), "g"))
      .toDF("v", "grp")
    val out = GroupStats.quantileBins(df, Seq("grp"), "v", 2)
      .collect().map(r => (Option(r.get(1)).map(_.toString.toInt),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    out shouldBe Set((Some(1), 0L), (Some(2), 1L), (None, -1L))
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantileBins(df, Seq("grp"), "v", 1)
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantileBins(df.withColumnRenamed("v", "__cum"), Seq("grp"), "__cum", 2)
    an[IllegalArgumentException] should be thrownBy
      GroupStats.quantileBins(df.withColumn("bin", col("v")), Seq("grp"), "v", 2)
  }

  it should "bin rows whose GROUP key is null (null-safe join back)" in {
    val df = Seq((Some("g"), 1), (None, 2), (None, 4), (None, 6), (None, 8))
      .toDF("grp", "v")
    val out = GroupStats.quantileBins(df, Seq("grp"), "v", 2)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // the null-key group is a real histogram group: 2,4 -> bin 0; 6,8 -> bin 1
    out shouldBe Set((Some("g"), 1, 0L), (None, 2, 0L), (None, 4, 0L),
      (None, 6, 1L), (None, 8, 1L))
  }

  behavior of "GroupStats.spearman"

  it should "match hand-computed rho for perfect, reversed, and tied data" in {
    // g1: y = x (perfect) -> rho = 1e6. g2: y = -x (reversed) -> -1e6.
    val df = Seq(("g1", 1L, 10L), ("g1", 2L, 20L), ("g1", 3L, 30L),
      ("g2", 1L, 30L), ("g2", 2L, 20L), ("g2", 3L, 10L))
      .toDF("g", "x", "y")
    val out = GroupStats.spearman(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out shouldBe Map("g1" -> ((3L, 1000000L)), "g2" -> ((3L, -1000000L)))
  }

  it should "use average ranks for ties" in {
    // x: 1,2,2,4 -> avg2 ranks 2,5,5,8; y: 10,20,30,40 -> 2,4,6,8
    // D: 0,1,-1,0 -> sum 2;  rho = 1 - 3*2/(2*4*15) = 1 - 1/20 = 0.95
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 2L, 30L),
      ("g", 4L, 40L)).toDF("g", "x", "y")
    val out = GroupStats.spearman(df, Seq("g"), "x", "y").collect().head
    (out.getLong(1), out.getLong(2)) shouldBe ((4L, 950000L))
  }

  it should "drop null coordinates, keep null group keys, NULL n<2" in {
    val df = Seq((Some("g"), Some(1L), Some(1L)),
      (Some("g"), Some(2L), None), // dropped: null y
      (None, Some(1L), Some(2L)), (None, Some(2L), Some(1L)),
      (Some("solo"), Some(5L), Some(5L))) // n = 1 -> NULL rho
      .toDF("g", "x", "y")
    val out = GroupStats.spearman(df, Seq("g"), "x", "y")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    out shouldBe Set((Some("g"), 1L, None), (None, 2L, Some(-1000000L)),
      (Some("solo"), 1L, None))
  }

  it should "reach ±1e6 under ties when tieCorrected, match hand-computed rho" in {
    // g1: x has ties but y is a perfect monotone function of x's tie
    // structure is NOT required — use y strictly increasing WITH x
    // tie-broken consistently: x: 1,2,2,4; y: 10,20,20,40 (ties in the
    // SAME places) -> average ranks identical -> tie-corrected rho = 1e6
    // (the no-tie normalizer cannot reach 1e6 here)
    val tied = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 2L, 20L),
      ("g", 4L, 40L)).toDF("g", "x", "y")
    val rc = GroupStats.spearman(tied, Seq("g"), "x", "y",
      tieCorrected = true).collect().head
    (rc.getLong(1), rc.getLong(2)) shouldBe ((4L, 1000000L))
    // hand check on mixed ties: x: 1,2,2,4 (Tx = 2³−2 = 6),
    // y: 10,20,30,40 (Ty = 0); ΣD² = 4·Σd² and Σd² from the untied
    // spec above is 2/4·... reuse: D = 0,1,−1,0 → ΣD² = 2;
    // A = 60−6 = 54, B = 60; rho = (54+60−6)/(2·√3240) = 108/113.84...
    // = 0.948683...; micro truncated = 948683
    val mixed = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 2L, 30L),
      ("g", 4L, 40L)).toDF("g", "x", "y")
    val rm = GroupStats.spearman(mixed, Seq("g"), "x", "y",
      tieCorrected = true).collect().head
    (rm.getLong(1), rm.getLong(2)) shouldBe ((4L, 948683L))
    // tie-free data: both normalizers agree exactly
    val free = Seq(("g", 1L, 30L), ("g", 2L, 10L), ("g", 3L, 20L))
      .toDF("g", "x", "y")
    val a = GroupStats.spearman(free, Seq("g"), "x", "y").collect().head
    val b = GroupStats.spearman(free, Seq("g"), "x", "y",
      tieCorrected = true).collect().head
    b.getLong(2) shouldBe a.getLong(2)
    // a constant column is undefined correlation -> NULL (A·B = 0)
    val const = Seq(("g", 7L, 1L), ("g", 7L, 2L)).toDF("g", "x", "y")
    val rk = GroupStats.spearman(const, Seq("g"), "x", "y",
      tieCorrected = true).collect().head
    rk.isNullAt(2) shouldBe true
  }

  it should "reject colliding and identical column names" in {
    val df = Seq(("g", 1L, 2L)).toDF("g", "x", "y")
    intercept[IllegalArgumentException] {
      GroupStats.spearman(df, Seq("g"), "x", "x")
    }
    intercept[IllegalArgumentException] {
      GroupStats.spearman(df.withColumnRenamed("x", "n"), Seq("g"), "n", "y")
    }
  }

  it should "fail loudly when standardize's sum of squares overflows" in {
    // |v| ~ 9e17: v*v ~ 8e35, overflows decimal(38,0) after ~240 rows
    val big = (1 to 300).map(i => ("g", 900000000000000000L + i))
      .toDF("grp", "v")
    val ex = intercept[Exception] {
      GroupStats.standardize(big, Seq("grp"), "v").collect()
    }
    // ANSI sessions (the Spark 4 default) fail in the sum itself;
    // non-ANSI sessions NULL the sum and hit the in-plan raise_error —
    // loud either way, which is the contract
    ex.getMessage should (include ("overflowed") or include ("ARITHMETIC_OVERFLOW"))
  }

  behavior of "GroupStats.winsorize"

  it should "clip into the group's [pLo, pHi] band by the explicit rank rule" in {
    // group g: values 1..10 — p10 = smallest v with 10·cum >= n (v=1),
    // p90 = smallest v with 100·cum >= 90·10 (v=9): 10 clips to 9
    val df = (1 to 10).map(v => ("g", v.toLong)).toDF("grp", "v")
    val out = GroupStats.winsorize(df, Seq("grp"), "v", 10, 90, "w")
      .as[(String, Long, Long)].collect().sortBy(_._2).toList
    out.map(_._3) shouldBe List(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 9L)
  }

  it should "clip each group against its own boundaries" in {
    val df = ((1 to 10).map(v => ("a", v.toLong)) ++
      (101 to 110).map(v => ("b", v.toLong))).toDF("grp", "v")
    val out = GroupStats.winsorize(df, Seq("grp"), "v", 10, 90, "w")
      .as[(String, Long, Long)].collect()
    out.filter(_._1 == "a").map(_._3).max shouldBe 9L
    out.filter(_._1 == "b").map(_._3).max shouldBe 109L
    out.filter(_._1 == "b").map(_._3).min shouldBe 101L
  }

  it should "pass null values through and validate parameters" in {
    val df = Seq(("g", Some(1L)), ("g", Some(2L)), ("g", Some(3L)),
      ("g", None)).toDF("grp", "v")
    val out = GroupStats.winsorize(df, Seq("grp"), "v", 10, 90, "w")
      .as[(String, Option[Long], Option[Long])].collect()
    out.count(_._3.isEmpty) shouldBe 1
    an[IllegalArgumentException] should be thrownBy
      GroupStats.winsorize(df, Seq("grp"), "v", 90, 10, "w")
    an[IllegalArgumentException] should be thrownBy
      GroupStats.winsorize(df, Seq("grp"), "v", 10, 90, "v")
  }

  it should "pass rows with a NULL group key through unclipped" in {
    // pinned round-10 (ADVICE): the boundary join is LEFT — a NULL
    // group key matches no boundary row (SQL equality), so the value
    // survives unclipped instead of being dropped; the q_winsorize
    // oracle replays the same LEFT JOIN pass-through
    val df = Seq((Some("g"), 1L), (Some("g"), 2L), (Some("g"), 100L),
      (None, 999L)).toDF("grp", "v")
    val out = GroupStats.winsorize(df, Seq("grp"), "v", 10, 90, "w")
      .as[(Option[String], Long, Long)].collect()
    out.length shouldBe 4 // nothing dropped
    out.find(_._1.isEmpty).map(_._3) shouldBe Some(999L) // pass-through
  }

  behavior of "GroupStats.gini"

  it should "score uniform 0 and max concentration (n-1)/n exactly" in {
    val df = (Seq.fill(4)(("even", 1L)) ++
      Seq(("skew", 0L), ("skew", 0L), ("skew", 0L), ("skew", 4L)))
      .zipWithIndex.map { case ((gr, v), i) => (gr, v, i.toLong) }
      .toDF("g", "v", "id")
    val out = GroupStats.gini(df, Seq("g"), "v", "id")
      .as[(String, Long, Long, Option[Long])].collect().sortBy(_._1).toList
    out shouldBe List(
      ("even", 4L, 4L, Some(0L)),
      ("skew", 4L, 4L, Some(750000L))) // (n-1)/n = 0.75
  }

  it should "be tie-order-insensitive, NULL on zero mass, loud on negatives" in {
    // two ties (3, 3): Σr·x over the tie block is order-free
    val df = Seq(("g", 3L, 9L), ("g", 3L, 1L), ("g", 6L, 5L))
      .toDF("g", "v", "id")
    val gm = GroupStats.gini(df, Seq("g"), "v", "id")
      .as[(String, Long, Long, Option[Long])].collect().head._4.get
    // ranks 1,2 for the 3s (either order), 3 for 6:
    // T = 3+6+18 = 27; (2·27 − 4·12)·1e6 div (3·12) = 6e6/36 = 166666
    gm shouldBe 166666L
    val zeros = Seq(("g", 0L, 1L)).toDF("g", "v", "id")
    GroupStats.gini(zeros, Seq("g"), "v", "id")
      .as[(String, Long, Long, Option[Long])].collect().head._4 shouldBe None
    val neg = Seq(("g", -1L, 1L)).toDF("g", "v", "id")
    intercept[Exception] {
      GroupStats.gini(neg, Seq("g"), "v", "id").collect()
    }.getMessage should include("non-negative")
  }

  behavior of "GroupStats.groupPercentRank"

  it should "rank inside each group and scale to micro percentiles" in {
    // group a: values 10,20,30 -> ranks 0,1,2 -> pct 0, 500000, 1000000
    // group b: one row -> rank 0, pct 0 (singleton contract)
    val df = Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
      ("b", 5L, 9L)).toDF("g", "v", "id")
    val out = GroupStats.groupPercentRank(df, Seq("g"), "v", "id")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(t => (t._1, t._4)).toList
    out shouldBe List(
      ("a", 10L, 1L, 0L, 0L), ("a", 20L, 2L, 1L, 500000L),
      ("a", 30L, 3L, 2L, 1000000L), ("b", 5L, 9L, 0L, 0L))
  }

  it should "break value ties by the tie column and support descending" in {
    val df = Seq(("g", 7L, 2L), ("g", 7L, 1L), ("g", 3L, 3L))
      .toDF("g", "v", "id")
    val asc = GroupStats.groupPercentRank(df, Seq("g"), "v", "id")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._4).toList
    asc.map(t => (t._2, t._3)) shouldBe List((3L, 3L), (7L, 1L), (7L, 2L))
    val desc = GroupStats.groupPercentRank(df, Seq("g"), "v", "id",
      descending = true)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._4).toList
    desc.map(t => (t._2, t._3)) shouldBe List((7L, 1L), (7L, 2L), (3L, 3L))
  }

  behavior of "GroupStats.globalRank"

  it should "produce the exact total order with heavy ties" in {
    // 40 rows, only 4 distinct scores — ranks must be a permutation of
    // 0..39 matching (score asc, id asc)
    val df = (0L until 40L).map(i => (i % 4, i)).toDF("s", "id")
    val out = GroupStats.globalRank(df, "s", "id", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3).toList
    out.map(_._3) shouldBe (0L until 40L).toList
    val expected = (0L until 40L).map(i => (i % 4, i)).sorted.toList
    out.map(t => (t._1, t._2)) shouldBe expected
  }

  it should "rank descending with ascending id ties" in {
    val df = Seq((5L, 1L), (5L, 2L), (9L, 3L), (1L, 4L)).toDF("s", "id")
    val out = GroupStats.globalRank(df, "s", "id", "rank", descending = true)
      .as[(Long, Long, Long)].collect().sortBy(_._3).toList
    out.map(t => (t._1, t._2)) shouldBe
      List((9L, 3L), (5L, 1L), (5L, 2L), (1L, 4L))
  }

  it should "exclude null coordinates and never sort data rows globally" in {
    val df = Seq((Some(1L), Some(1L)), (None, Some(2L)), (Some(3L), None))
      .toDF("s", "id")
    GroupStats.globalRank(df, "s", "id").count() shouldBe 1L
    // plan pin: every row-level Window partitions by the value column —
    // the only single-partition window runs over histogram rows
    val big = (0L until 100L).map(i => (i % 5, i)).toDF("s", "id")
    val plan = GroupStats.globalRank(big, "s", "id")
      .queryExecution.executedPlan.toString
    withClue(plan) {
      plan should include ("row_number()")
      // the row_number window is keyed by the value column (first arg
      // of its windowspecdefinition), not a global no-partition spec
      plan should include regex "windowspecdefinition\\(s#\\d+L?, id#"
    }
  }
}
