package graft.join

import org.apache.spark.sql.DataFrame
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark
import graft.transformer.BroadcastSpatialJoin

/** The grid (partitioned) join must produce exactly the broadcast
  * kernel's results for every non-nearest predicate — two physical
  * strategies, one semantics. */
class GridSpatialJoinSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "GridSpatialJoin via transformer broadcast=none"

  private def pts(n: Int, idPrefix: String): DataFrame = {
    // deterministic scatter over ~3 grid cells incl. cell-boundary crossers
    (0 until n).map { i =>
      (s"$idPrefix$i", (i * 37 % 300) / 100.0, (i * 53 % 300) / 100.0)
    }.toDF("id", "lon", "lat")
  }

  private def run(predicate: String, mode: String, dist: Boolean = false): Set[String] = {
    val input = pts(40, "i")
    val data = pts(25, "d").toDF("poi_id", "lon", "lat")
    data.createOrReplaceTempView(s"grid_poi_${predicate.takeWhile(_.isLetter)}_$mode")
    val t = new BroadcastSpatialJoin()
      .setDataset(s"grid_poi_${predicate.takeWhile(_.isLetter)}_$mode")
      .setDatasetPoint("lon, lat").setInputPoint("lon, lat")
      .setDataColumns("poi_id").setPredicate(predicate).setBroadcast(mode)
    val out = if (dist) t.setDistColAlias("dm") else t
    out.transform(input)
      .collect().map(r => r.mkString("|")).toSet
  }

  it should "match the broadcast kernel on withindist (+ distance column)" in {
    run("withindist 80000", "none", dist = true) shouldBe
      run("withindist 80000", "dataset", dist = true)
  }

  it should "spread a single-partition side when the other side broadcasts" in {
    // the degenerate mid-scale layout: a 1-partition (single small file)
    // left against a broadcastable right puts the ENTIRE explode->join->
    // refine pipeline on one core if the left keeps the scan layout (no
    // join-owned exchange exists in the broadcast regime). The guard
    // must repartition the scan-shaped left; measured 57 s -> 3 s on a
    // 42M-pair probe. Constructed with a 1-slice range, not coalesce(1):
    // Catalyst's Repartition(shuffle = false) IS a RepartitionOperation,
    // so a user coalesce reads as an explicit layout choice that the
    // guard deliberately leaves alone (see JoinLayout's scaladoc) — only
    // a genuine scan layout may be spread.
    import org.apache.spark.sql.functions._
    import graft.functions.GeoExpressions
    import graft.spatial.SpatialPredicate
    val left = spark.range(0, 2000, 1, 1) // ONE input partition
      .select(col("id").as("lid"),
        (col("id") % 50 / 20.0).as("llon"), (col("id") % 40 / 16.0).as("llat"))
    val right = (0 until 30).map(i => (s"R$i", (i % 6) * 0.5, (i / 6) * 0.5))
      .toDF("rid", "rlon", "rlat")
    val out = GridSpatialJoin.join(
      left, right,
      GeoExpressions.wkbPoint(col("llon"), col("llat")),
      GeoExpressions.wkbPoint(col("rlon"), col("rlat")),
      SpatialPredicate.WithinDist(40000), cellDeg = 1.0)
    out.count() should be > 0L
    // the executed probe side must run wider than the 1-partition scan
    out.rdd.getNumPartitions should be > 1
  }

  it should "match the broadcast kernel on withindist with a condition" in {
    val input = pts(40, "i")
    val data = pts(25, "d").toDF("poi_id", "lon", "lat")
    data.createOrReplaceTempView("grid_poi_cond")
    def go(mode: String) = new BroadcastSpatialJoin()
      .setDataset("grid_poi_cond")
      .setDatasetPoint("lon, lat").setInputPoint("lon, lat")
      .setDataColumns("poi_id").setPredicate("withindist 120000")
      .setJoinCondition("right.poi_id != left.id").setBroadcast(mode)
      .transform(input).collect().map(_.mkString("|")).toSet
    go("none") shouldBe go("dataset")
  }

  it should "match the broadcast kernel on polygon predicates" in {
    val input = pts(40, "i")
    // WKT triangles around each point
    val data = pts(25, "d").toDF("poi_id", "lon", "lat").selectExpr("poi_id",
      "concat('POLYGON((', lon-0.4, ' ', lat-0.3, ',', lon+0.4, ' ', lat-0.3, ',', lon, ' ', lat+0.4, ',', lon-0.4, ' ', lat-0.3, '))') as wkt")
    data.createOrReplaceTempView("grid_poi_poly")
    def go(mode: String, pred: String) = new BroadcastSpatialJoin()
      .setDataset("grid_poi_poly")
      .setDatasetWKT("wkt").setInputPoint("lon, lat")
      .setDataColumns("poi_id").setPredicate(pred).setBroadcast(mode)
      .transform(input).collect().map(_.mkString("|")).toSet
    // point within polygon (iterated = input under broadcast=dataset)
    go("none", "within") shouldBe go("dataset", "within")
    go("none", "within").nonEmpty shouldBe true
    go("none", "intersects") shouldBe go("dataset", "intersects")
  }

  it should "match the broadcast kernel on nearest (expanding-ring grid search)" in {
    val input = pts(60, "i")
    val data = pts(30, "d").toDF("poi_id", "lon", "lat")
    data.createOrReplaceTempView("grid_poi_nearest")
    def go(mode: String) = new BroadcastSpatialJoin().setDataset("grid_poi_nearest")
      .setDatasetPoint("lon, lat").setInputPoint("lon, lat")
      .setDataColumns("poi_id").setPredicate("nearest").setBroadcast(mode)
      .transform(input).collect().map(_.mkString("|")).toSet
    val grid = go("none")
    grid should have size 60
    grid shouldBe go("dataset")
  }

  it should "resolve through ring rounds when fallback is disabled" in {
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    val input = pts(80, "i")
    val data = pts(40, "d").toDF("poi_id", "plon", "plat")
    val grid = GridNearestJoin.nearest(
      input, data,
      GeoExpressions.wkbPoint(col("lon"), col("lat")),
      GeoExpressions.wkbPoint(col("plon"), col("plat")),
      cellDeg = 0.5, tieBreak = Some(col("poi_id")),
      initialHorizon = 1, fallbackBelow = 0L, fallbackPairs = 0L)
      .select("id", "poi_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // brute-force argmin as oracle
    val brute = input.crossJoin(data)
      .withColumn("d2", (col("lon") - col("plon")) * (col("lon") - col("plon"))
        + (col("lat") - col("plat")) * (col("lat") - col("plat")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("d2"), col("poi_id"))))
      .where(col("rn") === 1)
      .select("id", "poi_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
    grid shouldBe brute
  }

  it should "equal brute force under randomized data and kernel configs" in {
    // seeded-random scatter (clusters + uniform noise + empty regions) x
    // config grid covering all three execution regimes: rings only,
    // fallback only, and the adaptive mix — every combination must equal
    // the brute-force argmin exactly
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    for (seed <- Seq(1, 2)) {
      val rnd = new scala.util.Random(seed)
      def scatter(n: Int, p: String) = (0 until n).map { i =>
        val clustered = i % 3 != 0
        val (cx, cy) = if (clustered) (10.0 * (i % 4), 5.0 * (i % 3)) else (0.0, 0.0)
        (s"$p$i",
          cx + rnd.nextDouble() * (if (clustered) 0.8 else 60.0) - 10.0,
          cy + rnd.nextDouble() * (if (clustered) 0.8 else 30.0) - 5.0)
      }.toDF(if (p == "d") "poi_id" else "id",
        if (p == "d") "plon" else "lon", if (p == "d") "plat" else "lat")
      val input = scatter(150, "i")
      val data = scatter(60, "d")
      val brute = input.crossJoin(data)
        .withColumn("d2", (col("lon") - col("plon")) * (col("lon") - col("plon"))
          + (col("lat") - col("plat")) * (col("lat") - col("plat")))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("id")
            .orderBy(col("d2"), col("poi_id"))))
        .where(col("rn") === 1)
        .select("id", "poi_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
      val configs = Seq(
        (0.5, 1, 0L, 0L),                  // rings only, tiny cells
        (4.0, 2, 0L, 0L),                  // rings only, coarse cells
        (1.0, 2, Long.MaxValue, 0L),       // immediate fallbackBelow path
        (1.0, 2, 0L, Long.MaxValue),       // immediate fallbackPairs budget path
        (2.0, 1, 20L, 1000L))              // adaptive mix
      for ((cd, ih, fb, fp) <- configs) {
        val got = GridNearestJoin.nearest(
          input, data,
          GeoExpressions.wkbPoint(col("lon"), col("lat")),
          GeoExpressions.wkbPoint(col("plon"), col("plat")),
          cellDeg = cd, tieBreak = Some(col("poi_id")),
          initialHorizon = ih, fallbackBelow = fb, fallbackPairs = fp)
          .select("id", "poi_id").collect().map(r => (r.getString(0), r.getString(1))).toSet
        withClue(s"seed=$seed cellDeg=$cd ih=$ih fb=$fb fp=$fp: ") {
          got shouldBe brute
        }
      }
    }
  }

  it should "equal brute-force top-k under all three kernel regimes (knearest)" in {
    // k = 3 through rings-only, fallback-only, and the adaptive mix —
    // ranked rows must equal the brute-force row_number() <= 3 exactly,
    // including ranks
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    val rnd = new scala.util.Random(5)
    def scatter(n: Int, p: String) = (0 until n).map { i =>
      val clustered = i % 3 != 0
      val (cx, cy) = if (clustered) (10.0 * (i % 4), 5.0 * (i % 3)) else (0.0, 0.0)
      (s"$p$i",
        cx + rnd.nextDouble() * (if (clustered) 0.8 else 60.0) - 10.0,
        cy + rnd.nextDouble() * (if (clustered) 0.8 else 30.0) - 5.0)
    }.toDF(if (p == "d") "poi_id" else "id",
      if (p == "d") "plon" else "lon", if (p == "d") "plat" else "lat")
    val input = scatter(120, "i")
    val data = scatter(50, "d")
    val brute = input.crossJoin(data)
      .withColumn("d2", (col("lon") - col("plon")) * (col("lon") - col("plon"))
        + (col("lat") - col("plat")) * (col("lat") - col("plat")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("d2"), col("poi_id"))))
      .where(col("rn") <= 3)
      .select("id", "poi_id", "rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2).toLong)).toSet
    val configs = Seq(
      (0.5, 1, 0L, 0L),                  // rings only
      (1.0, 2, Long.MaxValue, 0L),       // immediate fallbackBelow path
      (1.0, 2, 0L, Long.MaxValue),       // immediate fallbackPairs budget path
      (2.0, 1, 20L, 1000L))              // adaptive mix
    for ((cd, ih, fb, fp) <- configs) {
      val got = GridNearestJoin.knearest(
        input, data,
        GeoExpressions.wkbPoint(col("lon"), col("lat")),
        GeoExpressions.wkbPoint(col("plon"), col("plat")),
        k = 3, cellDeg = cd, tieBreak = Some(col("poi_id")),
        initialHorizon = ih, fallbackBelow = fb, fallbackPairs = fp)
        .select("id", "poi_id", "knn_rank")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      withClue(s"cellDeg=$cd ih=$ih fb=$fb fp=$fp: ") {
        got shouldBe brute
      }
    }
  }

  it should "apply the extra condition inside kNN ranking (nearest-satisfying, k > 1)" in {
    // kNN + condition: the k ranked rows per input must be the k nearest
    // rows SATISFYING the condition (candidates failing it never consume
    // a rank) — the guarded when(cond, struct) aggregate shape, covering
    // the quick-reject's guard-first path. Ring and fallback regimes
    // must agree with the filtered brute force exactly, rank for rank.
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    val rnd = new scala.util.Random(11)
    val input = (0 until 80).map(i =>
      (s"i$i", rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 20 - 10, i % 3))
      .toDF("id", "lon", "lat", "grp")
    val data = (0 until 40).map(i =>
      (s"d$i", rnd.nextDouble() * 40 - 20, rnd.nextDouble() * 20 - 10, i % 3))
      .toDF("poi_id", "plon", "plat", "pgrp")
    val brute = input.crossJoin(data)
      .where(col("grp") =!= col("pgrp"))
      .withColumn("d2", (col("lon") - col("plon")) * (col("lon") - col("plon"))
        + (col("lat") - col("plat")) * (col("lat") - col("plat")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("d2"), col("poi_id"))))
      .where(col("rn") <= 2)
      .select("id", "poi_id", "rn")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2).toLong)).toSet
    for ((fb, fp) <- Seq((0L, 0L), (Long.MaxValue, 0L))) { // rings-only, fallback-only
      val got = GridNearestJoin.knearest(
        input, data,
        GeoExpressions.wkbPoint(col("lon"), col("lat")),
        GeoExpressions.wkbPoint(col("plon"), col("plat")),
        k = 2, cellDeg = 2.0, tieBreak = Some(col("poi_id")),
        condition = Some(col("grp") =!= col("pgrp")),
        fallbackBelow = fb, fallbackPairs = fp)
        .select("id", "poi_id", "knn_rank")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      withClue(s"fallbackBelow=$fb fallbackPairs=$fp: ") { got shouldBe brute }
    }
  }

  it should "expose kNN through the transformer (gridKnn param)" in {
    import org.apache.spark.sql.functions.col
    val input = pts(30, "i")
    val data = pts(12, "d").toDF("poi_id", "plon", "plat")
      .withColumnsRenamed(Map("plon" -> "lon", "plat" -> "lat"))
    data.createOrReplaceTempView("grid_knn_poi")
    val t = new BroadcastSpatialJoin()
      .setDataset("grid_knn_poi").setDatasetPoint("lon, lat").setInputPoint("lon, lat")
      .setDataColumns("poi_id").setPredicate("nearest").setBroadcast("none")
      .setGridKnn("3")
    // static schema carries the trailing knn_rank long
    t.transformSchema(input.schema).fieldNames.last shouldBe "knn_rank"
    val got = t.transform(input)
      .select("id", "poi_id", "knn_rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // order by sqrt(d2), not d2: the engine compares JTS distances
    // (= sqrt doubles), and two d2 values differing in the last ulp can
    // collapse to the SAME sqrt — a tie the engine then breaks by key
    val brute = input.crossJoin(data.toDF("poi_id", "plon", "plat"))
      .withColumn("d2", (col("lon") - col("plon")) * (col("lon") - col("plon"))
        + (col("lat") - col("plat")) * (col("lat") - col("plat")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(org.apache.spark.sql.functions.sqrt(col("d2")), col("poi_id"))))
      .where(col("rn") <= 3)
      .collect().map(r => (r.getAs[String]("id"), r.getAs[String]("poi_id"),
        r.getAs[Int]("rn").toLong)).toSet
    got shouldBe brute
    // invalid combos fail fast
    intercept[IllegalArgumentException] {
      new BroadcastSpatialJoin().setDataset("grid_knn_poi")
        .setDatasetPoint("lon, lat").setInputPoint("lon, lat")
        .setDataColumns("poi_id").setPredicate("nearest")
        .setBroadcast("input").setGridKnn("3").transform(input)
    }
    intercept[IllegalArgumentException] {
      new BroadcastSpatialJoin().setDataset("grid_knn_poi")
        .setDatasetPoint("lon, lat").setInputPoint("lon, lat")
        .setDataColumns("poi_id").setPredicate("intersects")
        .setBroadcast("none").setGridKnn("3").transform(input)
    }
  }

  it should "broadcast the right side when the pair budget picks the exhaustive pass" in {
    // budget-entered fallback with a broadcast-sized right side must plan
    // BroadcastNestedLoopJoin, not a CartesianProduct shuffle — the
    // budgetStopped + stats.sizeInBytes gate (review finding, round 4)
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    val input = pts(200, "i")
    val data = pts(40, "d").toDF("poi_id", "plon", "plat")
    val out = GridNearestJoin.nearest(
      input, data,
      GeoExpressions.wkbPoint(col("lon"), col("lat")),
      GeoExpressions.wkbPoint(col("plon"), col("plat")),
      cellDeg = 1.0, tieBreak = Some(col("poi_id")),
      fallbackBelow = 0L, fallbackPairs = Long.MaxValue) // budget always wins
    out.count() shouldBe 200
    val plan = out.queryExecution.executedPlan.toString
    withClue(plan.linesIterator.filter(_.contains("Join")).mkString("\n")) {
      plan should include("BroadcastNestedLoopJoin")
      plan should not include "CartesianProduct"
    }
  }

  it should "emit all available ranked rows when the right side has fewer than k" in {
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    val input = pts(5, "i")
    val data = pts(2, "d").toDF("poi_id", "plon", "plat")
    val got = GridNearestJoin.knearest(
      input, data,
      GeoExpressions.wkbPoint(col("lon"), col("lat")),
      GeoExpressions.wkbPoint(col("plon"), col("plat")),
      k = 3, cellDeg = 1.0, tieBreak = Some(col("poi_id")))
      .select("id", "poi_id", "knn_rank").collect()
    got.length shouldBe 10 // 5 left rows x only 2 candidates each
    got.map(_.getLong(2)).toSet shouldBe Set(1L, 2L)
  }

  it should "floor the derived cell size at the mean geometry extent" in {
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    // 100 polygons ~0.5 deg wide whose centers cluster within ~0.1 deg:
    // center density alone would derive a ~0.01-deg cell and explode
    // every polygon into ~2500 bin rows; the mean-extent floor keeps the
    // per-geometry fan-out O(1)
    val polys = (0 until 100).map { i =>
      val x = (i % 10) * 0.01; val y = (i / 10) * 0.01
      (s"p$i", s"POLYGON(($x $y,${x + 0.5} $y,${x + 0.5} ${y + 0.5},$x ${y + 0.5},$x $y))")
    }.toDF("id", "wkt")
    val cell = GridNearestJoin.autoCellDeg(polys, GeoExpressions.wkbFromWkt(col("wkt")))
    cell should be >= 0.5
    // point data is unaffected: density continues to drive the size
    val pointsDf = pts(100, "q")
    val pcell = GridNearestJoin.autoCellDeg(pointsDf,
      GeoExpressions.wkbPoint(col("lon"), col("lat")))
    pcell should be < 0.5
    // degenerate sides: empty and single-geometry both get 1 degree
    GridNearestJoin.autoCellDeg(polys.limit(0),
      GeoExpressions.wkbFromWkt(col("wkt"))) shouldBe 1.0
    GridNearestJoin.autoCellDeg(polys.limit(1),
      GeoExpressions.wkbFromWkt(col("wkt"))) shouldBe 1.0
  }

  it should "match the broadcast kernel on nearest with an extra condition" in {
    val input = pts(60, "i")
    val data = pts(30, "d").toDF("poi_id", "lon", "lat")
    data.createOrReplaceTempView("grid_poi_nearest_cond")
    // the condition diverts some rows from their unconditioned nearest:
    // the nearest SATISFYING candidate must win in both strategies
    def go(mode: String) = new BroadcastSpatialJoin().setDataset("grid_poi_nearest_cond")
      .setDatasetPoint("lon, lat").setInputPoint("lon, lat")
      .setDataColumns("poi_id").setPredicate("nearest").setBroadcast(mode)
      .setJoinCondition("substring(right.poi_id, 2) != substring(left.id, 2)")
      .transform(input).collect().map(_.mkString("|")).toSet
    val grid = go("none")
    grid should have size 60
    grid shouldBe go("dataset")
  }

  it should "match the broadcast kernel on nearest with polygon (WKT) input" in {
    // non-point left rows: envelope-center binning + per-row margin
    val input = pts(40, "i").selectExpr("id",
      "concat('POLYGON((', lon-0.3, ' ', lat-0.2, ',', lon+0.3, ' ', lat-0.2, ',', lon, ' ', lat+0.3, ',', lon-0.3, ' ', lat-0.2, '))') as wkt")
    val data = pts(25, "d").toDF("poi_id", "lon", "lat")
    data.createOrReplaceTempView("grid_poi_nearest_wkt")
    def go(mode: String) = new BroadcastSpatialJoin().setDataset("grid_poi_nearest_wkt")
      .setDatasetPoint("lon, lat").setInputWKT("wkt")
      .setDataColumns("poi_id").setPredicate("nearest").setBroadcast(mode)
      .transform(input).collect().map(_.mkString("|")).toSet
    val grid = go("none")
    grid should have size 40
    grid shouldBe go("dataset")
  }

  it should "run one Spark job per ring round (count rides the materialization)" in {
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    val sc = spark.sparkContext
    // AQE splits one action into a job per shuffle stage — disable it so
    // jobs == actions and the count is meaningful; auto-broadcast off so
    // no planner-version-dependent broadcast-exchange collect jobs ride
    // along (the bound then counts only the loop's own actions)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val input = pts(50, "i")
      val data = pts(30, "d").toDF("poi_id", "plon", "plat")
      sc.setJobGroup("gnj-jobs", "grid nearest job count", interruptOnCancel = false)
      val out = GridNearestJoin.nearest(
        input, data,
        GeoExpressions.wkbPoint(col("lon"), col("lat")),
        GeoExpressions.wkbPoint(col("plon"), col("plat")),
        // one big cell: every row resolves in round 1, no fallback
        cellDeg = 10.0, tieBreak = Some(col("poi_id")),
        initialHorizon = 1, fallbackBelow = 0L, fallbackPairs = 0L)
      out.count() shouldBe 50
      sc.clearJobGroup()
      val jobs = sc.statusTracker.getJobIdsForGroup("gnj-jobs").length
      // init agg (materializes left) + round-1 count (materializes the
      // ring snapshot AND the binned right side) + the final count action
      // (+1 slack for scheduler-internal jobs). The pre-fix loop cost
      // 2 jobs/round + 2 eager init jobs (>= 6 here)
      jobs should be <= 4
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", abt)
    }
  }

  it should "split a pathologically hot cell via AQE skew-join" in {
    // the one untested scale scenario of the cell equi-join: EVERY right
    // row in one grid cell (a mega-city candidate table) joined by many
    // left rows in the same cell — one join key owns the whole shuffle.
    // At 100 TB neither side broadcasts, so pin that with broadcast off,
    // AQE's OptimizeSkewedJoin splits the hot key's partition into
    // mapper-range chunks (replicating the other side) instead of
    // running one giant task, and the results stay exact.
    import org.apache.spark.sql.functions.col
    import graft.functions.GeoExpressions
    import graft.spatial.SpatialPredicate
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // toy-size the skew thresholds (defaults are 256 MB / 64 MB)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      // all coordinates inside ONE 1-degree cell; left rows padded so the
      // hot partition clears the (lowered) byte thresholds
      val left = (0 until 3000).map { i =>
        (s"L$i", 0.1 + (i % 50) * 0.015, 0.1 + (i / 50) * 0.012, "x" * 200)
      }.toDF("lid", "llon", "llat", "pad")
      val right = (0 until 120).map { i =>
        (s"R$i", 0.15 + (i % 12) * 0.06, 0.15 + (i / 12) * 0.07)
      }.toDF("rid", "rlon", "rlat")
      val out = GridSpatialJoin.join(
        left, right,
        GeoExpressions.wkbPoint(col("llon"), col("llat")),
        GeoExpressions.wkbPoint(col("rlon"), col("rlat")),
        SpatialPredicate.WithinDist(30000), cellDeg = 1.0)
        .select("lid", "rid")
      val rows = out.collect()
      // exactness first: equals the brute-force refine
      val brute = left.crossJoin(right)
        .where(GeoExpressions.geodesicMeters(
          GeoExpressions.wkbPoint(col("llon"), col("llat")),
          GeoExpressions.wkbPoint(col("rlon"), col("rlat"))) <= 30000)
        .select("lid", "rid").collect()
      rows.map(r => (r.getString(0), r.getString(1))).toSet shouldBe
        brute.map(r => (r.getString(0), r.getString(1))).toSet
      rows.length should be > 0
      // and the executed plan must show the skew split engaged
      val plan = out.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.filter(_.contains("Join")).mkString("\n")) {
        plan should include("skew=true")
      }
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  it should "fall back to an exhaustive pass for isolated points" in {
    import spark.implicits._
    // one candidate very far away: every ring misses, fallback must find it
    val input = Seq(("i0", 0.5, 0.5), ("i1", 1.5, 1.5)).toDF("id", "lon", "lat")
    val data = Seq(("far", 55.0, 40.0)).toDF("poi_id", "plon", "plat")
    data.createOrReplaceTempView("grid_poi_far")
    val out = new BroadcastSpatialJoin().setDataset("grid_poi_far")
      .setDatasetPoint("plon, plat").setInputPoint("lon, lat")
      .setDataColumns("poi_id").setPredicate("nearest").setBroadcast("none")
      .transform(input)
    out.select("id", "poi_id").collect().map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("i0", "far"), ("i1", "far"))
  }
}
