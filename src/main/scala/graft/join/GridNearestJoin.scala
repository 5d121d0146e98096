package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GeoExpressions

/**
 * Nearest-neighbour join without broadcasting either side — the 100 TB
 * path for `nearest` (the broadcast kernel needs one side in every
 * executor's memory; this needs neither).
 *
 * Expanding-ring grid search, driven as an iterative DataFrame algorithm
 * (the same shape as Spark ML's iterative jobs):
 *
 *  1. both sides bin to grid cells (right: every cell its envelope
 *     overlaps; left: the cell of its envelope center — any geometry,
 *     not just points);
 *  2. round k joins the still-unresolved left rows against the right
 *     rows in the cells of Chebyshev ring k around each left cell and
 *     keeps the per-left minimum (distance, tie-break) candidate seen
 *     so far (candidates failing the optional `condition` never count);
 *  3. a left row resolves once its best distance is strictly below its
 *     per-row margin: the minimum degree distance from the row's own
 *     envelope to the boundary of the examined cell block. Any
 *     unexamined candidate lies entirely outside that block, hence at
 *     least margin away — the current best cannot be beaten. (Strict
 *     comparison: a candidate at exactly the margin could still win on
 *     tie-break, so such rows fall through to the next ring.)
 *  4. rows still unresolved after `maxRings` fall back to one full
 *     cross-cell pass (correct, never silently dropped). A left row whose
 *     envelope is wider than the largest examined cell block can never
 *     achieve a positive margin, so such rows skip the ring rounds and
 *     go straight to the fallback instead of being re-exploded and
 *     re-aggregated every round. The fallback also runs up front whenever
 *     `unresolved · |right|` is under `fallbackPairs` — at that size one
 *     exhaustive (broadcast-able) pass beats any number of fixed-cost
 *     ring jobs, which is exactly what a cost-based planner would pick;
 *     at genuinely large |right| the budget never triggers and the rings
 *     carry the work.
 *
 * Coordinate domain: WGS84 lon/lat, lon in [-180, 180], lat in [-90, 90].
 * Out-of-range coordinates are clamp-binned to the boundary cells (see
 * GeoExpressions.gridCells), which keeps the search correct for values
 * marginally outside the range (e.g. lon = 180.0000001 round-off) but is
 * undefined for genuinely non-geographic coordinate systems.
 *
 * Distance is the JTS coordinate-space (degree) distance — identical
 * ordering to the broadcast kernel. Ties break by `tieBreak` (default:
 * WKB bytes; the kernel breaks by broadcast row index; on continuous
 * data ties do not occur and the two strategies agree exactly — pinned
 * by spec).
 *
 * Each round materializes ONE snapshot via `materialize` (default: lazy
 * `localCheckpoint`) to cut the growing lineage; the per-round count
 * rides the same job as the materialization — one Spark job per round.
 * On a real cluster pass [[GridNearestJoin.ReliableMaterialize]]:
 * `localCheckpoint` blocks die with their executor, which would kill a
 * long iterative job on any executor loss; reliable `checkpoint`
 * (requires `sparkContext.setCheckpointDir`) survives it.
 *
 * @param left      side iterated (one output row per left row with any
 *                  right candidate passing `condition`). Right-side
 *                  columns ride through a min(struct(...)) aggregation,
 *                  so they must be orderable types (no map columns);
 *                  left-side columns ride a first() aggregate keyed by a
 *                  synthetic row id (any type)
 * @param right     candidate side, any geometry
 * @param condition optional extra predicate over both sides' columns;
 *                  a candidate pair failing it is skipped (the nearest
 *                  SATISFYING candidate wins — kernel semantics)
 * @param k         currently 1 (nearest); the structure generalizes to
 *                  top-k with min_by -> collect/top-k per group
 */
object GridNearestJoin {

  /** Session-local materializer: fast, but blocks die with executors. */
  val LocalMaterialize: DataFrame => DataFrame = _.localCheckpoint(false)

  /** Cluster-reliable materializer — survives executor loss; requires
    * `spark.sparkContext.setCheckpointDir(...)` to be set. */
  val ReliableMaterialize: DataFrame => DataFrame = _.checkpoint(false)

  /** Density-derived default cell size: one cheap (column-pruned,
    * map-side-combined) agg over the candidate side computes its
    * envelope-center extent, count, AND mean per-geometry envelope size,
    * and the cell is sized so a cell holds ~`targetRowsPerCell` rows —
    * the expanding-ring search then resolves typical rows in the first
    * round or two instead of burning rounds on near-empty cells (or
    * flooding dense ones). The mean geometry extent is a lower bound on
    * the cell: a non-point right side binned to cells finer than its
    * geometries would explode each geometry into (extent/cell)² bin
    * rows — the floor keeps the per-geometry fan-out O(1). Callers whose
    * data distribution is known can skip the extra job by passing an
    * explicit `cellDeg`. Degenerate sides (empty or a single geometry —
    * any cell works, the adaptive fallback resolves them in one pass)
    * get 1 degree; the result is clamped to [0.001, 45] degrees. */
  def autoCellDeg(right: DataFrame, rightWkb: Column,
      targetRowsPerCell: Double = 2.0): Double = {
    val e = GeoExpressions.stEnvelope(rightWkb)
    val cx = (element_at(e, 1) + element_at(e, 3)) / 2.0d
    val cy = (element_at(e, 2) + element_at(e, 4)) / 2.0d
    val row = right
      .agg(min(cx), max(cx), min(cy), max(cy), count(cx),
        avg(element_at(e, 3) - element_at(e, 1)),
        avg(element_at(e, 4) - element_at(e, 2)))
      .head()
    val n = row.getLong(4)
    if (n <= 1L || row.isNullAt(0)) 1.0
    else {
      val w = math.max(row.getDouble(1) - row.getDouble(0), 1e-6)
      val h = math.max(row.getDouble(3) - row.getDouble(2), 1e-6)
      val cells = math.max(1.0, n / math.max(targetRowsPerCell, 1e-3))
      val density = math.sqrt(w * h / cells)
      val meanExtent = math.max(row.getDouble(5), row.getDouble(6))
      math.min(45.0, math.max(1e-3, math.max(density, meanExtent)))
    }
  }

  def nearest(
      left: DataFrame, right: DataFrame,
      leftWkb: Column, rightWkb: Column,
      cellDeg: Double = 1.0,
      maxRings: Int = 8,
      tieBreak: Option[Column] = None,
      initialHorizon: Int = 2,
      fallbackBelow: Long = 2000L,
      maxHorizon: Int = 16,
      condition: Option[Column] = None,
      materialize: DataFrame => DataFrame = LocalMaterialize,
      fallbackPairs: Long = 32000000L): DataFrame = {

    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both sides have: ${dup.mkString(", ")}")

    val lw = "__g_lwkb"; val rw = "__g_rwkb"; val lid = "__g_lid"
    val cell = "__g_cell"; val dist = "__g_dist"; val best = "__g_best"
    val env = "__g_env"

    // right side binned once to every overlapped cell
    val r = right.withColumn(rw, rightWkb).where(col(rw).isNotNull)
      .withColumn(cell, explode(GeoExpressions.gridCells(col(rw), cellDeg)))

    // left side: unique row id (per-plan-deterministic) + envelope +
    // envelope-center cell; empty geometries have a null envelope and
    // drop (inner-join semantics)
    val maxC = lit(GeoExpressions.MaxCell.toLong)
    def axisCell(coord: Column, offset: Double): Column =
      least(maxC, greatest(lit(0L), floor((coord + lit(offset)) / cellDeg).cast("long")))
    val l0 = left.withColumn(lw, leftWkb).where(col(lw).isNotNull)
      .withColumn(env, GeoExpressions.stEnvelope(col(lw)))
      .where(col(env).isNotNull)
      .withColumn(lid, monotonically_increasing_id())
      .withColumn(cell,
        shiftleft(axisCell((element_at(col(env), 1) + element_at(col(env), 3)) / 2.0d, 180.0),
          GeoExpressions.CellBits)
          + axisCell((element_at(col(env), 2) + element_at(col(env), 4)) / 2.0d, 90.0))

    val leftCols = left.columns
    val rightCols = right.columns

    // distance + tie-break + right payload, minimized as one struct;
    // default tie-break = WKB bytes (deterministic; pass an explicit
    // unique orderable column to control tie order, e.g. a right-side key)
    val tb = tieBreak.getOrElse(col(rw).cast("string"))
    def candStruct: Column = struct(
      (col(dist) +: tb.as("__g_tb") +: rightCols.map(col)): _*)

    // a candidate only counts when present (left-outer ring-join misses
    // keep the left row alive) AND satisfying the extra condition
    val candOk: Column =
      condition.fold(col(rw).isNotNull)(c => col(rw).isNotNull && coalesce(c, lit(false)))

    // group by the synthetic row id ONLY and carry the left payload
    // through a first() aggregate (identical within a group, hence
    // deterministic) — no join-back needed, still one shuffle per round.
    // Grouping by the full payload instead forces SortAggregate to order
    // the entire candidate set by wide keys (WKB binary, the env double
    // array — which Spark wraps in an interpreted normalize-floats lambda
    // evaluated per row — and arbitrary user columns); a single long key
    // radix-sorts and the payload rides along untouched
    val lrowStruct = struct((cell +: lw +: env +: leftCols.toSeq).map(col): _*)
    def bestOf(cands: DataFrame): DataFrame =
      cands
        .withColumn(dist, GeoExpressions.stDistance(col(lw), col(rw)))
        .groupBy(col(lid))
        .agg(min(when(candOk, candStruct)).as("__g_best0"),
          first(lrowStruct).as("__g_lrow"))
        .select(col(lid), col("__g_best0"), col("__g_lrow.*"))

    // minimum degree distance from the row's envelope to the boundary of
    // the examined block (center cell ± hi); any unexamined candidate's
    // geometry lies entirely outside the block, so its distance is >= this.
    // The tiny guard absorbs IEEE rounding of the block-edge arithmetic —
    // the computed margin must never exceed the true clearance
    def marginOf(hi: Int): Column = {
      val cx = shiftright(col(cell), GeoExpressions.CellBits).cast("double")
      val cy = col(cell).bitwiseAND(maxC).cast("double")
      least(
        element_at(col(env), 1) - ((cx - hi) * cellDeg - 180.0d),
        ((cx + hi + 1) * cellDeg - 180.0d) - element_at(col(env), 3),
        element_at(col(env), 2) - ((cy - hi) * cellDeg - 90.0d),
        ((cy + hi + 1) * cellDeg - 90.0d) - element_at(col(env), 4)) - lit(cellDeg * 1e-9)
    }

    // annulus cell ids (lo < Chebyshev distance <= hi), codegen'd native
    // expression (GeoExpressions.RingCells): the previous literal (dx, dy)
    // offset-array + higher-order filter/transform form generated ~800
    // literals at hi=16, recompiled per round, and evaluated interpreted —
    // the Janino/interpretation overhead dominated every ring round
    def ringCells(lo: Int, hi: Int): Column =
      GeoExpressions.ringCells(col(cell), lo, hi)

    val out = new scala.collection.mutable.ArrayBuffer[DataFrame]
    // materialize the binned right side once — every round reuses it
    // (lazy: its blocks persist inside round 0's job)
    val rMat = materialize(r)
    // a left envelope spanning >= 2·(maxHorizon+1) cells on either axis
    // can never sit strictly inside any examined block, so its margin is
    // <= 0 at every horizon — ring rounds would re-explode and
    // re-aggregate it each round for nothing; route such rows straight
    // to the exhaustive fallback
    val maxSpan = 2.0 * (maxHorizon + 1) * cellDeg
    val hopelessPred =
      (element_at(col(env), 3) - element_at(col(env), 1) >= maxSpan) ||
        (element_at(col(env), 4) - element_at(col(env), 2) >= maxSpan)
    val l0m = materialize(l0)
    // one job: total + hopeless counts off the same snapshot scan
    val counts = l0m.agg(count(lit(1)), count(when(hopelessPred, lit(1)))).head()
    val hopelessN = counts.getLong(1)
    var unresolved = l0m.where(!hopelessPred)
    var unresolvedLeft = counts.getLong(0) - hopelessN
    // adaptive fallback: one exhaustive pass costs ~unresolved·|right|
    // candidate pairs in a single shuffle-free (broadcast-able right) job,
    // while every ring round costs a fixed job + snapshot. Below the pair
    // budget the exhaustive pass is the plan any cost-based engine would
    // pick; above it (any genuinely large right side) the rings carry the
    // work and the budget never triggers. The count is a column-pruned
    // scan — strictly cheaper than the ring path's bin-explode of the
    // same side — and lazy: when the loop never starts (few left rows,
    // budget disabled) the count job never runs. fallbackPairs = 0
    // disables the budget (spec-pinned ring coverage; fallbackBelow = 0
    // likewise forces rings).
    lazy val rightN =
      if (fallbackPairs <= 0L) Long.MaxValue
      else math.max(1L, right.withColumn(rw, rightWkb).where(col(rw).isNotNull).count())
    def ringsStillPay: Boolean =
      fallbackPairs <= 0L || unresolvedLeft > fallbackPairs / rightN
    var carried: DataFrame = null // (lid, best-so-far) for unresolved rows
    // merge this round's per-lid best with the carried best-so-far —
    // shared verbatim by the ring loop and the fallback so the two paths
    // can never diverge on null/merge semantics
    def mergeCarry(grouped: DataFrame): DataFrame =
      if (carried == null) grouped.withColumn(best, col("__g_best0"))
      else grouped.join(carried, Seq(lid), "left")
        .withColumn(best, least(col("__g_best0"), col("__g_carry")))
    // geometric search horizons: round j covers the annulus (H_{j-1}, H_j];
    // once few rows remain, the exhaustive fallback is cheaper than more
    // ring rounds (each round costs one Spark job)
    var lo = -1
    var hi = math.max(1, initialHorizon)
    var round = 0
    // hard horizon cap: annulus offset literals grow quadratically with
    // the horizon (a 512-cell horizon would mean ~800k-element literal
    // arrays and per-row explosions of the same size) — past maxHorizon
    // the exhaustive fallback is strictly cheaper
    val rProbe = rMat.withColumnRenamed(cell, "__g_probe")
    while (round <= maxRings && unresolvedLeft > fallbackBelow && ringsStillPay && hi <= maxHorizon) {
      val cands = unresolved
        .withColumn("__g_probe", explode(ringCells(lo, hi)))
        .join(rProbe, Seq("__g_probe"), "left_outer")
      // ONE materialization per round; the count below triggers it, so the
      // splits are cheap filters over the snapshot and no extra job runs
      val scored = materialize(mergeCarry(bestOf(cands)).drop("__g_best0", "__g_carry"))
      val margin = marginOf(hi)
      out += finalize(
        scored.where(col(best).isNotNull && col(best)(dist) < margin), leftCols, rightCols, best)
      unresolved = scored.where(col(best).isNull || col(best)(dist) >= margin)
        .select((leftCols.map(col) :+ col(lw) :+ col(env) :+ col(lid) :+ col(cell)): _*)
      carried = scored.where(col(best).isNotNull && col(best)(dist) >= margin)
        .select(col(lid), col(best).as("__g_carry"))
      unresolvedLeft = unresolved.count()
      if (sys.env.contains("GRAFT_DEBUG_RINGS")) {
        val nullBest = scored.where(col(best).isNull).count()
        val mFail = scored.where(col(best).isNotNull && col(best)(dist) >= margin).count()
        val mstats = scored.where(col(best).isNotNull)
          .agg(min(col(best)(dist)), max(col(best)(dist)), avg(col(best)(dist)), min(margin), max(margin)).head()
        println(s"[gnj] round=$round hi=$hi unresolved=$unresolvedLeft nullBest=$nullBest marginFail=$mFail dist=[${mstats.get(0)},${mstats.get(1)},avg=${mstats.get(2)}] margin=[${mstats.get(3)},${mstats.get(4)}] t=${System.nanoTime()/1e9}")
      }
      lo = hi
      hi = hi * 2
      round += 1
    }
    // the binned-right snapshot only feeds the ring rounds (every round's
    // result is itself a snapshot, and the fallback reads `right` raw) —
    // release its blocks before the fallback instead of holding them
    // until the result DataFrame is garbage-collected
    unpersistSnapshot(rMat)
    if (unresolvedLeft > 0 || hopelessN > 0) {
      // fallback: exhaustive pass for the stragglers (e.g. empty regions)
      // plus the rows routed around the ring rounds up front
      val stragglers =
        if (hopelessN == 0) unresolved
        else unresolved.unionByName(
          l0m.where(hopelessPred).select(unresolved.columns.map(col): _*))
      // the cross join keeps the left side's partitioning — which is ONE
      // partition when the left snapshot stems from a single-file scan;
      // spread the stragglers first or the whole exhaustive pass runs on
      // one core. Non-integer shuffle.partitions (e.g. "auto" on some
      // runtimes) degrades to the context's default parallelism.
      val shufflePartitions = scala.util.Try(
        left.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .getOrElse(left.sparkSession.sparkContext.defaultParallelism)
      val rightF = right.withColumn(rw, rightWkb).where(col(rw).isNotNull)
      // budget-entered fallback (the planner CHOSE the exhaustive pass
      // because unresolved·|right| fit the pair budget): rightN is already
      // counted — hint the broadcast explicitly when the right side is
      // genuinely broadcast-sized, so Spark plans BroadcastNestedLoopJoin
      // instead of a full CartesianProduct shuffle. On the exhaustion path
      // (rings ran out of horizon/rounds with the budget disabled) the
      // right side may be arbitrarily large: leave the strategy to Spark.
      val rightHinted =
        if (fallbackPairs > 0L && !ringsStillPay && rightN <= 4000000L) broadcast(rightF)
        else rightF
      val cands = stragglers.repartition(shufflePartitions).crossJoin(rightHinted)
      out += finalize(
        mergeCarry(bestOf(cands)).where(col(best).isNotNull), leftCols, rightCols, best)
    }
    if (out.isEmpty) finalizeSchemaOnly(left, right, leftCols, rightCols)
    else out.reduce(_ union _)
  }

  /** Release the storage behind a materialized snapshot. Safe only once
    * nothing downstream will read the snapshot again: for checkpoint-style
    * materializers the blocks ARE the data (lineage is truncated), so a
    * later read would fail rather than recompute. No-op for materializers
    * that don't produce an RDD-backed plan (e.g. identity). */
  private def unpersistSnapshot(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Empty result with the correct output schema (empty/null-geom input). */
  private def finalizeSchemaOnly(left: DataFrame, right: DataFrame,
      leftCols: Seq[String], rightCols: Seq[String]): DataFrame =
    left.limit(0).crossJoin(right.limit(0))
      .select((leftCols ++ rightCols).map(col): _*)

  private def finalize(df: DataFrame, leftCols: Seq[String], rightCols: Seq[String],
      best: String): DataFrame =
    df.select((leftCols.map(col) ++ rightCols.map(c => col(best)(c).as(c))): _*)
}
