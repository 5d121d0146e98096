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
 *     cross-cell pass (correct, never silently dropped).
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
 *                  columns ride through a min(struct(...)) aggregation
 *                  and left-side columns through a groupBy, so both
 *                  sides' columns must be orderable/groupable types
 *                  (no map columns)
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
      materialize: DataFrame => DataFrame = LocalMaterialize): DataFrame = {

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

    // group by the full left payload (lid + carried columns): the
    // per-round aggregation then needs NO join-back to recover left rows —
    // one shuffle per round instead of two
    val groupKeys = (lid +: cell +: lw +: env +: leftCols.toSeq).map(col)
    def bestOf(cands: DataFrame): DataFrame =
      cands
        .withColumn(dist, GeoExpressions.stDistance(col(lw), col(rw)))
        .groupBy(groupKeys: _*)
        .agg(min(when(candOk, candStruct)).as("__g_best0"))

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

    // annulus cell ids (lo < Chebyshev distance <= hi) via literal
    // (dx, dy) offset arrays; out-of-bounds neighbours → null, filtered
    def ringCells(lo: Int, hi: Int): Column = {
      val offsets = for {
        dx <- -hi to hi; dy <- -hi to hi
        cheb = math.max(math.abs(dx), math.abs(dy))
        if cheb > lo && cheb <= hi
      } yield (dx, dy)
      val dxs = array(offsets.map(o => lit(o._1.toLong)): _*)
      val dys = array(offsets.map(o => lit(o._2.toLong)): _*)
      val cx = shiftright(col(cell), GeoExpressions.CellBits)
      val cy = col(cell).bitwiseAND(lit(GeoExpressions.MaxCell.toLong))
      filter(
        transform(sequence(lit(1), lit(offsets.size)), i => {
          val ncx = cx + element_at(dxs, i)
          val ncy = cy + element_at(dys, i)
          when(ncx >= 0 && ncx <= maxC && ncy >= 0 && ncy <= maxC,
            shiftleft(ncx, GeoExpressions.CellBits) + ncy)
        }),
        c => c.isNotNull)
    }

    val out = new scala.collection.mutable.ArrayBuffer[DataFrame]
    // materialize the binned right side once — every round reuses it
    // (lazy: its blocks persist inside round 0's job)
    val rMat = materialize(r)
    var unresolved = materialize(l0)
    var unresolvedLeft = unresolved.count()
    var carried: DataFrame = null // (lid, best-so-far) for unresolved rows
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
    while (round <= maxRings && unresolvedLeft > fallbackBelow && hi <= maxHorizon) {
      val cands = unresolved
        .withColumn("__g_probe", explode(ringCells(lo, hi)))
        .join(rProbe, Seq("__g_probe"), "left_outer")
      val grouped = bestOf(cands)
      val withCarry =
        if (carried == null) grouped.withColumn(best, col("__g_best0"))
        else grouped.join(carried, Seq(lid), "left")
          .withColumn(best, least(col("__g_best0"), col("__g_carry")))
      // ONE materialization per round; the count below triggers it, so the
      // splits are cheap filters over the snapshot and no extra job runs
      val scored = materialize(withCarry.drop("__g_best0", "__g_carry"))
      val margin = marginOf(hi)
      out += finalize(
        scored.where(col(best).isNotNull && col(best)(dist) < margin), leftCols, rightCols, best)
      unresolved = scored.where(col(best).isNull || col(best)(dist) >= margin)
        .select((leftCols.map(col) :+ col(lw) :+ col(env) :+ col(lid) :+ col(cell)): _*)
      carried = scored.where(col(best).isNotNull && col(best)(dist) >= margin)
        .select(col(lid), col(best).as("__g_carry"))
      unresolvedLeft = unresolved.count()
      lo = hi
      hi = hi * 2
      round += 1
    }
    if (unresolvedLeft > 0) {
      // fallback: exhaustive pass for the stragglers (e.g. empty regions)
      val cands = unresolved.crossJoin(right
        .withColumn(rw, rightWkb).where(col(rw).isNotNull))
      val grouped = bestOf(cands)
      val withCarry =
        if (carried == null) grouped.withColumn(best, col("__g_best0"))
        else grouped.join(carried, Seq(lid), "left")
          .withColumn(best, least(col("__g_best0"), col("__g_carry")))
      out += finalize(withCarry.where(col(best).isNotNull), leftCols, rightCols, best)
    }
    if (out.isEmpty) finalizeSchemaOnly(left, right, leftCols, rightCols)
    else out.reduce(_ union _)
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
