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
 *     overlaps; left: its center cell);
 *  2. round k joins the still-unresolved left rows against the right
 *     rows in the cells of Chebyshev ring k around each left cell and
 *     keeps the per-left minimum (distance, tie-break) candidate seen
 *     so far;
 *  3. a left row resolves once its best distance is <= k · cellDeg: any
 *     candidate beyond ring k sits at least that far away, so the
 *     current best cannot be beaten (left geometries are points, which
 *     makes this bound exact);
 *  4. rows still unresolved after `maxRings` fall back to one full
 *     cross-cell pass (correct, never silently dropped).
 *
 * Distance is the JTS coordinate-space (degree) distance — identical
 * ordering to the broadcast kernel. Ties break by WKB bytes (the kernel
 * breaks by broadcast row index; on continuous data ties do not occur
 * and the two strategies agree exactly — pinned by spec).
 *
 * Each round materializes its resolved rows via `localCheckpoint` to cut
 * the growing lineage; rounds shrink geometrically since most rows
 * resolve in ring 0-2 when `cellDeg` is near the typical NN distance.
 *
 * @param left     side iterated (one output row per left row with any
 *                 right candidate); left geometries must be points.
 *                 Right-side columns ride through a min(struct(...))
 *                 aggregation and left-side columns through a groupBy, so
 *                 both sides' columns must be orderable/groupable types
 *                 (no map columns)
 * @param right    candidate side, any geometry
 * @param k        currently 1 (nearest); the structure generalizes to
 *                 top-k with min_by -> collect/top-k per group
 */
object GridNearestJoin {

  def nearest(
      left: DataFrame, right: DataFrame,
      leftWkb: Column, rightWkb: Column,
      cellDeg: Double = 1.0,
      maxRings: Int = 8,
      tieBreak: Option[Column] = None,
      initialHorizon: Int = 2,
      fallbackBelow: Long = 2000L,
      maxHorizon: Int = 16): DataFrame = {

    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both sides have: ${dup.mkString(", ")}")

    val lw = "__g_lwkb"; val rw = "__g_rwkb"; val lid = "__g_lid"
    val cell = "__g_cell"; val dist = "__g_dist"; val best = "__g_best"

    // right side binned once to every overlapped cell
    val r = right.withColumn(rw, rightWkb).where(col(rw).isNotNull)
      .withColumn(cell, explode(GeoExpressions.gridCells(col(rw), cellDeg)))

    // left side: unique row id (per-plan-deterministic) + center cell;
    // empty geometries bin to no cell and drop (inner-join semantics —
    // element_at on the empty array would throw under ANSI mode)
    val l0 = left.withColumn(lw, leftWkb).where(col(lw).isNotNull)
      .withColumn("__g_cells", GeoExpressions.gridCells(col(lw), cellDeg))
      .where(size(col("__g_cells")) > 0)
      .withColumn(lid, monotonically_increasing_id())
      .withColumn(cell, element_at(col("__g_cells"), 1))
      .drop("__g_cells")

    val leftCols = left.columns
    val rightCols = right.columns

    // distance + tie-break + right payload, minimized as one struct;
    // default tie-break = WKB bytes (deterministic; pass an explicit
    // unique orderable column to control tie order, e.g. a right-side key)
    val tb = tieBreak.getOrElse(col(rw).cast("string"))
    def candStruct: Column = struct(
      (col(dist) +: tb.as("__g_tb") +: rightCols.map(col)): _*)

    // group by the full left payload (lid + carried columns): the
    // per-round aggregation then needs NO join-back to recover left rows —
    // one shuffle per round instead of two. Null right rows (left-outer
    // ring join misses) contribute no candidate but keep the left row.
    val groupKeys = (lid +: cell +: lw +: leftCols.toSeq).map(col)
    def bestOf(cands: DataFrame): DataFrame =
      cands
        .withColumn(dist, GeoExpressions.stDistance(col(lw), col(rw)))
        .groupBy(groupKeys: _*)
        .agg(min(when(col(rw).isNotNull, candStruct)).as("__g_best0"))

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
      val maxC = lit(GeoExpressions.MaxCell.toLong)
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
    val rMat = r.localCheckpoint(true)
    var unresolved = l0.localCheckpoint(true)
    var unresolvedLeft = unresolved.count()
    var carried: DataFrame = null // (lid, best-so-far) for unresolved rows
    // geometric search horizons: round j covers the annulus (H_{j-1}, H_j];
    // once few rows remain, the exhaustive fallback is cheaper than more
    // ring rounds (each round costs a handful of Spark jobs)
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
      // ONE materialization per round; the splits below are cheap filters
      // over the checkpointed snapshot
      val scored = withCarry.drop("__g_best0", "__g_carry").localCheckpoint(true)
      val bound = lit(hi.toDouble * cellDeg)
      out += finalize(
        scored.where(col(best).isNotNull && col(best)(dist) <= bound), leftCols, rightCols, best)
      unresolved = scored.where(col(best).isNull || col(best)(dist) > bound)
        .select((leftCols.map(col) :+ col(lw) :+ col(lid) :+ col(cell)): _*)
      carried = scored.where(col(best).isNotNull && col(best)(dist) > bound)
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
