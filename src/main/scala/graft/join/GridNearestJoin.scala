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
 *                 right candidate); left geometries must be points
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
      tieBreak: Option[Column] = None): DataFrame = {

    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both sides have: ${dup.mkString(", ")}")

    val lw = "__g_lwkb"; val rw = "__g_rwkb"; val lid = "__g_lid"
    val cell = "__g_cell"; val dist = "__g_dist"; val best = "__g_best"

    // right side binned once to every overlapped cell
    val r = right.withColumn(rw, rightWkb).where(col(rw).isNotNull)
      .withColumn(cell, explode(GeoExpressions.gridCells(col(rw), cellDeg)))

    // left side: unique row id (per-plan-deterministic) + center cell
    val l0 = left.withColumn(lw, leftWkb).where(col(lw).isNotNull)
      .withColumn(lid, monotonically_increasing_id())
      .withColumn(cell, element_at(GeoExpressions.gridCells(col(lw), cellDeg), 1))

    val leftCols = left.columns
    val rightCols = right.columns

    // distance + tie-break + right payload, minimized as one struct;
    // default tie-break = WKB bytes (deterministic; pass an explicit
    // unique orderable column to control tie order, e.g. a right-side key)
    val tb = tieBreak.getOrElse(col(rw).cast("string"))
    def candStruct: Column = struct(
      (col(dist) +: tb.as("__g_tb") +: rightCols.map(col)): _*)

    def bestOf(cands: DataFrame): DataFrame =
      cands
        .withColumn(dist, GeoExpressions.stDistance(col(lw), col(rw)))
        .groupBy(col(lid))
        .agg(min(candStruct).as(best))

    // ring-k cell ids via literal (dx, dy) offset arrays (Chebyshev ring);
    // out-of-bounds neighbours become null and are filtered
    def ringCells(k: Int): Column = {
      val offsets = for {
        dx <- -k to k; dy <- -k to k
        if math.max(math.abs(dx), math.abs(dy)) == k
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
    var unresolved = l0.localCheckpoint(true)
    var carried: DataFrame = null // (lid, best-so-far) for unresolved rows
    var k = 0
    while (k <= maxRings && !unresolved.isEmpty) {
      val cands = unresolved
        .withColumn("__g_probe", explode(ringCells(k)))
        .drop(cell).withColumnRenamed("__g_probe", cell)
        .join(r, cell)
      val roundBest0 = bestOf(cands)
      val roundBest =
        if (carried == null) roundBest0
        else carried.union(roundBest0).groupBy(col(lid)).agg(min(col(best)).as(best))
      // join best back to the (slim) unresolved left rows
      val scored = unresolved.join(roundBest, Seq(lid), "left")
      val bound = lit(k.toDouble * cellDeg)
      val resolvedNow = scored
        .where(col(best).isNotNull && col(best)(dist) <= bound)
      out += finalize(resolvedNow, leftCols, rightCols, best).localCheckpoint(true)
      unresolved = scored.where(col(best).isNull || col(best)(dist) > bound)
        .select((leftCols.map(col) :+ col(lw) :+ col(lid) :+ col(cell)): _*)
        .localCheckpoint(true)
      carried = scored.where(col(best).isNotNull && col(best)(dist) > bound)
        .select(col(lid), col(best)).localCheckpoint(true)
      k += 1
    }
    if (!unresolved.isEmpty) {
      // fallback: exhaustive pass for the stragglers (e.g. empty regions)
      val cands = unresolved.drop(cell).crossJoin(right
        .withColumn(rw, rightWkb).where(col(rw).isNotNull))
      val bestAll =
        if (carried == null) bestOf(cands)
        else carried.union(bestOf(cands)).groupBy(col(lid)).agg(min(col(best)).as(best))
      out += finalize(unresolved.join(bestAll, Seq(lid), "inner"), leftCols, rightCols, best)
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
