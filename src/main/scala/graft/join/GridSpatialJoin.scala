package graft.join

import scala.util.Try

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, RepartitionOperation, Sort, Window}
import org.apache.spark.sql.functions._

import graft.functions.GeoExpressions
import graft.spatial.SpatialPredicate

/**
 * Partitioned grid spatial join — the 100 TB path. Neither side is
 * collected or broadcast; the join is a plain shuffle equi-join on grid
 * cell ids inside one Catalyst plan (AQE, spill, skew handling all apply).
 *
 * Algorithm (PBSM-style):
 *  1. geometry lifts once per row into a WKB `BinaryType` column
 *     (graft.functions.GeoExpressions, all codegen'd);
 *  2. each row explodes to the grid cells its envelope overlaps — the
 *     left side's envelope is first expanded by the withindist radius
 *     (latitude-aware, strictly over-approximating);
 *  3. shuffle equi-join on the cell id;
 *  4. duplicate elimination by the reference-point rule: a candidate pair
 *     is kept only in the single cell containing the componentwise max of
 *     the two envelope minima — no global distinct needed;
 *  5. exact refine: JTS relation or geodesic distance <= radius.
 *
 * Cost: O(|L| + |R|) shuffle volume (times the small cell fan-out) and
 * per-cell local work — versus the broadcast kernel's requirement that one
 * side fit in every executor. Pick `cellDeg` so a cell's rows fit a task:
 * smaller cells → more fan-out rows but tighter candidate sets.
 *
 * `nearest` is not expressible as one cell-local pass (a point's nearest
 * neighbour may sit in a far cell); it is served by the expanding-ring
 * search in [[GridNearestJoin]] — the transformer's broadcast="none"
 * nearest mode routes there automatically.
 */
object GridSpatialJoin {

  /**
   * @param left         left (iterated-semantics) side
   * @param right        right side; `predicate` evaluates `left op right`
   * @param leftWkb      WKB geometry column for `left` rows
   * @param rightWkb     WKB geometry column for `right` rows
   * @param predicate    within | contains | intersects | overlaps | withindist N
   * @param cellDeg      grid cell size in degrees
   * @param extraCondition optional extra join condition over the two sides'
   *                     columns (applied after the spatial refine)
   * @param distanceCol  if set, append geodesic centroid metres (Int)
   * @return left.* ++ right.* (+ distance); column names must be disjoint
   */
  def join(
      left: DataFrame, right: DataFrame,
      leftWkb: Column, rightWkb: Column,
      predicate: SpatialPredicate,
      cellDeg: Double = 1.0,
      extraCondition: Option[Column] = None,
      distanceCol: Option[String] = None): DataFrame = {

    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both sides have: ${dup.mkString(", ")}")

    val radius = predicate match {
      case SpatialPredicate.WithinDist(m) => m
      case SpatialPredicate.Nearest =>
        throw new IllegalArgumentException(
          "nearest is served by GridNearestJoin.nearest (expanding-ring search), " +
            "not the cell-equi-join grid join")
      case _ => 0.0
    }

    // Mid-scale balance guard. When one side is small enough that
    // Catalyst will BROADCAST it, the cell equi-join introduces no
    // exchange, so the whole explode -> join -> refine pipeline inherits
    // the other side's SCAN layout — and a single small parquet file is
    // ONE partition, putting the entire join on one core even though its
    // post-explode, post-join work is quadratically larger than its
    // bytes (measured 57 s single-task vs ~4 s spread on a 42M-pair
    // probe). Spread a side before its explode iff: the OTHER side fits
    // Catalyst's own broadcast estimate (the only regime without a
    // join-owned exchange), this side is scan-shaped (no shuffling
    // operator below — `.rdd` is then exchange-free to plan and its
    // partition count IS the file layout), and it has fewer partitions
    // than cores. The genuinely-large regime (neither side broadcastable)
    // keeps today's plan untouched: shuffle join on the cell id with
    // AQE's hot-cell skew split (spec-pinned).
    def broadcastable(df: DataFrame): Boolean = {
      val raw = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
      val thr = Try(raw.toLong).getOrElse(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
      thr > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thr)
    }
    def spreadIfDegenerate(df: DataFrame): DataFrame = {
      val scanShaped = df.queryExecution.optimizedPlan.collectFirst {
        case p @ (_: Join | _: Aggregate | _: Sort | _: Window | _: RepartitionOperation) => p
      }.isEmpty
      if (!scanShaped) return df
      val spark = df.sparkSession
      val target = Try(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
        .getOrElse(spark.sparkContext.defaultParallelism)
      if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
    }
    // Streaming sides cannot be batch-planned (stats/.rdd throw) and the
    // micro-batch engine owns their partitioning — guard batch-only.
    val (l0, r0) =
      if (left.isStreaming || right.isStreaming) (left, right)
      else (if (broadcastable(right)) spreadIfDegenerate(left) else left,
        if (broadcastable(left)) spreadIfDegenerate(right) else right)

    val lw = "__graft_lwkb"; val rw = "__graft_rwkb"; val cell = "__graft_cell"
    val l = l0.withColumn(lw, leftWkb).where(col(lw).isNotNull)
      .withColumn(cell, explode(GeoExpressions.gridCells(col(lw), cellDeg, radius)))
    val r = r0.withColumn(rw, rightWkb).where(col(rw).isNotNull)
      .withColumn(cell, explode(GeoExpressions.gridCells(col(rw), cellDeg)))

    val spatialRefine: Column = predicate match {
      case SpatialPredicate.WithinDist(m) =>
        GeoExpressions.geodesicMeters(col(lw), col(rw)) <= m.toInt
      case rel =>
        GeoExpressions.stRelates(col(lw), col(rw), rel.toString.toLowerCase)
    }

    val joined = l.join(r, cell)
      .where(GeoExpressions.refCell(col(lw), col(rw), cellDeg, radius) === col(cell))
      .where(spatialRefine)
    val conditioned = extraCondition.fold(joined)(joined.where)
    val withDist = distanceCol.fold(conditioned)(name =>
      conditioned.withColumn(name, GeoExpressions.geodesicMeters(col(lw), col(rw))))
    withDist.drop(lw, rw, cell)
  }
}
