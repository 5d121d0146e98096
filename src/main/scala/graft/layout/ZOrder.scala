package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton-curve) data-layout clustering — the WRITE-path
 * operator that makes 100 TB READS cheap: rows close in a
 * multi-dimensional key space land in the same output partition/file,
 * so per-file min/max statistics become tight on EVERY clustered
 * column and format-level data skipping (parquet row-group stats,
 * table-format file pruning) prunes multi-predicate scans that a
 * single-column sort can only prune on its leading column. The same
 * operation behind Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed as
 * a plain Spark plan.
 *
 * Pipeline: per-column integer equi-width bucket ids (exact integer
 * arithmetic over in-plan min/max stats — one tiny 1-row aggregate
 * broadcast into the scan, NO driver action, NO sampling RNG) →
 * codegen'd [[graft.functions.ZValue]] bit interleave →
 * `repartitionByRange` on the z key (sampled range boundaries — the
 * one Spark-internal nondeterminism, confined to partition SIZING,
 * never to z-values or row content) → `sortWithinPartitions` so
 * row-group stats are tight inside each file too.
 *
 * Equi-width bucketing is exact and engine-replayable; heavily skewed
 * columns get better balance from equi-DEPTH boundaries
 * ([[graft.stats.GroupStats.approxQuantiles]] supplies them) at the
 * price of a trained-boundary artifact — compose `bucketed` with your
 * own boundary expression for that. Nulls bucket to 0 (sort first).
 *
 * Scale shape: one scan + one range shuffle of the full data — the
 * cost any layout rewrite pays by definition; everything before the
 * exchange is map-side and codegen'd.
 */
object ZOrder {

  /** Exact long integer division for non-negative operands:
    * `(a - (a mod d)) / d` — the subtraction yields an exact multiple,
    * whose IEEE division is exact, so this equals SQL's `a // d`
    * bit-for-bit (no floor-of-rounded-quotient hazard). */
  private def idiv(a: Column, d: Column): Column =
    ((a - pmod(a, d)) / d).cast("long")

  /** Exact equi-width bucket id of `v` in `[0, 2^bits)` given closed
    * integer stats `[mn, mx]`: `((v - mn) · 2^bits) div (mx - mn + 1)`
    * — pure integer arithmetic, identical in any engine; null → 0.
    * Caller contract: `(mx - mn + 1) << bits` must fit a long (ids,
    * dates, bucketized timestamps all do; shrink `bits` for wider
    * ranges). */
  def bucket(v: Column, mn: Column, mx: Column, bits: Int): Column = {
    val b = lit(1L << bits)
    coalesce(
      idiv((v.cast("long") - mn) * b, mx - mn + lit(1L)),
      lit(0L))
  }

  /** The z key for `cols` with stats columns supplied by the caller:
    * zip of [[bucket]] ids through the codegen'd interleave. */
  def zvalue(cols: Seq[Column], mins: Seq[Column], maxs: Seq[Column],
      bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"need 1 <= dims and dims*bits <= 63, got ${cols.size} dims x $bits bits")
    graft.functions.ZValue.zValue(
      array(cols.lazyZip(mins).lazyZip(maxs).map((c, mn, mx) => bucket(c, mn, mx, bits)): _*),
      bits)
  }

  /**
   * Rewrite `df`'s layout z-ordered on integer columns `cols`:
   * same rows, same schema, clustered partitioning. `partitions` sizes
   * the output (≈ files); `bits` is the per-dimension bucket
   * resolution (default 16 → 65 536 buckets/dim; `dims·bits <= 63`).
   */
  def zorderBy(df: DataFrame, cols: Seq[String], partitions: Int,
      bits: Int = 16): DataFrame = {
    require(cols.nonEmpty, "at least one layout column required")
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    require(cols.size * bits <= 63,
      s"dims*bits must be <= 63, got ${cols.size} x $bits")
    val zCol = "__graft_z"
    require(!df.columns.contains(zCol), s"input already has a $zCol column")
    val statAggs = cols.flatMap(c => Seq(
      min(col(c)).cast("long").as(s"__mn_$c"), max(col(c)).cast("long").as(s"__mx_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val z = zvalue(cols.map(col),
      cols.map(c => col(s"__mn_$c")), cols.map(c => col(s"__mx_$c")), bits)
    df.crossJoin(broadcast(stats))
      .withColumn(zCol, z)
      .repartitionByRange(partitions, col(zCol))
      .sortWithinPartitions(col(zCol))
      .drop((zCol +: cols.flatMap(c => Seq(s"__mn_$c", s"__mx_$c"))): _*)
  }
}
