package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range (interval) join — the 1-D sibling of [[GridSpatialJoin]]: every
 * (point row, interval row) pair with `lo <= v <= hi` (inclusive,
 * SQL-BETWEEN semantics), without a cartesian product and without
 * broadcasting either side.
 *
 * Algorithm (bucket PBSM):
 *  1. points map to the single fixed-width bucket containing their
 *     value; intervals explode to every bucket they overlap;
 *  2. shuffle equi-join on the bucket id (AQE skew split / broadcast /
 *     everything Catalyst does to equi-joins applies);
 *  3. exact refine `v between lo and hi` on the original values.
 * A pair meets in EXACTLY the point's bucket, so no dedup pass is
 * needed. Shuffle volume: O(|P| + |I| · span/bucketWidth); pick
 * `bucketWidth` near the typical interval span (or use [[autoWidth]]) —
 * wide buckets inflate candidates per bucket, narrow ones inflate the
 * interval fan-out. Bucket ids derive from a double view of the values;
 * the REFINE compares the original (untouched) columns, so double
 * rounding can only cost a candidate co-location never correctness —
 * bucket boundaries are computed on the same doubles both sides.
 *
 * The classic uses: band joins (`a.v BETWEEN b.v - eps AND b.v + eps`),
 * IP-range lookups, histogram-bin assignment, time-slot matching.
 */
object RangeJoin {

  /** Bucket width from interval statistics: one column-pruned agg pass.
    * Wide enough that the mean interval spans O(1) buckets, no narrower
    * than 1/target of the value domain. Degenerate inputs get 1.0. */
  def autoWidth(intervals: DataFrame, loCol: Column, hiCol: Column,
      targetBuckets: Double = 4096.0): Double = {
    val row = intervals
      .select(loCol.cast("double").as("lo"), hiCol.cast("double").as("hi"))
      .where(col("lo").isNotNull && col("hi").isNotNull && col("lo") <= col("hi"))
      .agg(avg(col("hi") - col("lo")), min(col("lo")), max(col("hi")), count(lit(1)))
      .head()
    if (row.getLong(3) == 0L || row.isNullAt(0)) 1.0
    else {
      val meanSpan = math.max(row.getDouble(0), 1e-12)
      val domain = math.max(row.getDouble(2) - row.getDouble(1), 1e-12)
      math.max(meanSpan, domain / math.max(targetBuckets, 1.0))
    }
  }

  /**
   * @param points      side carrying the probed value
   * @param intervals   side carrying [lo, hi]; rows with null/inverted
   *                    bounds drop (inner semantics)
   * @param pointCol    value column/expression over `points`
   * @param loCol,hiCol bound columns/expressions over `intervals`
   * @param bucketWidth fixed bucket width (> 0); see [[autoWidth]]
   * @return points.* ++ intervals.* — column names must be disjoint
   */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: Column, loCol: Column, hiCol: Column,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"column names must be disjoint, both sides have: ${dup.mkString(", ")}")

    val v = "__rj_v"; val lo = "__rj_lo"; val hi = "__rj_hi"; val b = "__rj_b"
    val (p0, i0) = JoinLayout.balance(points, intervals)
    val p = p0.withColumn(v, pointCol).where(col(v).isNotNull)
      .withColumn(b, floor(col(v).cast("double") / bucketWidth).cast("long"))
    val i = i0.withColumn(lo, loCol).withColumn(hi, hiCol)
      .where(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn(b, explode(sequence(
        floor(col(lo).cast("double") / bucketWidth).cast("long"),
        floor(col(hi).cast("double") / bucketWidth).cast("long"))))
    p.join(i, b)
      .where(col(v) >= col(lo) && col(v) <= col(hi))
      .drop(v, lo, hi, b)
  }
}
