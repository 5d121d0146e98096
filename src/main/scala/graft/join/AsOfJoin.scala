package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join: for every left row, the single right row with the greatest
 * `rightTsCol` <= `leftTsCol` among rows sharing the key columns — the
 * temporal-enrichment join every event pipeline needs (attach the
 * latest dimension/rate/aggregate state known at event time). Inner
 * semantics: a left row with no at-or-before match drops (DuckDB
 * `ASOF JOIN` semantics, which is also the oracle used by the gate).
 *
 * Shape — the 100 TB rationale: a time-range theta join either explodes
 * candidates (every earlier right row per left row) or needs a range
 * join. Instead both sides UNION into one tagged stream; ONE shuffle
 * partitions by key and sorts by (ts, side-tag, right-payload);
 * `last(right-struct, ignoreNulls)` over the unbounded-preceding row
 * window carries the latest right row forward into each left row.
 * O(|L|+|R|) shuffle volume, zero pair blow-up, whole-stage-codegen
 * window. The per-key window is the same shape as any keyed analytic
 * (ranking, lag): one key's rows land on one task. When a single key
 * can be pathologically hot (one user owning 100M events), use
 * [[asofBucketed]], which splits every key by a time bucket.
 *
 * Determinism: right rows at exactly `leftTs` match (at-or-before);
 * among right rows with identical (key, ts) the greatest right payload
 * struct wins (sides sort right-before-left on the tag at equal ts, and
 * right rows among themselves by their payload struct — total,
 * deterministic order). The right payload must therefore be ORDERABLE
 * (no map columns) — the same constraint as the grid joins' aggregated
 * side.
 *
 * Null semantics follow the SQL join conditions they stand in for: a
 * null key or null ts can never satisfy `l.k = r.k AND l.ts >= r.ts`,
 * so such rows drop from BOTH sides up front (without the filter, the
 * nulls-first sort would hand a null-ts right row to left rows that
 * should not match, and null keys would match each other).
 *
 * @param keys key column names, present on BOTH sides (the only shared
 *             names allowed); remaining column names must be disjoint
 * @return left.* ++ right non-key columns (the matched `rightTsCol`
 *         rides along so callers see the match time)
 */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String): DataFrame = {
    validate(left, right, keys, rightTsCol)
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq

    val ts = "__asof_ts"; val tag = "__asof_tag"
    val lS = "__asof_l"; val rS = "__asof_r"; val carry = "__asof_carry"
    // keys ride the shuffle once, as top-level columns; the payload
    // structs carry only the NON-key columns of each side
    val lPayloadCols = left.columns.filterNot(keys.contains).toSeq
    val rStructType = new StructType(rPayloadCols.map(c => right.schema(c)).toArray)
    val lStructType = new StructType(lPayloadCols.map(c => left.schema(c)).toArray)
    def nonNull(df: DataFrame, tsCol: String): DataFrame =
      df.where((col(tsCol) +: keys.map(col)).map(_.isNotNull).reduce(_ && _))

    val lTagged = nonNull(left, leftTsCol).select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as(ts), lit(1).as(tag),
        struct(lPayloadCols.map(col): _*).as(lS),
        lit(null).cast(rStructType).as(rS)): _*)
    val rTagged = nonNull(right, rightTsCol).select(
      keys.map(col) ++ Seq(
        col(rightTsCol).as(ts), lit(0).as(tag),
        lit(null).cast(lStructType).as(lS),
        struct(rPayloadCols.map(col): _*).as(rS)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts).asc, col(tag).asc, col(rS).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn(carry, last(col(rS), ignoreNulls = true).over(w))
      .where(col(tag) === 1 && col(carry).isNotNull)
      .select(left.columns.map(c =>
          if (keys.contains(c)) col(c) else col(s"$lS.`$c`"))
        ++ rPayloadCols.map(c => col(s"$carry.`$c`")): _*)
  }

  /**
   * Hot-key-safe as-of join: identical semantics and output contract as
   * [[asof]], but every key is additionally split by a time bucket so no
   * single task ever holds a whole key's timeline.
   *
   *  1. the big union window runs per (key, BUCKET) — a 100M-event hot
   *     key spreads over its buckets;
   *  2. per (key, bucket) the right side's bucket-final state is one
   *     map-side-combined `max(struct(ts, payload))` aggregate;
   *  3. a per-key window over DISTINCT buckets (rows = #buckets, not
   *     #rows — bounded by time-range/width regardless of volume)
   *     computes each left bucket's carry-in: the latest right state in
   *     any STRICTLY earlier bucket;
   *  4. final match = coalesce(local carry, carry-in). Sound because
   *     `bucketOf` must be MONOTONE non-decreasing in ts: every right
   *     row in an earlier bucket is strictly older than every ts in the
   *     left row's bucket, so a local match always beats the carry-in.
   *
   * @param bucketOf maps a ts column to its bucket id — any monotone
   *                 non-decreasing, orderable derivation, e.g.
   *                 `t => date_trunc("day", t)` or `t => floor(t / 1000)`
   */
  def asofBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      bucketOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame = {
    validate(left, right, keys, rightTsCol)
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val lPayloadCols = left.columns.filterNot(keys.contains).toSeq

    val ts = "__asof_ts"; val tag = "__asof_tag"; val b = "__asof_bkt"
    val lS = "__asof_l"; val rS = "__asof_r"
    val local = "__asof_local"; val fin = "__asof_fin"; val cin = "__asof_cin"
    val rStructType = new StructType(rPayloadCols.map(c => right.schema(c)).toArray)
    val lStructType = new StructType(lPayloadCols.map(c => left.schema(c)).toArray)
    def nonNull(df: DataFrame, tsCol: String): DataFrame =
      df.where((col(tsCol) +: keys.map(col)).map(_.isNotNull).reduce(_ && _))

    val lTagged = nonNull(left, leftTsCol).select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as(ts), bucketOf(col(leftTsCol)).as(b), lit(1).as(tag),
        struct(lPayloadCols.map(col): _*).as(lS),
        lit(null).cast(rStructType).as(rS)): _*)
    val rTagged = nonNull(right, rightTsCol).select(
      keys.map(col) ++ Seq(
        col(rightTsCol).as(ts), bucketOf(col(rightTsCol)).as(b), lit(0).as(tag),
        lit(null).cast(lStructType).as(lS),
        struct(rPayloadCols.map(col): _*).as(rS)): _*)

    // 1. local carry within each (key, bucket) — same ordering contract
    // as the plain asof, finer partitioning
    val wLocal = Window.partitionBy((keys :+ b).map(col): _*)
      .orderBy(col(ts).asc, col(tag).asc, col(rS).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localized = lTagged.unionByName(rTagged)
      .withColumn(local, last(col(rS), ignoreNulls = true).over(wLocal))

    // 2. bucket-final right state per (key, bucket): ts rides FIRST in
    // the struct, so max() is "latest ts, then greatest payload" — the
    // same winner the ordered window would carry
    val bucketFinal = rTagged
      .groupBy((keys :+ b).map(col): _*)
      .agg(max(struct(col(ts), col(rS).as("p"))).as(fin))

    // 3. carry-in per LEFT bucket: union distinct left buckets (tag 1)
    // with the bucket finals (tag 0); per key, ordered by (bucket, tag),
    // the frame ending ONE ROW BEFORE a left-bucket row sees exactly the
    // finals of strictly earlier buckets (the same bucket's final sorts
    // AFTER the left row — its rights are local, not carry-in).
    // Window volume: #distinct buckets per key, not #rows.
    val lBuckets = lTagged.select((keys :+ b).map(col): _*).distinct()
      .withColumn(tag, lit(1)).withColumn(fin, lit(null).cast(bucketFinal.schema(fin).dataType))
    val rBuckets = bucketFinal.withColumn(tag, lit(0))
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(b).asc, col(tag).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = lBuckets.unionByName(rBuckets)
      .withColumn(cin, last(col(fin), ignoreNulls = true).over(wCarry))
      .where(col(tag) === 1)
      .select((keys :+ b).map(col) :+ col(s"$cin.p").as(cin): _*)

    // 4. attach carry-in to the left rows of each (key, bucket) and pick
    // the local match when present (always at-or-later than any carry-in)
    localized.where(col(tag) === 1)
      .join(carryIn, keys :+ b)
      .withColumn(rS, coalesce(col(local), col(cin)))
      .where(col(rS).isNotNull)
      .select(left.columns.map(c =>
          if (keys.contains(c)) col(c) else col(s"$lS.`$c`"))
        ++ rPayloadCols.map(c => col(s"$rS.`$c`")): _*)
  }

  private def validate(left: DataFrame, right: DataFrame,
      keys: Seq[String], rightTsCol: String): Unit = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    keys.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"key column `$k` must exist on both sides")
    }
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq
    require(rPayloadCols.contains(rightTsCol),
      s"right ts column `$rightTsCol` must be a non-key right column")
    val dup = left.columns.toSet.intersect(rPayloadCols.toSet)
    require(dup.isEmpty,
      s"non-key column names must be disjoint, both sides have: ${dup.mkString(", ")}")
  }
}
