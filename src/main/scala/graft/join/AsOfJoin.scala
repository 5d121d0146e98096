package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join: for every left row, the single right row with the greatest
 * `rightTsCol` <= `leftTsCol` among rows sharing the key columns — the
 * temporal-enrichment join every event pipeline needs (attach the
 * latest dimension/rate/aggregate state known at event time). Default
 * inner semantics: a left row with no at-or-before match drops (DuckDB
 * `ASOF JOIN` semantics, which is also the oracle used by the gate);
 * `joinType = "left"` keeps unmatched left rows with null right columns
 * (DuckDB `ASOF LEFT JOIN`), including left rows whose key/ts is null —
 * an unsatisfiable join condition still emits the left row on an outer
 * join, so those bypass the shuffle entirely and union back in.
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

  private val ts = "__asof_ts"; private val tag = "__asof_tag"
  private val bkt = "__asof_bkt"
  private val lS = "__asof_l"; private val rS = "__asof_r"

  /** The tagged-union construction BOTH variants build on — shared so
    * their ordering/tie-break/null contracts can never drift apart.
    * Keys ride the shuffle once, as top-level columns; the payload
    * structs carry only the NON-key columns of each side; null keys and
    * null ts drop; left rows tag 1, right rows tag 0 (at equal ts the
    * right sorts first — at-or-before inclusivity). With `bucketOf` set,
    * a `__asof_bkt` column rides along, and a bucket expression that
    * evaluates to NULL on a non-null ts fails LOUDLY (the downstream
    * bucket equi-join would otherwise silently drop the row). */
  private def tagSides(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      bucketOf: Option[Column => Column]): (DataFrame, DataFrame, Seq[String], Seq[String]) = {
    val lPayloadCols = left.columns.filterNot(keys.contains).toSeq
    val rPayloadCols = right.columns.filterNot(keys.contains).toSeq
    val rStructType = new StructType(rPayloadCols.map(c => right.schema(c)).toArray)
    val lStructType = new StructType(lPayloadCols.map(c => left.schema(c)).toArray)
    def nonNull(df: DataFrame, tsCol: String): DataFrame =
      df.where((col(tsCol) +: keys.map(col)).map(_.isNotNull).reduce(_ && _))
    def bucketCols(tsCol: String): Seq[Column] = bucketOf.toSeq.map { f =>
      val b = f(col(tsCol))
      when(b.isNotNull, b).otherwise(raise_error(concat(
        lit("asofBucketed: bucketOf returned null for non-null ts "),
        col(tsCol).cast("string")))).as(bkt)
    }
    val lTagged = nonNull(left, leftTsCol).select(
      keys.map(col) ++ Seq(col(leftTsCol).as(ts)) ++ bucketCols(leftTsCol) ++ Seq(
        lit(1).as(tag),
        struct(lPayloadCols.map(col): _*).as(lS),
        lit(null).cast(rStructType).as(rS)): _*)
    val rTagged = nonNull(right, rightTsCol).select(
      keys.map(col) ++ Seq(col(rightTsCol).as(ts)) ++ bucketCols(rightTsCol) ++ Seq(
        lit(0).as(tag),
        lit(null).cast(lStructType).as(lS),
        struct(rPayloadCols.map(col): _*).as(rS)): _*)
    (lTagged, rTagged, lPayloadCols, rPayloadCols)
  }

  /** The shared window ordering: (ts, side-tag, right payload) — the
    * single definition of the tie-break contract. */
  private def carryOrder(w: org.apache.spark.sql.expressions.WindowSpec) =
    w.orderBy(col(ts).asc, col(tag).asc, col(rS).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  private def finalProject(out: DataFrame, left: DataFrame, keys: Seq[String],
      rPayloadCols: Seq[String], matched: String): DataFrame =
    out.select(left.columns.map(c =>
        if (keys.contains(c)) col(c) else col(s"$lS.`$c`"))
      ++ rPayloadCols.map(c => col(s"$matched.`$c`")): _*)

  /** The forward-pass carry, expressed as a BACKWARD running window
    * over the exactly-reversed ordering. Semantically this is
    * `first(non-null) over (ts asc, tag desc, payload asc)
    * ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING` — rights sort
    * AFTER lefts at equal ts (at-or-after inclusivity), identical
    * rights by payload asc so the SMALLEST payload wins (the mirror of
    * the backward pass's greatest-payload rule). It is NOT written
    * with an unbounded-FOLLOWING frame because Spark executes that
    * frame non-incrementally (UnboundedFollowingWindowFunctionFrame
    * re-aggregates current→end for EVERY row: O(partition²) — measured
    * quadratic death on million-row keys at x10 data, caught by the
    * sf1 fuzz leg). Reversing every sort key and taking `last` over
    * the running [unbounded preceding, current] frame computes the
    * identical value — rows tied on the full (ts, tag, payload) key
    * carry equal payloads, so their internal permutation cannot change
    * the answer — and the running frame aggregates incrementally: O(n). */
  private def carryOrderFwdRev(w: org.apache.spark.sql.expressions.WindowSpec) =
    w.orderBy(col(ts).desc, col(tag).asc, col(rS).desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** ts as a number for nearest-distance comparison (timestamps →
    * microseconds, dates → days, numerics pass through). */
  private def tsNum(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
      case org.apache.spark.sql.types.DateType => unix_date(c)
      case _ => c
    }

  /**
   * @param direction match selection per left row among same-key rights:
   *   - `"backward"` (default): greatest rightTs <= leftTs;
   *   - `"forward"`: smallest rightTs >= leftTs (implemented as a
   *     reversed-order running carry — same one shuffle, same O(L+R));
   *   - `"nearest"`: whichever of the two is closer in |ts distance|,
   *     ties to the BACKWARD match; both carries compute over the one
   *     shuffled union (two window sorts on the same partitioning).
   *     Requires a ts type with a numeric distance (timestamp, date, or
   *     any numeric column).
   */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      joinType: String = "inner", direction: String = "backward"): DataFrame = {
    validate(left, right, keys, rightTsCol, joinType)
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    val (lTagged, rTagged, _, rPayloadCols) =
      tagSides(left, right, keys, leftTsCol, rightTsCol, None)
    val carry = "__asof_carry"
    val wB = carryOrder(Window.partitionBy(keys.map(col): _*))
    val wF = carryOrderFwdRev(Window.partitionBy(keys.map(col): _*))
    val union = lTagged.unionByName(rTagged)
    val withCarry = direction match {
      case "backward" =>
        union.withColumn(carry, last(col(rS), ignoreNulls = true).over(wB))
      case "forward" =>
        union.withColumn(carry, last(col(rS), ignoreNulls = true).over(wF))
      case "nearest" =>
        // carries keep their match ts for the distance comparison; the
        // when() makes left rows null so ignoreNulls skips them
        val rT = when(col(tag) === 0, struct(col(ts), col(rS).as("p")))
        val b = "__asof_b"; val f = "__asof_f"
        val lNum = tsNum(col(ts), lTagged.schema(ts).dataType)
        def num(c: Column) = tsNum(c, lTagged.schema(ts).dataType)
        union
          .withColumn(b, last(rT, ignoreNulls = true).over(wB))
          .withColumn(f, last(rT, ignoreNulls = true).over(wF))
          .withColumn(carry,
            when(col(b).isNull, col(s"$f.p"))
              .when(col(f).isNull, col(s"$b.p"))
              .when(lNum - num(col(s"$b.$ts")) <= num(col(s"$f.$ts")) - lNum,
                col(s"$b.p"))
              .otherwise(col(s"$f.p")))
          .drop(b, f)
    }
    val matchFilter =
      if (joinType == "left") col(tag) === 1
      else col(tag) === 1 && col(carry).isNotNull
    val out = withCarry.where(matchFilter)
    withOuterRows(finalProject(out, left, keys, rPayloadCols, carry),
      left, right, keys, leftTsCol, joinType)
  }

  /**
   * [[asof]] with a MATCH-AGE BOUND (pandas `merge_asof`'s `tolerance`):
   * a row only matches if its selected partner is within `tolerance` of
   * its own timestamp — the "state must be fresh" enrichment contract
   * (a feature an hour stale is a leak, not a feature). Implemented as
   * the residual filter over [[asof]]'s output, which is EXACTLY
   * tolerance-aware matching: the as-of partner is the closest
   * direction-valid candidate, so if IT exceeds the bound every other
   * candidate does too (for `nearest`, the chosen side is the closer of
   * the two carries — same argument). `inner` drops over-age rows,
   * `left` keeps them with null right columns, indistinguishable from
   * a no-match row.
   *
   * `tolerance` is in the ts type's NUMERIC distance units —
   * microseconds for timestamps, days for dates, the raw value for
   * numeric ts columns (the [[asof]] `nearest` convention).
   */
  def asofWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String, tolerance: Long,
      joinType: String = "inner", direction: String = "backward"): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val joined = asof(left, right, keys, leftTsCol, rightTsCol, joinType, direction)
    val dist = abs(
      tsNum(col(leftTsCol), left.schema(leftTsCol).dataType) -
        tsNum(col(rightTsCol), right.schema(rightTsCol).dataType))
    val invalid = col(rightTsCol).isNotNull && dist > tolerance
    val payload = right.columns.filterNot(keys.contains).toSeq
    joinType match {
      case "inner" => joined.where(!invalid)
      case _ =>
        joined.select(left.columns.map(col) ++ payload.map(c =>
          when(invalid, lit(null)).otherwise(col(c)).as(c)): _*)
    }
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
   *                 non-decreasing, orderable, NEVER-NULL-on-non-null-ts
   *                 derivation, e.g. `t => date_trunc("day", t)` or
   *                 `t => floor(t / 1000)` (a null bucket fails loudly)
   */
  def asofBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsCol: String, rightTsCol: String,
      bucketOf: Column => Column, joinType: String = "inner"): DataFrame = {
    validate(left, right, keys, rightTsCol, joinType)
    val (lTagged, rTagged, _, rPayloadCols) =
      tagSides(left, right, keys, leftTsCol, rightTsCol, Some(bucketOf))
    val local = "__asof_local"; val fin = "__asof_fin"; val cin = "__asof_cin"

    // 1. local carry within each (key, bucket) — same ordering contract
    // as the plain asof (carryOrder), finer partitioning
    val wLocal = carryOrder(Window.partitionBy((keys :+ bkt).map(col): _*))
    val localized = lTagged.unionByName(rTagged)
      .withColumn(local, last(col(rS), ignoreNulls = true).over(wLocal))

    // 2. bucket-final right state per (key, bucket): ts rides FIRST in
    // the struct, so max() is "latest ts, then greatest payload" — the
    // same winner the ordered window would carry
    val bucketFinal = rTagged
      .groupBy((keys :+ bkt).map(col): _*)
      .agg(max(struct(col(ts), col(rS).as("p"))).as(fin))

    // 3. carry-in per LEFT bucket: union distinct left buckets (tag 1)
    // with the bucket finals (tag 0); per key, ordered by (bucket,
    // tag desc — the left-bucket row sorts BEFORE its own bucket's
    // final), the frame ending ONE ROW BEFORE a left-bucket row sees
    // exactly the finals of strictly earlier buckets.
    // Window volume: #distinct buckets per key, not #rows.
    val lBuckets = lTagged.select((keys :+ bkt).map(col): _*).distinct()
      .withColumn(tag, lit(1)).withColumn(fin, lit(null).cast(bucketFinal.schema(fin).dataType))
    val rBuckets = bucketFinal.withColumn(tag, lit(0))
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(bkt).asc, col(tag).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = lBuckets.unionByName(rBuckets)
      .withColumn(cin, last(col(fin), ignoreNulls = true).over(wCarry))
      .where(col(tag) === 1)
      .select((keys :+ bkt).map(col) :+ col(s"$cin.p").as(cin): _*)

    // 4. attach carry-in to the left rows of each (key, bucket) and pick
    // the local match when present (always at-or-later than any carry-in)
    val joined = localized.where(col(tag) === 1)
      .join(carryIn, keys :+ bkt)
      .withColumn(rS, coalesce(col(local), col(cin)))
    val out = if (joinType == "left") joined else joined.where(col(rS).isNotNull)
    withOuterRows(finalProject(out, left, keys, rPayloadCols, rS),
      left, right, keys, leftTsCol, joinType)
  }

  /** Left-outer completion: the tagged union drops left rows whose key
    * or ts is null (unsatisfiable join condition) — an outer join still
    * emits them, right columns null, and they never need the shuffle. */
  private def withOuterRows(matched: DataFrame, left: DataFrame,
      right: DataFrame, keys: Seq[String], leftTsCol: String,
      joinType: String): DataFrame =
    if (joinType != "left") matched
    else {
      val rPayloadCols = right.columns.filterNot(keys.contains).toSeq
      val unmatchable = left
        .where((col(leftTsCol) +: keys.map(col)).map(_.isNull).reduce(_ || _))
      val padded = rPayloadCols.foldLeft(unmatchable) { (d, c) =>
        d.withColumn(c, lit(null).cast(right.schema(c).dataType))
      }
      matched.unionByName(padded)
    }

  private def validate(left: DataFrame, right: DataFrame,
      keys: Seq[String], rightTsCol: String,
      joinType: String = "inner"): Unit = {
    require(joinType == "inner" || joinType == "left",
      s"joinType must be 'inner' or 'left', got '$joinType'")
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
