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
 * (ranking, lag): per-key data must be sort-colocated — that is the
 * semantics, not an artifact; a single pathologically hot key is
 * inherent to any ordered-per-key operator.
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
}
