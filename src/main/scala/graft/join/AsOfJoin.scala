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
 * deterministic order).
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
    val rStructType = new StructType(rPayloadCols.map(c => right.schema(c)).toArray)
    val lStructType = new StructType(left.schema.fields)

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTsCol).as(ts), lit(1).as(tag),
        struct(left.columns.map(col): _*).as(lS),
        lit(null).cast(rStructType).as(rS)): _*)
    val rTagged = right.select(
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
      .select(left.columns.map(c => col(s"$lS.`$c`"))
        ++ rPayloadCols.map(c => col(s"$carry.`$c`")): _*)
  }
}
