package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Cohort retention analysis: group users by WHEN they arrived (their
 * signup period) and count how many of each cohort were active 0, 1,
 * 2, … periods later — the triangular retention matrix every product
 * and every training-data freshness dashboard draws. The fourth member
 * of the user-journey family ([[Funnel]] = ordered step conversion,
 * [[EventWindows]] = activity aggregation, [[graft.curation
 * .ChangeHistory]] = state episodes).
 *
 * Semantics: a user's cohort anchor is their EARLIEST `anchorType`
 * event; every event at-or-after the anchor (any type) marks the user
 * active in period `(ts - anchor) / period` (integer floor division —
 * exact on the micros longs, no doubles); the matrix counts DISTINCT
 * users per (cohort period, offset). Users without an anchor event
 * contribute nothing (they were never acquired); pre-anchor events
 * drop (activity before signup is bot/backfill noise by convention).
 *
 * Scale: everything shuffled is slim — (user, anchor) pairs from one
 * map-side-combined min-aggregation, then (user, cohort, offset)
 * triples deduped before the final count (the dedup IS the distinct-
 * users semantics; it also bounds the last aggregation's input by
 * users × active-periods, not events). The user-keyed join is a plain
 * equi-join: broadcast when the cohort table is small, shuffle
 * otherwise — Catalyst's call, AQE-correctable; a pathologically hot
 * user id is an upstream data bug ([[graft.stats.GroupStats
 * .topValues]] finds it), not a layout this operator must survive.
 *
 * Output: `(cohort_period, period_offset, n_users)` — cohort_period =
 * anchor-time floor-division by `periodMicros` (an absolute period
 * index, e.g. epoch-week), period_offset >= 0.
 */
object Retention {

  def cohorts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, anchorType: String,
      periodMicros: Long = 7L * 24 * 3600 * 1000000): DataFrame = {
    require(periodMicros > 0, s"periodMicros must be positive, got $periodMicros")
    val missing = Seq(userCol, tsCol, typeCol).filterNot(events.columns.contains)
    require(missing.isEmpty, s"columns missing from events: ${missing.mkString(", ")}")
    def us(c: Column): Column = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(c)
      case _ => c.cast("long")
    }
    val e = events.select(col(userCol).as("__u"), us(col(tsCol)).as("__us"),
        col(typeCol).as("__t"))
      .where(col("__u").isNotNull && col("__us").isNotNull)
    val anchors = e.where(col("__t") === anchorType)
      .groupBy(col("__u")).agg(min(col("__us")).as("__a"))
    e.join(anchors, "__u")
      .where(col("__us") >= col("__a"))
      // cohort_period = TRUE floor division: `div` truncates toward
      // zero, which would give pre-1970 (negative-micros) anchors a
      // double-width period 0; the negative branch rounds away from
      // zero instead (matches DuckDB's flooring `//` on every input).
      // period_offset needs no branch — __us >= __a makes it
      // non-negative, where div == floor
      .select(col("__u"),
        expr(s"CASE WHEN __a >= 0 THEN __a div ${periodMicros}L " +
          s"ELSE -((-__a + ${periodMicros - 1}L) div ${periodMicros}L) END")
          .as("cohort_period"),
        expr(s"(__us - __a) div ${periodMicros}L").as("period_offset"))
      .distinct()
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
