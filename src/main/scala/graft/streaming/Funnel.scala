package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.join.AsOfJoin

/**
 * Funnel analysis over an event log: for each user, the earliest
 * greedy chain through an ordered list of step event types —
 * step 1 anchors at the user's EARLIEST step-1 event, each later step
 * at the earliest event of its type AT-OR-AFTER the previous step
 * (the deterministic "earliest completion" convention), conversion =
 * the whole chain fitting inside `windowMicros` of the anchor.
 *
 * Output: `(userCol, step1_ts … stepN_ts, steps_reached, converted)` —
 * a user missing step i has null from `step{i}_ts` on (nulls chain:
 * you cannot reach step i+1 without step i).
 *
 * Built by FOLDING the forward as-of join ([[AsOfJoin.asof]] with
 * `direction = "forward"`, left-outer): each step is one O(L+R)
 * tagged-union shuffle keyed by user — no per-user window over the
 * whole event timeline, no self-join pair blow-up, and the anchor
 * aggregation is map-side combined. N-step funnels cost N−1 keyed
 * shuffles of slim (user, ts) rows — at 100 TB the events scan
 * dominates, exactly as it should.
 *
 * Timestamps must be TimestampType (`windowMicros` compares
 * `unix_micros`); duplicate (user, type, ts) events collapse to one
 * chain step (the as-of tie rule picks deterministically).
 */
object Funnel {

  def earliestChain(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowMicros: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"step types must be distinct, got ${steps.mkString(", ")}")
    require(windowMicros > 0, s"windowMicros must be positive, got $windowMicros")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("step1_ts"))
    val chained = steps.zipWithIndex.drop(1).foldLeft(first) { case (acc, (st, i)) =>
      val stepTs = s"step${i + 1}_ts"
      val right = events.where(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as(stepTs))
      AsOfJoin.asof(acc, right, Seq(userCol),
        leftTsCol = s"step${i}_ts", rightTsCol = stepTs,
        joinType = "left", direction = "forward")
    }
    val reached = steps.indices.map(i => col(s"step${i + 1}_ts").isNotNull.cast("long"))
      .reduce(_ + _)
    val last = col(s"step${steps.size}_ts")
    chained.withColumn("steps_reached", reached)
      .withColumn("converted",
        last.isNotNull &&
          unix_micros(last) - unix_micros(col("step1_ts")) <= windowMicros)
  }
}
