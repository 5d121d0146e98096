package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time windowed aggregation, batch/stream unified: the same
 * function serves the batch `events_window` oracle query and a
 * Structured Streaming pipeline (watermark + tumbling window + partial
 * aggregation). In streaming mode Spark maintains window state and
 * emits on watermark expiry; in batch mode the identical plan is a
 * plain hash aggregate — one definition, two execution modes.
 */
object EventWindows {

  /**
   * Tumbling hourly counts and value sums per event type over an
   * event-time `ts` timestamp column. Output: hour_ts (epoch seconds,
   * long), event_type, cnt, sum_value (rounded to cents).
   *
   * @param watermark late-data bound; only meaningful for streams (a
   *                  batch plan ignores it).
   */
  def hourly(events: DataFrame, tsCol: String = "ts",
      typeCol: String = "event_type", valueCol: String = "value",
      watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      // sum in decimal: a double sum accumulates in partition-dependent
      // order, so its low bits (and occasionally the 2nd decimal of the
      // rounding) vary run to run; decimal addition is exact and
      // order-independent, making the result bit-stable at any parallelism.
      // decimal(38,8) (not 24,8): a (24,8) cast silently nulls |value| >=
      // 1e16 under non-ANSI and throws under ANSI — 38,8 keeps exactness
      // with 1e30 of headroom
      .agg(count(lit(1)).as("cnt"),
        round(sum(col(valueCol).cast("decimal(38,8)")), 2).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("hour_ts"), col(typeCol),
        col("cnt"), col("sum_value"))
  }

  /**
   * SLIDING-window counts and value sums per event type — the third
   * standard window shape beside [[hourly]] (tumbling) and
   * [[sessions]] (gap): every event contributes to `width/slide`
   * overlapping windows (rate metrics, moving aggregates). Same
   * batch/stream unification: streaming maintains one state row per
   * open (window, type) group and emits on watermark expiry; batch is
   * the identical plan as a hash aggregate over the window explode.
   *
   * Output: win_ts (window START, epoch seconds, long), event_type,
   * cnt, sum_value (exact decimal sum rounded to cents — the [[hourly]]
   * bit-stability contract).
   *
   * @param width window duration, e.g. "1 hour"
   * @param slide slide interval, e.g. "15 minutes" — must divide evenly
   *              into `width` for Spark's window assignment
   */
  def sliding(events: DataFrame, width: String, slide: String,
      tsCol: String = "ts", typeCol: String = "event_type",
      valueCol: String = "value", watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm
      .groupBy(window(col(tsCol), width, slide), col(typeCol))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col(valueCol).cast("decimal(38,8)")), 2).cast("double").as("sum_value"))
      .select(col("window.start").cast("long").as("win_ts"), col(typeCol),
        col("cnt"), col("sum_value"))
  }

  /**
   * Event-time interval join, batch/stream unified: pair every left
   * event with the right-side events of the SAME key whose timestamp
   * falls in `[l.ts + lower, l.ts + upper]` — the correlation join of
   * event analytics (clicks→conversions within the attribution window,
   * request→retry bursts, sensor co-occurrence). Output: all left
   * columns plus all right columns except the duplicated key.
   *
   * In streaming mode this is Spark's stream-stream inner join: BOTH
   * sides get event-time watermarks and the two-sided time-range
   * condition lets the state store evict — a right row is held only
   * until the watermark passes `its ts + |lower|`, a left row until
   * `its ts + upper`, so join state is bounded by arrival rate ×
   * (watermark + interval width), never by stream lifetime. Without
   * BOTH range bounds Spark would have to buffer a side forever —
   * which is why `upper` is required, not defaulted.
   *
   * In batch mode the identical expression plans as a key equi-join
   * with the range as a post-filter: one shuffle per side on the key
   * (or a broadcast when one side is small), AQE skew-splitting a hot
   * key like any equi-join. Never a cartesian: the range rides ON TOP
   * of the key equality.
   *
   * The two frames must not share column names other than `keyCol`
   * (rename before joining — enforced), so the output needs no
   * prefixing convention.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      upper: String, lower: String = "0 seconds",
      watermark: String = "1 hour"): DataFrame = {
    require(leftTsCol != rightTsCol,
      s"left and right timestamp columns must be named differently, both are '$leftTsCol'")
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"left and right must not share non-key columns, both have: ${overlap.mkString(", ")}")
    val l = if (left.isStreaming) left.withWatermark(leftTsCol, watermark) else left
    val r = if (right.isStreaming) right.withWatermark(rightTsCol, watermark) else right
    l.join(r,
      l(keyCol) === r(keyCol) &&
        col(rightTsCol) >= col(leftTsCol) + expr(s"INTERVAL $lower") &&
        col(rightTsCol) <= col(leftTsCol) + expr(s"INTERVAL $upper"),
      "inner")
      .drop(r(keyCol))
  }

  /**
   * Gap-based session windows per key, batch/stream unified like
   * [[hourly]]: consecutive events of a key belong to one session while
   * each starts strictly before the previous event's time + `gap`; the
   * session's end is its last event + `gap` (Spark `session_window`
   * semantics — an event landing exactly on the half-open end starts a
   * new session). Output bounds are epoch MICROseconds (bigint) so a
   * micros-precision oracle compares bit-exact.
   *
   * In streaming mode Spark merges/extends session state per key and
   * emits once the watermark passes a session's end; the identical call
   * on a batch frame is a plain aggregation over the same windows.
   */
  def sessions(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "user_id", valueCol: String = "value",
      gap: String = "12 hours", watermark: String = "1 day"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col(valueCol).cast("decimal(38,8)")), 2).cast("double").as("sum_value"))
      .select(col(keyCol),
        unix_micros(col("session_window.start")).as("start_ts"),
        unix_micros(col("session_window.end")).as("end_ts"),
        col("cnt"), col("sum_value"))
  }

  /**
   * Behavioral-corpus export — each (key, session) rendered as ONE
   * chronological line of event types ("view view click purchase"),
   * the sequence format behavioral models train on (next-action
   * prediction, session embeddings — the event-stream analogue of
   * [[graft.graph.Walks.corpusLines]]). Sessions are the same
   * `session_window(gap)` islands as [[sessions]]; within a session
   * the order is (event time, `tieCol`) — the tie column (a unique
   * event id) makes the line deterministic when one key logs two
   * events at the same instant, so the oracle's `string_agg ... ORDER
   * BY` replays it byte for byte.
   *
   * Scale shape: one keyed aggregation; per-group state is the
   * session's OWN events (bounded by session length — the gap bounds
   * it in wall time), never a user's whole history. Streaming: same
   * operator with a watermark, sessions emit on close (append mode);
   * batch executes the identical plan.
   *
   * Output: (keyCol, start_ts, end_ts, n_events, line) — timestamps
   * in epoch micros like [[sessions]].
   */
  def sessionLines(events: DataFrame, keyCol: String = "user_id",
      tsCol: String = "ts", typeCol: String = "event_type",
      tieCol: String = "event_id", gap: String = "12 hours",
      watermark: String = "1 day"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark(tsCol, watermark) else events
    withWm
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        array_join(transform(
          array_sort(collect_list(struct(
            unix_micros(col(tsCol)).as("t"), col(tieCol).as("tie"),
            col(typeCol).cast("string").as("w")))),
          x => x.getField("w")), " ").as("line"))
      .select(col(keyCol),
        unix_micros(col("session_window.start")).as("start_ts"),
        unix_micros(col("session_window.end")).as("end_ts"),
        col("n_events"), col("line"))
  }

  /**
   * Trailing-window per-event features: stamp every event with the
   * COUNT of the same key's events in the half-open trailing window
   * `[ts - windowMicros, ts)` — "how active was this user in the hour
   * before this event", the as-of feature-engineering staple (and,
   * computed at LABEL time, leakage-free by construction: the frame
   * ends strictly before the current event; same-instant events see
   * each other excluded).
   *
   * Implementation: one RANGE window frame over the micros-numeric
   * ordering (`rangeBetween(-w, -1)`) — a single keyed shuffle,
   * per-key state bounded by events inside the trailing window, no
   * self-join of events against events (the naive formulation is an
   * inequality pair join). Per-key DATA rows do sort in the window —
   * a pathologically hot key follows the [[graft.join.AsOfJoin
   * .asofBucketed]] discussion (bucket the timeline first).
   *
   * Output: the input plus `<outPrefix>_cnt` (long).
   */
  def trailingCount(events: DataFrame, keyCol: String, tsCol: String,
      windowMicros: Long, outPrefix: String = "trail"): DataFrame = {
    require(windowMicros > 0, s"windowMicros must be positive, got $windowMicros")
    val outCol = s"${outPrefix}_cnt"
    require(!events.columns.contains(outCol),
      s"output column `$outCol` already exists on the input")
    val us = "__tw_us"
    require(!events.columns.contains(us), s"`$us` column name is reserved")
    val usCol = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => unix_micros(col(tsCol))
      case _ => col(tsCol).cast("long")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(us))
      .rangeBetween(-windowMicros, -1)
    events.withColumn(us, usCol)
      .withColumn(outCol, count(lit(1)).over(w))
      .drop(us)
  }

  /**
   * Exponentially-decayed activity feature — the recency-weighted
   * engagement score every feature store keeps beside [[trailingCount]]
   * (freshness weighting for ranking, churn signals, per-user
   * temperature for sampling): over the last `steps` events of the same
   * key (current included), each step back halves the weight, and the
   * weighted sum lands beside the row.
   *
   * Integer contract (the library-wide oracle discipline): `valueCol`
   * must be INTEGRAL (pre-scale continuous values to micro-units — the
   * [[graft.stats.GroupStats.standardize]] rule), the weights are exact
   * powers of two (current event 2^(steps−1), oldest 2^0), missing lags
   * count 0, so `decay_sum = Σⱼ v(t−j)·2^(steps−1−j)` is pure 64-bit
   * integer math both engines replay digit for digit. Overflow bound:
   * |v|·2^steps·steps must fit a long — with micro-unit values up to
   * ~1e12 the default 8 steps leaves 10³ headroom.
   *
   * Ordering is (`tsCol`, `tieCol`) ascending — the tie column (an
   * event id) makes the lag sequence a total order no partitioning can
   * perturb. One window over `steps` bounded lags per row: a single
   * key-partitioned sort, state O(steps), never an event×event join.
   */
  def decayedSum(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, steps: Int = 8,
      outCol: String = "decay_sum"): DataFrame = {
    require(steps >= 1 && steps <= 62,
      s"steps must be in 1..62 (power-of-two weights in a long), got $steps")
    require(!events.columns.contains(outCol),
      s"output column `$outCol` already exists on the input")
    val integral = Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    require(integral.contains(events.schema(valueCol).dataType),
      s"`$valueCol` must be an integral type (pre-scale continuous values " +
        s"to micro-units), got ${events.schema(valueCol).dataType.simpleString}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val v = col(valueCol).cast("long")
    val terms = (0 until steps).map { j =>
      coalesce(lag(v, j).over(w), lit(0L)) * lit(1L << (steps - 1 - j))
    }
    events.withColumn(outCol, terms.reduce(_ + _))
  }
}
