package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (type 2) history from a change log: given
 * observations `(key, ts, values…)`, emit one row per VALUE EPISODE —
 * consecutive observations with identical values collapse, each
 * surviving row carries `valid_from` (its first observation),
 * `valid_to` (the next episode's start; null = current) and a per-key
 * `version` number. The dimension-building pass that turns an append-
 * only crawl/CDC feed into point-in-time joinable history — the
 * natural right side of [[graft.join.AsOfJoin]] ("attach the dimension
 * state as of event time").
 *
 * Determinism: rows order by `(ts, values…)` within a key — a total
 * order, so duplicate-timestamp observations produce the same episodes
 * on every run; value comparison is null-safe (a null-to-value flip IS
 * a change). Exactly repeated (ts, values) duplicates collapse into
 * their episode.
 *
 * Scale: one keyed shuffle; the windows run per key with rows bounded
 * by that key's OBSERVATION count — fine for dimension entities (an
 * entity has bounded history). A key with 100M observations is an
 * event stream, not a dimension; aggregate it first (e.g.
 * [[graft.streaming.EventWindows]]) — the [[graft.join.AsOfJoin]]
 * hot-key discussion applies verbatim.
 */
object ChangeHistory {

  /** Per-key episode state carried between micro-batches: the OPEN
    * episode (current value, its start, version) plus the event-time
    * high-water mark for the in-order contract. */
  private[curation] case class EpisodeState(value: String, fromMicros: Long,
      version: Int, maxMicros: Long)

  private[curation] case class Obs(k: String, us: Long, v: String,
      tsw: java.sql.Timestamp)

  /** One output episode; `valid_to`/open semantics as in [[scd2]]. */
  private[curation] case class Episode(k: String, v: String, valid_from: Long,
      valid_to: Option[Long], version: Int)

  /**
   * STREAMING [[scd2]] — the same episode semantics maintained online
   * with custom state (`flatMapGroupsWithState`): closed episodes emit
   * the moment a value flip is observed; the OPEN episode lives in
   * per-key state and emits (with null `valid_to`) when the event-time
   * watermark passes `maxTs + idleTimeout` — idle keys finalize and
   * their state drops, so state size tracks ACTIVE keys, not history.
   *
   * Contract: observations must arrive per key in event-time order
   * ACROSS batches (the CDC-log guarantee this operator exists for);
   * rows at-or-before a key's high-water mark are DROPPED (within a
   * batch, rows sort by (ts, value) first, so intra-batch disorder is
   * fine). Key/value columns are compared as strings (cast on entry).
   *
   * The same call on a BATCH frame runs the identical fold per key
   * with no timeouts — emitting exactly the CLOSED episodes ([[scd2]]
   * rows with non-null `valid_to`), which is what the oracle gate
   * pins; the MemoryStream spec pins full stream-vs-batch parity
   * including timeout-emitted open episodes.
   *
   * Output: `(key, value, valid_from, valid_to, version)` — micros
   * longs (engine-comparable), valid_to null for open episodes.
   */
  def scd2Stream(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, watermark: String = "1 hour",
      idleTimeoutMicros: Long = 3600L * 1000000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(idleTimeoutMicros > 0, "idleTimeoutMicros must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val streaming = df.isStreaming
    val withWm = if (streaming) df.withWatermark(tsCol, watermark) else df
    // the watermarked event-time column must survive into the typed
    // child of FlatMapGroupsWithState (the event-time-timeout checker
    // looks for it there), so it rides along as `tsw`
    val typed = withWm.select(
        col(keyCol).cast("string").as("k"),
        unix_micros(col(tsCol)).as("us"),
        col(valueCol).cast("string").as("v"),
        col(tsCol).as("tsw") /* plain alias keeps the watermark tag */)
      .where(col("k").isNotNull && col("us").isNotNull)
      .as[Obs]

    def fold(key: String, rows: Iterator[Obs],
        state: GroupState[EpisodeState]): Iterator[Episode] = {
      if (state.hasTimedOut) {
        // idle key: finalize the open episode, drop state
        val s = state.get
        state.remove()
        return Iterator(Episode(key, s.value, s.fromMicros, None, s.version))
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[Episode]
      var cur = state.getOption
      rows.toSeq.sortBy(o => (o.us, o.v)).foreach { o =>
        cur match {
          case None =>
            cur = Some(EpisodeState(o.v, o.us, 1, o.us))
          case Some(s) if o.us < s.maxMicros =>
            () // out-of-order across batches: dropped (in-order contract)
          case Some(s) if o.v == s.value =>
            cur = Some(s.copy(maxMicros = o.us))
          case Some(s) =>
            // includes same-instant flips (sorted by (ts, value), so a
            // zero-length episode closes — exactly the batch twin's
            // (ts, value)-ordered lag semantics)
            out += Episode(key, s.value, s.fromMicros, Some(o.us), s.version)
            cur = Some(EpisodeState(o.v, o.us, s.version + 1, o.us))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // streaming only: schedule finalization once the watermark
        // passes the idle horizon (no-op without a watermark/batch)
        if (streaming)
          state.setTimeoutTimestamp((s.maxMicros + idleTimeoutMicros) / 1000L)
      }
      out.iterator
    }

    typed.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
      .toDF("k", "v", "valid_from", "valid_to", "version")
      .select(col("k").as(keyCol), col("v").as(valueCol),
        col("valid_from"), col("valid_to"), col("version").cast("long").as("version"))
  }

  def scd2(df: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column required")
    require(!valueCols.contains(keyCol) && !valueCols.contains(tsCol),
      "key/ts columns cannot also be value columns")
    val reserved = Seq("valid_from", "valid_to", "version", "__prev")
    val clash = (keyCol +: tsCol +: valueCols).filter(reserved.contains)
    require(clash.isEmpty, s"column names collide with outputs: ${clash.mkString(", ")}")
    val ord = (col(tsCol).asc +: valueCols.map(col(_).asc)).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val v = struct(valueCols.map(col): _*)
    val episodes = df
      .select((keyCol +: tsCol +: valueCols).map(col): _*)
      .withColumn("__prev", lag(v, 1).over(w))
      // null-safe: first row (null prev) and any value flip both open
      // an episode; consecutive identical values stay inside one
      .where(!(col("__prev") <=> v))
      .drop("__prev")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    episodes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select((keyCol +: valueCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version")): _*)
  }

  /**
   * Point-in-time join: attach to each fact row the dimension episode
   * that was VALID at the fact's timestamp — `history.validFrom <=
   * fact.ts` and (`validTo` null or `fact.ts < validTo`). The read
   * side of [[scd2]]: "what was this user's state when the purchase
   * happened", the canonical training-data temporal-correctness join
   * (feature values as-of label time, no leakage from the future).
   *
   * Implementation: the episode with the greatest `validFrom <= ts` is
   * exactly the BACKWARD [[graft.join.AsOfJoin]] match on `validFrom`,
   * so this composes the one-shuffle O(L+R) tagged-union as-of core —
   * never an inequality-pair join — then applies the `validTo` check
   * as a residual filter. On gapless [[scd2]] output the residual
   * passes every matched row (each episode ends where the next begins,
   * so the as-of pick is always in-validity); it exists for HISTORIES
   * WITH GAPS (e.g. episodes expired by retention), where a fact can
   * fall between episodes: `joinType="inner"` drops such facts,
   * `"left"` keeps them with null episode columns (same for facts
   * before a key's first episode or with no key match at all).
   *
   * Requirements: `keys` on both sides; every non-key history column
   * rides along as payload, so non-key names must not collide with
   * fact columns; `factTsCol` and `validFromCol`/`validToCol` must be
   * mutually comparable (same family: timestamp, date, or numeric).
   *
   * Scale: inherits the as-of contract — one shuffle of the slim
   * tagged union, per-key window state O(1); hot fact keys follow the
   * [[graft.join.AsOfJoin.asofBucketed]] discussion (point facts at a
   * dimension key are usually events — bucket them there first).
   */
  def pointInTime(facts: DataFrame, history: DataFrame, keys: Seq[String],
      factTsCol: String, validFromCol: String = "valid_from",
      validToCol: String = "valid_to", joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType),
      s"joinType must be 'inner' or 'left', got '$joinType'")
    require(history.columns.contains(validFromCol),
      s"history is missing validFrom column `$validFromCol`")
    require(history.columns.contains(validToCol),
      s"history is missing validTo column `$validToCol`")
    val payload = history.columns.filterNot(keys.contains).toSeq
    val clash = payload.filter(facts.columns.contains)
    require(clash.isEmpty,
      s"history payload columns collide with fact columns: ${clash.mkString(", ")}")
    // zero-length episodes (same-instant flips in [[scd2]]: validTo ==
    // validFrom) can never satisfy the validity predicate, but COULD
    // win the as-of tie-break at equal validFrom and wrongly shadow
    // the real episode — drop them up front. Afterwards validFrom is
    // unique per key on [[scd2]] output (two episodes sharing a start
    // would make the first zero-length); gapped user histories must
    // keep that uniqueness themselves.
    val live = history.where(
      col(validToCol).isNull || col(validToCol) > col(validFromCol))
    val joined = graft.join.AsOfJoin.asof(
      facts, live, keys, factTsCol, validFromCol, joinType, "backward")
    // residual validity: a match whose episode ENDED before the fact
    // (gapped history) is not a point-in-time hit
    val invalid = col(validToCol).isNotNull && col(factTsCol) >= col(validToCol)
    joinType match {
      case "inner" => joined.where(!invalid)
      case _ =>
        // left: keep the fact, null the episode — same shape as a
        // no-match row from the as-of left join
        joined.select(facts.columns.map(col) ++ payload.map(c =>
          when(invalid, lit(null)).otherwise(col(c)).as(c)): _*)
    }
  }
}
