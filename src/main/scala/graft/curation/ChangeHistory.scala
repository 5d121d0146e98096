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
}
