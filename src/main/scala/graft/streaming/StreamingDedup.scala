package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming deduplication — the online counterpart of
 * [[graft.dedup.Dedup]]'s batch operators, for ingest pipelines that
 * must drop repeats before they ever land in the lake.
 *
 * Scale design (the state store is the bottleneck, not the stream):
 *  - state is keyed by the 16-byte md5 content digest, never the text —
 *    a billion distinct documents is ~16 GB of state keys spread over
 *    the shuffle partitions, independent of document size;
 *  - eviction is watermark-driven (`dropDuplicatesWithinWatermark`):
 *    a digest older than the watermark delay is forgotten, so state is
 *    bounded by the distinct-digest arrival rate times the window, not
 *    by stream lifetime. Exact global dedup over an unbounded stream is
 *    impossible in bounded memory — the watermark IS the contract;
 *  - the same call works on a batch DataFrame (Spark executes it as a
 *    plain dropDuplicates on the digest), keeping batch/stream parity
 *    testable with one oracle.
 */
object StreamingDedup {

  /**
   * Keep the first event per exact text content within the watermark
   * horizon; later arrivals with the same digest are dropped. Output
   * schema = input schema (the internal digest column is dropped).
   *
   * @param tsCol     event-time column the watermark rides on
   * @param watermark late-data bound AND dedup memory horizon, e.g.
   *                  "10 minutes": a duplicate arriving later than this
   *                  after the original may be emitted again
   *
   * CHECKPOINT COMPATIBILITY: the streaming state key changed from the
   * 32-char md5 HEX string to the 16-byte binary digest (unhex) in
   * v0.1.0 — a streaming query restarted from a pre-change checkpoint
   * fails state schema validation (string vs binary key) rather than
   * silently re-admitting duplicates; restart such queries with a fresh
   * checkpoint (the watermark horizon bounds the re-dedup exposure to
   * one window). Future key changes follow the same contract: break
   * loudly at restart, never degrade silently.
   */
  def firstPerContent(df: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame = {
    val digest = "__dedup_digest"
    // unhex: the state/shuffle key is the true 16-byte binary digest,
    // not the 32-char hex rendering
    val withDigest = df.withColumn(digest, unhex(md5(col(textCol).cast("binary"))))
    if (df.isStreaming)
      withDigest.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(digest)
        .drop(digest)
    else {
      // batch: deterministic "first" — min event time per digest, ties
      // by the remaining columns (a stream delivers arrival order; a
      // batch table has none, so the order must be declared to be
      // oracle-able). Shape: groupBy(digest).agg(min(struct(ts, rest)))
      // — the lexicographic struct minimum IS the declared tie order,
      // and partial (map-side) aggregation collapses a hot digest to one
      // row per map task before the single shuffle. The previous
      // row_number-over-window form sent every copy of a duplicate
      // cluster to ONE task and sorted it there — the skew-prone shape
      // Dedup.exactCanon also moved off (see DedupSkewSpec).
      val ordCols = col(tsCol) +: df.columns.filterNot(_ == tsCol).map(col)
      val first = "__dedup_first"
      withDigest.groupBy(col(digest))
        .agg(min(struct(ordCols: _*)).as(first))
        .select(df.columns.map(c => col(s"$first.`$c`")): _*)
    }
  }

  /**
   * [[firstPerContent]] with the dedup key NORMALIZED first
   * ([[graft.text.TextFunctions.normalizeText]] — the C4/CCNet
   * lowercase/punctuation/whitespace collapse): case and punctuation
   * variants of the same document dedup to ONE survivor at ingest
   * time, the streaming twin of [[graft.dedup.Dedup.exactCanonNormalized]].
   * Same watermark/state/checkpoint contract as [[firstPerContent]]
   * (state key = 16-byte digest of the NORMALIZED text); the emitted
   * row keeps its ORIGINAL text — normalization is a keying device,
   * never a mutation.
   */
  def firstPerNormalized(df: DataFrame, textCol: String = "text",
      tsCol: String = "ts", watermark: String = "10 minutes"): DataFrame = {
    val digest = "__dedup_digest"
    val withDigest = df.withColumn(digest,
      unhex(md5(graft.text.TextFunctions.normalizeText(col(textCol))
        .cast("binary"))))
    if (df.isStreaming)
      withDigest.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(digest)
        .drop(digest)
    else {
      val ordCols = col(tsCol) +: df.columns.filterNot(_ == tsCol).map(col)
      val first = "__dedup_first"
      withDigest.groupBy(col(digest))
        .agg(min(struct(ordCols: _*)).as(first))
        .select(df.columns.map(c => col(s"$first.`$c`")): _*)
    }
  }
}
