package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.RunDigests.runDigests

/**
 * Streaming benchmark decontamination — the online counterpart of
 * [[graft.dedup.Dedup.decontaminate]]: flag incoming documents that
 * share a verbatim k-token run with a STATIC benchmark/eval corpus,
 * before they land in the lake. The emitted stream is the QUARANTINE
 * feed (one row per contaminated document, original columns); routing
 * it to review/alerting is the caller's sink. The exhaustive clean/
 * dirty split with hit counts and span lengths stays a batch concern
 * (`Dedup.decontaminate` + anti-join) — stream-stream anti-joins of a
 * stream against its own flagged subset are not expressible, and an
 * ingest pipeline wants the flag at ingest time, not the statistics.
 *
 * Scale design, mirroring [[StreamingDedup]]:
 *  - the benchmark collapses to DISTINCT 16-byte run digests on the
 *    STATIC side of a broadcast stream-static semi-join — each
 *    micro-batch probes the broadcast hash set map-side, no shuffle of
 *    stream data (cache the benchmark DataFrame if per-batch digest
 *    recompute matters; the digest set itself is MBs);
 *  - window digests come from the codegen'd
 *    [[graft.functions.RunDigests]] loop, exploded only INTO the
 *    semi-join; a document with many matching windows survives the
 *    semi join once per matched window and collapses in the digest
 *    dedup, so the emitted stream is one row per contaminated content;
 *  - state exists only for watermark-bounded dedup of the flag stream
 *    (`dropDuplicatesWithinWatermark` on the 16-byte content digest):
 *    ONLY contaminated documents — the rare case — ever enter state, a
 *    re-crawled contaminated page within the horizon is flagged once.
 *
 * The same call works on a batch DataFrame (plain dropDuplicates on
 * the digest), keeping batch/stream parity testable with one oracle.
 */
object StreamingDecontam {

  /**
   * Documents of `df` sharing at least one verbatim k-token run with
   * `bench`, one row per distinct content within the watermark horizon.
   * Output schema = input schema.
   *
   * @param bench     STATIC benchmark corpus (must not be a stream)
   * @param k         run length in tokens; spans shorter than k are
   *                  invisible — match the batch pass's k
   * @param watermark late-data bound and flag-dedup memory horizon
   *                  (ignored on batch input)
   */
  def contaminated(df: DataFrame, bench: DataFrame, textCol: String = "text",
      benchTextCol: String = "text", tsCol: String = "ts",
      k: Int = 40, watermark: String = "10 minutes"): DataFrame = {
    require(k >= 2, s"window size k must be >= 2, got $k")
    require(!bench.isStreaming, "the benchmark side must be static")
    val digest = "__decontam_digest"
    val benchD = broadcast(
      bench.select(explode(runDigests(col(benchTextCol), k)).as("__h")).distinct())
    val flagged = df
      .withColumn(digest, unhex(md5(col(textCol).cast("binary"))))
      .withColumn("__h", explode(runDigests(col(textCol), k)))
      .join(benchD, Seq("__h"), "left_semi")
    if (df.isStreaming)
      flagged.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(digest)
        .drop(digest, "__h")
    else flagged.dropDuplicates(digest).drop(digest, "__h")
  }
}
