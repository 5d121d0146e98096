package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Windowed trending n-grams: per tumbling event-time window, the
 * document frequency of every word n-gram that clears `minDf` — the
 * ingest-time trend/burst monitor ("which phrases exploded this
 * hour") and the windowed twin of
 * [[graft.text.TextFunctions.hotPhrases]] (which ranks per stratum,
 * corpus-wide).
 *
 * Batch/stream unified (the [[EventWindows]] discipline): the same
 * call on a streaming frame adds the watermark and runs as ONE
 * stateful aggregation in append mode — windows emit when the
 * watermark passes, state is bounded by open windows × distinct
 * grams. DISTINCT-per-doc grams come from the codegen'd
 * [[graft.functions.WordShingles]] kernel MAP-SIDE (df semantics
 * without a distinct aggregate — streaming forbids those), so the
 * only shuffled rows are (window, gram) partials.
 *
 * The top-k rank is deliberately NOT fused here: a second stateful
 * rank over a streaming aggregate is where Spark's
 * multiple-stateful-operator support gets subtle; downstream batch
 * consumers rank the emitted counts ([[graft.stats.GroupStats
 * .topValues]] / `quotaTopK`) — and the gate's oracle replays the
 * count contract exactly.
 *
 * Output: `(w_start, w_end, gram, df)` — timestamps of the tumbling
 * window (epoch-aligned), df >= minDf.
 */
object Trending {

  def gramWindows(df: DataFrame, tsCol: String, textCol: String, n: Int,
      windowDur: String = "1 minute", minDf: Long = 2,
      watermark: String = "1 minute"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val withWm = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    withWm
      .select(window(col(tsCol), windowDur).as("__w"),
        explode(graft.functions.WordShingles.wordShingles(col(textCol), n))
          .as("gram"))
      .groupBy(col("__w"), col("gram"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .select(col("__w.start").as("w_start"), col("__w.end").as("w_end"),
        col("gram"), col("df"))
  }
}
