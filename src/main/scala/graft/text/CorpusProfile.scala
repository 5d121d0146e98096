package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-language corpus report — the "what is in this crawl" summary every
 * curation run starts from: document counts, token totals, and
 * token-count quantiles per predicted language.
 *
 * Quantiles are EXPLICIT-RANK order statistics over a HISTOGRAM, not a
 * per-document sort: `p_q` = the smallest token count `n` whose
 * cumulative document count reaches `ceil(q · n_docs)` (integer
 * ceil-division — exact and engine-identical, no floating-point rank).
 *
 * Scale shape (100 TB): the only per-document work is one map-side
 * tokenize+count; everything after is keyed by (language, DISTINCT
 * token count) — the histogram aggregation combines map-side to at most
 * |langs| · |distinct lengths| rows, and the cumulative-sum window runs
 * over those histogram rows, never documents. A per-doc
 * `percentile`/sort-window formulation would put an entire language's
 * documents in one task (the straggler shape [[graft.dedup.Dedup]] and
 * the as-of join deliberately avoid); this one's window partitions are
 * bounded by the distinct-length count (~max document length), which is
 * independent of corpus size.
 */
object CorpusProfile {

  /** Rank test `cum >= ceil(num/den)` rewritten division-free as
    * `den·cum >= num` (integers; equivalent because cum is integral) —
    * no doubles or integer-division dialect anywhere near the rank. */
  private def reachesRank(cum: Column, num: Column, den: Int): Column =
    cum * lit(den.toLong) >= num

  /**
   * One row per predicted language:
   * (lang_pred, n_docs, total_tokens, max_tokens, p50_tokens,
   * p90_tokens). Documents with no tokens count toward their language
   * ("und") with n = 0.
   */
  def profile(df: DataFrame, textCol: String): DataFrame = {
    val t = df.select(TextFunctions.tokens(col(textCol)).as("ws"))
      .select(TextFunctions.langId(col("ws")).as("lang_pred"),
        TextFunctions.tokenCount(col("ws")).as("n"))
    val hist = t.groupBy(col("lang_pred"), col("n")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang_pred")).orderBy(col("n"))
    val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
    val totals = hist.groupBy(col("lang_pred")).agg(
      sum(col("cnt")).as("n_docs"),
      sum(col("n") * col("cnt")).as("total_tokens"),
      max(col("n")).as("max_tokens"))
    cum.join(totals, "lang_pred")
      .groupBy(col("lang_pred"), col("n_docs"), col("total_tokens"), col("max_tokens"))
      .agg(
        min(when(reachesRank(col("cum"), col("n_docs"), 2), col("n"))).as("p50_tokens"),
        min(when(reachesRank(col("cum"), col("n_docs") * 9, 10), col("n"))).as("p90_tokens"))
      .select("lang_pred", "n_docs", "total_tokens", "max_tokens", "p50_tokens", "p90_tokens")
  }
}
