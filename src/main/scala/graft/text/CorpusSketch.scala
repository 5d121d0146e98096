package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sketch-based corpus statistics — the CHEAP first pass a 100 TB
 * curation run makes before committing to exact operators: per stratum
 * (source, language, shard …), approximate distinct-content and
 * distinct-token counts via HyperLogLog++
 * (`approx_count_distinct`, Heule et al. 2013 as implemented by Spark),
 * next to exact row counts and token totals.
 *
 * Why sketches first: an exact distinct-token count over 100 TB keys a
 * shuffle by every distinct token; the HLL sketch is a FIXED-SIZE state
 * (~`1.04/rsd²` registers) per stratum that combines map-side — the
 * whole report is one pass over the corpus plus one over the exploded
 * tokens, shuffling only |strata| sketch states. The numbers answer the
 * questions that decide the expensive plan: dedup ratio estimate
 * (`n_docs / distinct content`), vocabulary size (BPE/LM table sizing),
 * per-stratum skew (mixture weights) — each within the configured
 * relative standard deviation, which is all those decisions need.
 *
 * Determinism: Spark's HLL++ is hash-based with no RNG — the same input
 * yields the same estimate on every run and any partitioning (register
 * merges commute), so gate rows can pin the estimate's ERROR BOUND
 * against an exact oracle (the `profile_sketch` gate emits exact counts
 * plus a within-bound boolean per sketch; a drifting estimate flips the
 * boolean and fails the hash compare).
 *
 * Reference: vasnake SpatialJoinTransformer has no profiling surface —
 * extension; no reference behavior cited.
 */
object CorpusSketch {

  /**
   * One row per stratum:
   * (strata..., n_docs, approx_distinct_content, total_tokens,
   * approx_distinct_tokens). Content identity is md5(text) — the
   * [[TextFunctions.md5Fingerprint]] convention. `rsd` is the HLL++
   * target relative standard deviation (Spark default 0.05).
   *
   * Two aggregations (documents; exploded tokens) joined on the
   * strata key — the join touches |strata| rows, never data.
   */
  def sketch(df: DataFrame, strata: Seq[String], textCol: String,
      rsd: Double = 0.05): DataFrame = {
    require(strata.nonEmpty, "at least one stratum column required")
    val g = strata.map(col)
    val docs = df.groupBy(g: _*).agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(md5(col(textCol).cast("binary")), rsd)
        .as("approx_distinct_content"))
    val toks = df
      .select(g :+ explode(TextFunctions.tokens(col(textCol))).as("__tok"): _*)
      .groupBy(g: _*).agg(
        count(lit(1)).as("total_tokens"),
        approx_count_distinct(col("__tok"), rsd).as("approx_distinct_tokens"))
    // left join: a stratum whose documents are all token-less still
    // reports (with 0 totals)
    docs.join(toks, strata, "left")
      .select(g ++ Seq(col("n_docs"), col("approx_distinct_content"),
        coalesce(col("total_tokens"), lit(0L)).as("total_tokens"),
        coalesce(col("approx_distinct_tokens"), lit(0L)).as("approx_distinct_tokens")): _*)
  }

  /** |approx − exact| <= `tol` · exact (exact = 0 demands approx = 0) —
    * the bound the gate row pins per sketch column. */
  def withinBound(approx: Column, exact: Column, tol: Double): Column =
    abs(approx - exact) <= exact * tol
}
