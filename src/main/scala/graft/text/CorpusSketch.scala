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

  private def cmsBucket(salt: Column, term: Column, width: Int): Column =
    pmod(graft.functions.Md5Lower64.md5Lower64(
      concat_ws("|", salt.cast("string"), term)), lit(width.toLong))

  /**
   * Count-min sketch of corpus token frequencies (Cormode & Muthukrishnan
   * 2005): `depth` hash rows × `width` buckets, each counter the total
   * count of tokens hashing to it — `(r, bucket, cnt)`, depth·width rows
   * REGARDLESS of corpus size. The point-frequency companion to the HLL
   * [[sketch]]: HLL answers "how many distinct", CMS answers "about how
   * often is THIS one" for any term decided at query time, without the
   * distinct-token-keyed shuffle an exact count pays. Estimates
   * ([[cmsEstimate]]) never undercount; overcount <= e/width · N with
   * probability 1 − exp(−depth) per query.
   *
   * `width` must be a power of two: the row hash is
   * `md5_lower64(salt | token) pmod width`, which an external engine
   * replays exactly as `md5_number_lower(...) % width` (2^64 ≡ 0 mod
   * width cancels the signed reinterpretation) — the sketch, like the
   * HLL report, is hash-based with no RNG, so the same corpus yields
   * the SAME counters on every run and any partitioning.
   *
   * Plan: tokens explode ×depth (map-side), one map-side-combined
   * aggregation whose key space is depth·width — the only shuffle moves
   * at most depth·width·partitions partial rows, never corpus-sized.
   */
  def cmsBuild(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two for engine-exact replay, got $width")
    df.select(explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .select(explode(sequence(lit(0), lit(depth - 1))).as("r"), col("__tok"))
      .groupBy(col("r"), cmsBucket(col("r"), col("__tok"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Point-frequency estimates for probe terms against a [[cmsBuild]]
   * sketch: `(term, est)` with est = min over hash rows of the counter
   * the term lands in (an untouched bucket counts 0). The sketch side
   * is depth·width rows — broadcast by construction; the probe side
   * explodes ×depth and aggregates per term. `depth`/`width` must be
   * the build's (width is re-validated; a mismatched depth surfaces as
   * missing rows => 0-floored estimates, never an exception — pass the
   * build's parameters).
   */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, termCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two for engine-exact replay, got $width")
    probes
      .select(col(termCol).as("term"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", cmsBucket(col("r"), col("term"), width))
      .join(broadcast(sketch), Seq("r", "bucket"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
