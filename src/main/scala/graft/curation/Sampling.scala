package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopKSet

/**
 * Deterministic corpus sampling for training-data mixing: quota
 * (stratified top-k) selection and content-hash rate sampling. Both are
 * reproducible bit-for-bit across runs and engines — a training corpus
 * must be re-buildable, so nothing here uses `rand()`.
 */
object Sampling {

  /**
   * Quota sampling: the k best rows per stratum (source, language,
   * domain…) by a numeric score, ties broken by ascending id — "take the
   * 10k highest-quality documents per domain" of every data-mixing
   * recipe. Output: stratum columns + (rank 1..k, id, score) with rank
   * assigned in selection order.
   *
   * Shape: ONE aggregation on the stratum key with
   * [[graft.functions.BoundedTopKSet]] holding at most k elements per
   * group at every stage — partial (map-side) buffers truncate to k
   * before the shuffle, so shuffle volume is O(strata · k) regardless of
   * stratum size. The window-function equivalent
   * (`row_number().over(partitionBy(stratum))`) ships EVERY row of a
   * stratum to one task and sorts it there — a 100 TB corpus with a
   * dominant domain straggles exactly like the pre-round-4 hot-digest
   * dedup; this shape cannot.
   *
   * Ordering contract: `descending` (default) selects the LARGEST
   * scores, implemented by negating the score inside the ordering struct
   * (the aggregate keeps minima), so the score must be numeric. Rows
   * whose score or id is NULL are excluded up front — struct ordering
   * would otherwise rank them and engines disagree on null order.
   */
  def quotaTopK(
      df: DataFrame, stratumCols: Seq[String], scoreCol: String, idCol: String,
      k: Int, descending: Boolean = true): DataFrame = {
    require(stratumCols.nonEmpty, "at least one stratum column required")
    require(k >= 1, s"k must be >= 1, got $k")
    val orderScore = if (descending) negate(col(scoreCol)) else col(scoreCol)
    val elem = struct(orderScore.as("s"), col(idCol).as("id"), col(scoreCol).as("score"))
    val strata = stratumCols.map(col)
    df.where(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(strata: _*)
      .agg(BoundedTopKSet.topKSet(elem, k).as("__top"))
      .select(strata :+ posexplode(col("__top")): _*)
      .select(strata ++ Seq((col("pos") + 1).as("rank"),
        col("col.id").as(idCol), col("col.score").as(scoreCol)): _*)
  }

  /**
   * Deterministic hash-rate sampling: keep a row iff the first 4 hex
   * chars of `md5(key)` sort strictly below the stratum's threshold —
   * keep-rate = parseInt(threshold,16)/65536, granularity 1/65536 ≈
   * 0.0015%. The standard way to mix domains at fixed rates ("keep 10%
   * of CommonCrawl, 100% of books") such that every re-run, every
   * engine, and every incremental batch selects the SAME rows: the
   * decision is a pure function of row content, no RNG, no state.
   *
   * The threshold stays a STRING compared lexicographically (md5 hex is
   * fixed-width lower-case, so lexicographic == numeric) — no
   * hex-to-int conversion whose width/signedness an oracle engine could
   * disagree on. Strata missing from `thresholds` are dropped (rate 0);
   * map-only, codegen'd, zero shuffle.
   */
  def hashSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      thresholds: Map[String, String]): DataFrame = {
    require(thresholds.nonEmpty, "at least one stratum threshold required")
    require(thresholds.values.forall(_.matches("[0-9a-f]{4}")),
      s"thresholds must be 4 lower-case hex chars, got ${thresholds.values.mkString(",")}")
    val thr: Column = thresholds.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, t)) => when(col(stratumCol) === stratum, lit(t)).otherwise(acc)
    }
    df.where(substring(md5(col(keyCol).cast("binary")), 1, 4) < thr)
  }
}
