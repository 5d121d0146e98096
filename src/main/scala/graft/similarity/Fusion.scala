package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Reciprocal-rank fusion (RRF) of N independently ranked retrieval
 * lists — the standard way to combine sparse ([[graft.text.Bm25]]) and
 * dense ([[Similarity]] / IVF / PQ) retrieval into one hybrid ranking
 * for targeted data selection: score(q, d) = Σ_lists 1/(k₀ + rank_l(d)),
 * robust to the two scorers living on incomparable scales (Cormack,
 * Clarke & Buettcher, SIGIR 2009).
 *
 * Determinism contract: each list contributes the INTEGER
 * `unit div (rrfK + rank)` (default 1e6-unit fixed point), the fused
 * score is the exact integer sum — order-free under any partitioning —
 * and the final cut ranks by (rrf_unit desc, id asc), so no
 * double-comparison boundary exists anywhere. Two engines replaying
 * the same input ranks produce bit-identical fusions.
 *
 * Scale shape: inputs are already-cut top-k lists (O(queries · k) rows
 * each — the expensive retrieval happened upstream with its own bounded
 * shuffles), so fusion is a union + one map-side-combined integer sum +
 * an O(k)-state [[graft.functions.BoundedTopKSet]] cut: every exchange
 * in this operator is O(queries · k · lists), independent of corpus
 * size. Nothing here ever touches the corpus again.
 */
object Fusion {

  /** Fuse ranked lists. Every input frame must carry (qidCol, idCol,
    * rankCol) with rank 1-based within each qid; duplicate (qid, id)
    * pairs WITHIN one list would double-count (the retrieval contract —
    * top-k lists are per-query unique). Output: (qidCol, idCol,
    * rrf_unit, rnk 1..k) — `rrf_unit` is the fused score in
    * `unit⁻¹` fixed-point units. */
  def rrf(lists: Seq[DataFrame], qidCol: String, idCol: String,
      rankCol: String, k: Int, rrfK: Long = 60L,
      unit: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list required")
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    require(unit >= 1, s"unit must be >= 1, got $unit")
    val slim = lists.map(_.select(
      col(qidCol), col(idCol),
      expr(s"${unit}L div (${rrfK}L + cast($rankCol as bigint))").as("__c")))
    // (qid, id) is unique after the sum, so the bounded top-k cut is
    // the only ranking step: (rrf_unit desc, id asc), O(k) state
    val fused = slim.reduce(_ unionByName _)
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__c")).as("rrf_unit"))
    graft.curation.Sampling
      .quotaTopK(fused, Seq(qidCol), "rrf_unit", idCol, k)
      .select(col(qidCol), col(idCol), col("rrf_unit"),
        col("rank").cast("long").as("rnk"))
  }
}
