package graft.link

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Blocking-based record linkage (entity resolution): candidate pairs are
 * generated ONLY within caller-defined blocks, then scored with exact
 * edit distance — the classic blocking/match decomposition that replaces
 * the all-pairs O(N²) comparison with per-block quadratic work bounded
 * by the blocking key's fan-out.
 *
 * Scale notes (100 TB): the candidate stage is a plain equi-join on the
 * block key — one shuffle of (id, name, key) triples, AQE
 * broadcast/skew rules apply. A pathological block (every record keyed
 * "unknown") is the classic linkage failure mode; `maxBlock` drops
 * blocks above a size cap BEFORE the self-join (two map-side-combined
 * aggregations over keys — negligible vs the join) so a single hot key
 * cannot go quadratic. Real deployments compose multiple block passes
 * (first-token, phonetic, sorted-neighborhood) and union the pair sets;
 * each pass is this same operator with a different `blockKey` column.
 */
object RecordLinkage {

  /**
   * All within-block pairs (id_i < id_j) whose names are within
   * `maxDist` Levenshtein edits. Output: `(id_i, id_j, dist)` — dist is
   * the exact unweighted edit distance (integer, engine-reproducible).
   *
   * @param blockKey blocking expression over the input's columns (e.g.
   *        `split(col("name"), " ")(0)`, a phonetic code, a sorted
   *        n-gram key). Null block keys never pair (equi-join semantics).
   * @param maxBlock if set, blocks with more than this many records are
   *        dropped before pairing (skew guard; exact recall requires it
   *        unset — same contract as `Dedup.jaccardPairs(maxDocFreq)`).
   */
  def blockedPairs(
      df: DataFrame, idCol: String, nameCol: String, blockKey: Column,
      maxDist: Int, maxBlock: Option[Int] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df.select(col(idCol).as("__id"), col(nameCol).as("__name"),
      blockKey.as("__bk"))
    val blocked = maxBlock match {
      case None => base
      case Some(cap) =>
        require(cap >= 1, s"maxBlock must be >= 1, got $cap")
        val sizes = base.groupBy(col("__bk"))
          .agg(count(lit(1)).as("__bn"))
          .where(col("__bn") <= cap)
          .select(col("__bk"))
        base.join(sizes, Seq("__bk"))
    }
    val a = blocked.select(col("__bk"), col("__id").as("id_i"), col("__name").as("__na"))
    val b = blocked.select(col("__bk"), col("__id").as("id_j"), col("__name").as("__nb"))
    a.join(b, Seq("__bk"))
      .where(col("id_i") < col("id_j"))
      // threshold-form levenshtein: abandons a pair's DP early once the
      // running distance exceeds maxDist (returns -1 past the bound, the
      // exact distance otherwise) — O(maxDist·len) per pair instead of
      // O(len²), evaluated once for both filter and output
      .withColumn("dist", levenshtein(col("__na"), col("__nb"), maxDist))
      .where(col("dist") >= 0)
      .select(col("id_i"), col("id_j"), col("dist"))
  }
}
