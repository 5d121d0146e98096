package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus snapshot diff: which documents were ADDED, REMOVED or CHANGED
 * between two corpus versions — the bookkeeping pass an incrementally
 * refreshed training corpus runs before routing only the delta through
 * dedup/decontamination/scoring ([[graft.dedup.Dedup.minhashPairsVsIndex]]
 * consumes exactly the `added`/`changed` slice this emits).
 *
 * Output: `(id, status)` with status in {added, removed, changed};
 * UNCHANGED rows are dropped — at 100 TB the unchanged set is nearly
 * the whole corpus, and emitting it would make a metadata pass
 * output-bound. Row identity is `idCol` (the contract requires ids
 * unique within each snapshot — crawl record ids, URL digests);
 * content identity is the md5 of `textCol`, so the shuffle carries
 * 16-byte digests, never text payloads. Null text digests to a
 * sentinel distinct from every real md5, so a null-text row is
 * present (and can "change" to/from real text) rather than invisible.
 *
 * Plan: one digest projection per side + a single full-outer equi-join
 * on id — two id-keyed shuffles of slim rows, AQE-splittable, no
 * broadcast requirement on either side. 100 TB-safe by construction.
 */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // never-null for a present row: absent side <=> null digest
    def digest = coalesce(
      unhex(md5(col(textCol).cast("binary"))), lit(Array.emptyByteArray))
    val o = oldSnap.select(col(idCol).as("id"), digest.as("od"))
    val n = newSnap.select(col(idCol).as("id"), digest.as("nd"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("od").isNull, lit("added"))
          .when(col("nd").isNull, lit("removed"))
          .when(col("od") =!= col("nd"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .where(col("status") =!= "unchanged")
  }

  /** Driver-friendly rollup of [[diff]]: one row per status with its
    * count — the monitoring number a refresh pipeline alerts on.
    * Aggregates the slim diff rows; never wider than 3 rows. */
  def diffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame =
    diff(oldSnap, newSnap, idCol, textCol)
      .groupBy("status").agg(count(lit(1)).as("n"))
}
