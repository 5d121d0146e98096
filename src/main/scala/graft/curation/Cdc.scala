package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC merge-apply: produce the next corpus snapshot from the current
 * one plus a change log of upserts and deletes — the lakehouse MERGE
 * INTO, as one declarative plan. The write side of the incremental
 * family ([[SnapshotDiff]] derives a change log from two snapshots;
 * this applies one; [[ChangeHistory]] keeps every version instead of
 * the latest).
 *
 * Semantics (last-writer-wins): per key, the change with the greatest
 * `(ts, op, payload…)` — a TOTAL order, so duplicate-timestamp logs
 * resolve identically on every run (the [[ChangeHistory.scd2]]
 * determinism contract). Ties break by the op STRING descending —
 * `'upsert' > 'delete'` lexicographically, so an upsert beats a
 * delete at the exact same instant — then payload descending. Winner
 * `upsert` → the key holds the change's payload; winner `delete` →
 * the key is gone; keys untouched by the log pass through. Upserts
 * of keys absent from the snapshot INSERT. Rows whose op is neither
 * `upsert` nor `delete` are ignored (filtered before the window).
 *
 * Scale: one keyed window over the CHANGE LOG (rows bounded per key
 * by that key's changes — logs are delta-sized, orders of magnitude
 * under the snapshot), then one equi-join of the snapshot against
 * the delta-sized winner set (broadcastable whenever the delta is —
 * Catalyst's call) plus a winner-side anti-join for inserts. The
 * snapshot is never windowed and never shuffled beyond the join.
 *
 * @param snapshot current state: `keys` ++ payload columns
 * @param changes  change log: `keys` ++ `tsCol` ++ `opCol`
 *                 ('upsert' | 'delete') ++ the SAME payload columns
 *                 (ignored for deletes)
 * @return the next snapshot, schema identical to `snapshot`
 */
object Cdc {

  def applyLog(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
      tsCol: String, opCol: String): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val payload = snapshot.columns.filterNot(keys.contains).toSeq
    val missingK = keys.filterNot(changes.columns.contains)
    val missingP = (payload :+ tsCol :+ opCol).filterNot(changes.columns.contains)
    require(missingK.isEmpty && missingP.isEmpty,
      s"changes is missing columns: ${(missingK ++ missingP).mkString(", ")}")
    require(!snapshot.columns.contains(tsCol) && !snapshot.columns.contains(opCol),
      s"snapshot must not carry `$tsCol`/`$opCol`")
    val reserved = Seq("__rn", "__op") ++ payload.map(c => s"__w_$c")
    val clash = (snapshot.columns ++ Seq(tsCol, opCol)).filter(reserved.contains)
    require(clash.isEmpty, s"reserved column names in use: ${clash.mkString(", ")}")

    // last-writer-wins over the total order (ts, op, payload…) desc
    val ord = (col(tsCol).desc +: col(opCol).desc +: payload.map(col(_).desc))
    val winners = changes
      .where(col(opCol).isin("upsert", "delete"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)))
      .where(col("__rn") === 1)
      .select((keys ++ payload :+ opCol).map(col): _*)

    val keptOrReplaced = snapshot
      .join(winners.withColumnRenamed(opCol, "__op")
          .select((keys :+ "__op").map(col) ++
            payload.map(c => col(c).as(s"__w_$c")): _*),
        keys, "left")
      .where(col("__op").isNull || col("__op") === "upsert")
      .select(keys.map(col) ++ payload.map(c =>
        when(col("__op") === "upsert", col(s"__w_$c")).otherwise(col(c)).as(c)): _*)

    val inserts = winners.where(col(opCol) === "upsert")
      .join(snapshot.select(keys.map(col): _*), keys, "left_anti")
      .select((keys ++ payload).map(col): _*)

    keptOrReplaced.unionByName(inserts)
  }
}
