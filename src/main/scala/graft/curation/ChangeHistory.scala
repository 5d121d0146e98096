package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension (type 2) history from a change log: given
 * observations `(key, ts, values…)`, emit one row per VALUE EPISODE —
 * consecutive observations with identical values collapse, each
 * surviving row carries `valid_from` (its first observation),
 * `valid_to` (the next episode's start; null = current) and a per-key
 * `version` number. The dimension-building pass that turns an append-
 * only crawl/CDC feed into point-in-time joinable history — the
 * natural right side of [[graft.join.AsOfJoin]] ("attach the dimension
 * state as of event time").
 *
 * Determinism: rows order by `(ts, values…)` within a key — a total
 * order, so duplicate-timestamp observations produce the same episodes
 * on every run; value comparison is null-safe (a null-to-value flip IS
 * a change). Exactly repeated (ts, values) duplicates collapse into
 * their episode.
 *
 * Scale: one keyed shuffle; the windows run per key with rows bounded
 * by that key's OBSERVATION count — fine for dimension entities (an
 * entity has bounded history). A key with 100M observations is an
 * event stream, not a dimension; aggregate it first (e.g.
 * [[graft.streaming.EventWindows]]) — the [[graft.join.AsOfJoin]]
 * hot-key discussion applies verbatim.
 */
object ChangeHistory {

  def scd2(df: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column required")
    require(!valueCols.contains(keyCol) && !valueCols.contains(tsCol),
      "key/ts columns cannot also be value columns")
    val reserved = Seq("valid_from", "valid_to", "version", "__prev")
    val clash = (keyCol +: tsCol +: valueCols).filter(reserved.contains)
    require(clash.isEmpty, s"column names collide with outputs: ${clash.mkString(", ")}")
    val ord = (col(tsCol).asc +: valueCols.map(col(_).asc)).toSeq
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val v = struct(valueCols.map(col): _*)
    val episodes = df
      .select((keyCol +: tsCol +: valueCols).map(col): _*)
      .withColumn("__prev", lag(v, 1).over(w))
      // null-safe: first row (null prev) and any value flip both open
      // an episode; consecutive identical values stay inside one
      .where(!(col("__prev") <=> v))
      .drop("__prev")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    episodes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select((keyCol +: valueCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version")): _*)
  }
}
