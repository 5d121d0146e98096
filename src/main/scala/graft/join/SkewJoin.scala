package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for hot keys: spread each hot key's probe rows over
 * `saltFactor` shuffle partitions by appending a salt to the join key,
 * replicating the matching build rows once per salt — the result set
 * is IDENTICAL to the plain join, but the straggler task holding a
 * hot key's entire partition becomes `saltFactor` parallel tasks.
 *
 * When to reach for this instead of AQE: adaptive execution already
 * splits skewed SORT-MERGE partitions at runtime
 * (`spark.sql.adaptive.skewJoin.enabled`) and that should be the
 * first answer for ad-hoc skew. Explicit salting is for the plans AQE
 * cannot re-shape: exchange-free layouts ([[graft.layout.Bucketed]] —
 * no shuffle stage to re-plan, a hot bucket is a hot bucket),
 * stream-static joins (no runtime re-optimization inside a
 * micro-batch), shuffle-hash joins, and pipelines that need a
 * DETERMINISTIC plan shape (a perf gate that must not flip between
 * runs on AQE's runtime statistics).
 *
 * Replication is bounded: with `hotKeys` given (a frame whose columns
 * are exactly `keys` — e.g. the output of
 * [[graft.stats.GroupStats.topValues]] above a count threshold), ONLY
 * build rows matching a hot key replicate `saltFactor`×; everything
 * else joins with salt 0 exactly as before. `hotKeys` is broadcast
 * (it is a top-k, driver-bounded by construction). Without `hotKeys`
 * the whole build side replicates — only sensible when the build side
 * is small but NOT broadcastable (e.g. it must stay partitioned for a
 * later stage).
 *
 * The left salt is `pmod(xxhash64(all left columns), saltFactor)` —
 * deterministic (same input → same plan → same task layout, and safe
 * under task retry), at the cost that byte-identical duplicate probe
 * rows share a salt; a corpus with 10M identical rows under one key
 * is a dedup problem ([[graft.dedup.Dedup]]), not a join-skew problem.
 *
 * Scale: shuffle grows by (hot build rows)·saltFactor — for a top-k
 * hot set this is k·saltFactor extra rows, noise at any scale; probe
 * rows never replicate. `joinType` supports `inner` and `left` (a
 * left row joins the single salt-matching copy of each build row, so
 * multiplicities are exactly the plain join's).
 */
object SkewJoin {

  /**
   * @param strategyHint optional join-strategy hint (`"merge"`,
   *   `"shuffle_hash"`) applied to the FINAL salted join. A hint on
   *   the input frames does not survive: the hot-key tag join consumes
   *   it, and Catalyst's size estimate of the salted build side is the
   *   pre-replication estimate — small enough that the planner may
   *   broadcast it, which silently defeats the whole point (a
   *   broadcast join has no shuffled hot partition to split). Pass
   *   `Some("merge")` when the build side might fall under the
   *   broadcast threshold's ESTIMATE but not its reality.
   */
  def salted(left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, hotKeys: Option[DataFrame] = None,
      joinType: String = "inner", strategyHint: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "at least one join key required")
    require(saltFactor >= 2, s"saltFactor must be >= 2, got $saltFactor")
    require(Seq("inner", "left").contains(joinType),
      s"joinType must be 'inner' or 'left', got '$joinType'")
    val missingL = keys.filterNot(left.columns.contains)
    val missingR = keys.filterNot(right.columns.contains)
    require(missingL.isEmpty && missingR.isEmpty,
      s"join keys missing: left ${missingL.mkString(",")} right ${missingR.mkString(",")}")
    val salt = "__salt"
    Seq(salt, "__hot").foreach { r =>
      require(!left.columns.contains(r) && !right.columns.contains(r),
        s"`$r` column name is reserved")
    }
    hotKeys.foreach { hk =>
      require(hk.columns.toSeq == keys,
        s"hotKeys columns must be exactly $keys, got ${hk.columns.toSeq}")
    }

    val isHot = hotKeys match {
      case None => lit(true)
      case Some(hk) =>
        // broadcast membership tag: null-safe false for non-members
        col("__hot").isNotNull
    }
    def tagHot(df: DataFrame): DataFrame = hotKeys match {
      case None => df
      case Some(hk) =>
        df.join(broadcast(hk.distinct().withColumn("__hot", lit(1))),
          keys, "left")
    }

    val lSalted = tagHot(left).withColumn(salt,
        when(isHot, pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor))
            .cast("int"))
          .otherwise(lit(0)))
      .drop("__hot")
    val rSalted = tagHot(right).withColumn(salt,
        when(isHot, sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0))))
      .withColumn(salt, explode(col(salt)))
      .drop("__hot")
    val (lFinal, rFinal) = strategyHint match {
      case Some(h) => (lSalted.hint(h), rSalted.hint(h))
      case None => (lSalted, rSalted)
    }
    lFinal.join(rFinal, keys :+ salt, joinType).drop(salt)
  }
}
