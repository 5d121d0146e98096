package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-shard export assignment — the last step of a curation
 * pipeline: the curated corpus must land as `numShards` files whose
 * TOKEN mass (not row count) is near-equal, so that downstream data
 * loaders stream shards round-robin without one shard starving the
 * batch mix. Reference scope: the spatial-join transformer has no
 * export layer; this extends the training-data-pipeline surface like
 * the dedup/sampling families.
 *
 * Semantics (documented contract, integer-exact): rows are laid out in
 * ascending `idCol` order; with `start(row)` = the total weight of all
 * EARLIER rows, `shard = (start · numShards) div totalWeight` — the
 * contiguous weight-quantile cut. Each shard's mass is within one
 * document of total/numShards (a document is never split; pair with
 * [[graft.text.TextFunctions.packSequencesBy]] when intra-document
 * splitting is wanted), ids inside a shard are contiguous, and the
 * whole assignment is a pure function of (ids, weights) — two engines
 * replay it digit for digit, which is what makes the export auditable.
 * `shard` is always < numShards (start < total ⇒ start·n div total
 * ≤ n−1). Weights must be non-negative and non-null — enforced with an
 * in-plan raise_error (a negative weight silently corrupts every later
 * shard boundary); an all-zero / empty frame lands everything in
 * shard 0.
 *
 * Scale shape (the 100 TB lens): NO global sort and NO corpus-sized
 * single window. The prefix sum is two-level, the
 * [[graft.text.TextFunctions.packSequences]] discipline: rows get a
 * coarse group from their id range (`targetGroups` buckets), the
 * per-group cumsum window shuffles only by group (parallel across
 * groups), and group OFFSETS come from one tiny window over
 * ≤ targetGroups total rows broadcast back. Per-row cost is one
 * group-keyed exchange of slim (id, weight) rows — ∝ corpus, never
 * quadratic, no driver collect beyond a 3-value stats row.
 *
 * The companion [[manifest]] is the per-shard audit aggregate
 * (row count, weight sum) the export job should persist next to the
 * data; writing the shards themselves is
 * `assign(...).repartition(numShards, col("shard")).write...` —
 * partition i holds exactly the rows of shard i when numShards
 * partitions are keyed by the shard id.
 */
object Shards {

  /** Assign every row a shard in `[0, numShards)`, weight-balanced and
    * id-contiguous. Output: (idCol, weight, shard) — `weight` is the
    * long-cast weight column, `shard` the assignment. Ids must cast
    * losslessly to long (the group-span trick needs numeric ids, like
    * [[graft.text.TextFunctions.packSequences]]) and must be UNIQUE:
    * a duplicated id makes the cumsum order — and therefore the two
    * duplicates' shards — tie-broken arbitrarily. */
  def assign(df: DataFrame, idCol: String, weightCol: String,
      numShards: Int, targetGroups: Int = 4096): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(targetGroups >= 1, s"targetGroups must be >= 1, got $targetGroups")
    val w = when(col(weightCol).isNull || col(weightCol) < 0,
      raise_error(concat(
        lit(s"Shards.assign: `$weightCol` must be non-negative and " +
          "non-null, got "),
        coalesce(col(weightCol).cast("string"), lit("NULL")),
        lit(" at id "),
        coalesce(col(idCol).cast("string"), lit("NULL")))))
      .otherwise(col(weightCol).cast("long"))
    val t = df.select(col(idCol).cast("long").as("__id"), w.as("weight"))
    // one bounded 4-value stats collect (the packSequences discipline);
    // this pass also evaluates the weight guard corpus-wide, so a bad
    // weight fails HERE, before any assignment is emitted
    val stats = t.agg(min(col("__id")), max(col("__id")), count(lit(1)),
      sum(col("weight"))).head()
    if (stats.getLong(2) == 0L)
      return df.sparkSession.emptyDataFrame
        .select(lit(0L).as(idCol), lit(0L).as("weight"),
          lit(0L).as("shard")).limit(0)
    val total = stats.getLong(3)
    require(total <= Long.MaxValue / math.max(numShards, 1),
      s"Shards.assign: total weight $total * $numShards shards would " +
        "overflow long — shard in larger weight units")
    val span = math.max(1L,
      (stats.getLong(1) - stats.getLong(0) + 1) / math.max(targetGroups, 1))
    val g = t.withColumn("__g",
      floor((col("__id") - stats.getLong(0)) / span).cast("long"))
    val wLocal = Window.partitionBy(col("__g")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = g.withColumn("__cum",
      coalesce(sum(col("weight")).over(wLocal), lit(0L)))
    // ≤ targetGroups rows through one tiny window; the non-foldable
    // constant partition key keeps WindowExec off its global
    // no-partition path (the packSequences / q_topk_orders convention)
    val wPrefix = Window.partitionBy(pmod(col("__g"), lit(1)).cast("long"))
      .orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = g.groupBy(col("__g")).agg(sum(col("weight")).as("__gsum"))
      .withColumn("__off", coalesce(sum(col("__gsum")).over(wPrefix), lit(0L)))
      .select(col("__g"), col("__off"))
    local.join(broadcast(offsets), "__g")
      .select(col("__id").as(idCol), col("weight"),
        (if (total > 0)
          expr(s"((__off + __cum) * ${numShards}L) div ${total}L")
        else lit(0L)).as("shard"))
  }

  /** The per-shard audit row: (shard, n_rows, weight_sum) — persist it
    * next to the export; `weight_sum` spread is bounded by
    * total/numShards ± the largest single document. */
  def manifest(assigned: DataFrame): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("weight")).as("weight_sum"))

  /** What a shard export wrote: shard directories found, data files
    * written (== shards when every shard landed in one file), rows. */
  final case class ShardWriteStats(shards: Int, dataFiles: Int, rows: Long)

  /**
   * Land an [[assign]] output (or any frame carrying a `shard`
   * column) as ONE parquet file per shard under `path/shard=<i>/` —
   * the physical layout a training data loader streams. The device:
   * `repartition(numShards, shard)` colocates each shard's rows in
   * exactly one task (every row of a shard has the same hash), and
   * `partitionBy("shard")` splits a task that received two
   * hash-colliding shards into separate directories — so each shard
   * directory holds exactly one file regardless of collisions, with
   * NO global sort and no per-shard sequential write.
   *
   * The write is `overwrite` into `path` (a fresh export location —
   * pair with [[graft.layout.Compact.vacuum]] to retire superseded
   * exports). Returns counted-on-disk stats; callers should persist
   * [[manifest]] beside it and verify `dataFiles == shards`.
   */
  def writeShards(assigned: DataFrame, path: String,
      numShards: Int): ShardWriteStats = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    require(assigned.columns.contains("shard"),
      "input must carry a `shard` column — produce it with Shards.assign")
    assigned
      .repartition(numShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    val spark = assigned.sparkSession
    // scheme-aware (round-9 ADVICE): an hdfs:// or s3a:// export must
    // be VERIFIED where it landed — a blanket local-file coercion would
    // point the listing at a bogus local path after a successful write
    val p = graft.layout.Compact.resolveLocation(path)
    val fs = p.getFileSystem(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.newHadoopConf())
    var dirs = 0; var files = 0
    val st = fs.listStatus(p)
    st.foreach { d =>
      if (d.isDirectory && d.getPath.getName.startsWith("shard=")) {
        dirs += 1
        val it = fs.listFiles(d.getPath, false)
        while (it.hasNext) {
          val f = it.next()
          val n = f.getPath.getName
          if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) files += 1
        }
      }
    }
    ShardWriteStats(dirs, files, spark.read.parquet(path).count())
  }
}
