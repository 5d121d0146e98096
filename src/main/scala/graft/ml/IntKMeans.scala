package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic integer k-means — corpus clustering for curation
 * (domain discovery, per-cluster sampling quotas, SemDeDup-style cell
 * partitioning with LEARNED centers instead of sampled seeds). The
 * float k-means every ML library ships is partition-order-dependent
 * (float centroid sums), so two runs — let alone two engines — disagree
 * in the last ulps and the cluster boundaries wobble. This variant is
 * the library's fixed-point discipline applied to Lloyd's algorithm:
 * bit-identical across engines, partitionings, and retries.
 *
 * Contract (every step exact 64-bit integer math):
 *  - quantize: v_int[d] = floor(v[d]·scale) — IEEE multiply + floor,
 *    identical in both engines (the fixed-point entry rule);
 *  - init: the k rows with the smallest (md5(id), id) rendering — the
 *    [[graft.dedup.Dedup.semanticDedup]] deterministic-seed device —
 *    in that order as centroids 0…k−1;
 *  - assign: nearest centroid by squared L2 distance Σ(v−c)², ties to
 *    the smallest centroid index;
 *  - update: per-dimension TRUNCATING division Σv div n — toward
 *    zero on either sign, exactly DuckDB's integer `//` (which
 *    truncates: -7 // 2 = -3), so negative coordinate sums round the
 *    same way in both engines; a cluster that captured no rows keeps
 *    its previous centroid;
 *  - exactly `rounds` assign+update sweeps, then one final assignment.
 *
 * Scale shape: centroids are a k·dim driver table (the
 * [[graft.similarity.ProductQuantizer]] bounded-collect convention),
 * assignment is a MAP-SIDE expression fold over the broadcast centroid
 * literals (no N×k exchange — the argmin happens inside the row), and
 * the update is one posexplode + (cluster, dim)-keyed map-side-combined
 * sum — the only shuffle per round, k·dim·parts partials regardless of
 * N. Overflow bound: dim·(2·|v|·scale)² must fit a long — unit-norm
 * embeddings at the default 1e6 scale leave 10⁴ headroom at dim 1024.
 */
object IntKMeans {

  /** Cluster assignments after `rounds` Lloyd sweeps. Output:
    * `(doc, cluster, d2)` — cluster in 0…k−1 (init order), d2 the
    * integer squared distance to the final centroid. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, scale: Long = 1000000L,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val base = materialize(df.select(col(idCol).as("doc"),
      transform(col(vecCol).cast("array<double>"),
        x => floor(x * lit(scale.toDouble)).cast("long")).as("vint")))
    val seeds = base
      .select(col("doc"), col("vint"), md5(col("doc").cast("string")).as("__r"))
      .orderBy(col("__r"), col("doc")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    require(seeds.length == k,
      s"k = $k exceeds the number of input rows (${seeds.length})")

    def nearest(cents: Array[Array[Long]]): Column = {
      val cands = cents.zipWithIndex.map { case (c, i) =>
        struct(
          aggregate(zip_with(col("vint"), lit(c), (a, b) => (a - b) * (a - b)),
            lit(0L), _ + _).as("d2"),
          lit(i).as("cid"))
      }
      array_min(array(cands: _*))
    }

    var cents = seeds
    var round = 0
    while (round < rounds) {
      val stats = base
        .withColumn("__n", nearest(cents))
        .select(col("__n.cid").as("cid"), posexplode(col("vint")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      stats.foreach { r =>
        // truncating division — JVM `/` == DuckDB integer `//`
        next(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
      cents = next
      round += 1
    }
    base.withColumn("__n", nearest(cents))
      .select(col("doc"), col("__n.cid").as("cluster"), col("__n.d2").as("d2"))
  }
}
