package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Decomposition probe for the `dedup_clusters` scale shape (round-10
 * directive #2): at a given SF dir, measure SEPARATELY
 *
 *  - the near-dup PAIR stage: `Dedup.jaccardPairs(documents, tau=0.8)`
 *    wall + output pair count (pinned to parquet so the CC stage never
 *    re-runs it);
 *  - the CONNECTED-COMPONENTS stage: `Dedup.clusterPairs` wall + the
 *    actual pointer-jumping round count (counted through the
 *    `materialize` seam: 2 calls before the loop, 2 per round);
 *  - component stats (count, max size) — the output-growth witness.
 *
 * Why this exists: `BENCH_sf1` showed dedup_clusters wall ×16.5 at ×10
 * data — the only super-linear row. The hypothesis under test: MakeSf1
 * copies document CONTENT unchanged (the docsPlain rule), so ×k data
 * multiplies every cross-doc near-dup pair by k² and adds a k-clique
 * per duplicated doc — PAIR VOLUME, not CC rounds, should carry the
 * growth. One JSON line per SF dir on stdout.
 *
 * Usage: `runMain graft.tools.ClusterProbe <sfDir> [<sfDir2> ...]`
 */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ClusterProbe <sfDir> [<sfDir2> ...]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach(run(spark, _))
    spark.stop()
  }

  private def run(spark: SparkSession, dir: String): Unit = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()

    val t0 = System.nanoTime()
    val pairsPath = s"/tmp/cluster_probe_pairs_${System.nanoTime()}"
    graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.8)
      .write.mode("overwrite").parquet(pairsPath)
    val pairWall = (System.nanoTime() - t0) / 1e9
    val pairs = spark.read.parquet(pairsPath)
    val nPairs = pairs.count()

    val calls = new AtomicInteger(0)
    val counting: DataFrame => DataFrame =
      df => { calls.incrementAndGet(); df.localCheckpoint(false) }
    val t1 = System.nanoTime()
    val labels = graft.dedup.Dedup.clusterPairs(pairs,
      materialize = counting)
    val comps = labels.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_comp"), max(col("sz")).as("max_sz"),
        sum(col("sz")).as("n_nodes"))
      .collect().head
    val ccWall = (System.nanoTime() - t1) / 1e9
    val rounds = (calls.get() - 2) / 2

    println(
      s"""{"probe":"dedup_clusters","dir":"$dir","n_docs":$nDocs,""" +
        s""""pair_wall_sec":${f"$pairWall%.2f"},"n_pairs":$nPairs,""" +
        s""""cc_wall_sec":${f"$ccWall%.2f"},"cc_rounds":$rounds,""" +
        s""""n_components":${comps.getLong(0)},""" +
        s""""max_component":${comps.getLong(1)},""" +
        s""""clustered_nodes":${comps.getLong(2)}}""")
  }
}
