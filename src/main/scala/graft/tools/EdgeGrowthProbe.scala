package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Companion probe to [[ClusterProbe]] for the remaining sf1 outlier
 * families (round-10 directive #4): measures the INPUT-side growth
 * that explains their super-linear wall under MakeSf1's verbatim
 * content copies —
 *
 *  - the embedding-similarity graph's edge count (tau = 0.3, the
 *    graph_triangles / graph_clustering_coef input): identical vector
 *    copies make each original edge a copy-clique, so edges grow ∝ k²
 *    at ×k data;
 *  - the BM25 gate's query × document cross size: queries are every
 *    100th document, so BOTH sides grow ∝ k — candidate pairs ∝ k²
 *    (the real-workload shape has a FIXED query set, linear in corpus).
 *
 * One line per measurement on stdout.
 * Usage: `runMain graft.tools.EdgeGrowthProbe <sfDir> [<sfDir2> ...]`
 */
object EdgeGrowthProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EdgeGrowthProbe <sfDir> [<sfDir2> ...]")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val edges = graft.dedup.Dedup.embeddingPairs(
        emb, "vec_id", "embedding", tau = 0.3).count()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val nd = docs.count()
      val nq = docs.where(pmod(col("doc_id"), lit(100)) === 0).count()
      println(s"""{"probe":"edge_growth","dir":"$dir",""" +
        s""""emb_sim_edges":$edges,"bm25_queries":$nq,"docs":$nd}""")
    }
    spark.stop()
  }
}
