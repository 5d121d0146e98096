package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Dev probe: finds (planes, tables) at which the LSH top-k EXACTLY
  * reproduces the brute-force top-k on the gate embeddings — the
  * precondition for giving `simsearch_lsh` the exact-SQL oracle (same
  * argument as dedup_embedding_lsh). Not part of the library surface. */
object LshOracleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val q = emb.where(col("vec_id") < 20)
      val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", k = 10)
        .select("qid", "cid", "cos_r6", "rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      println(s"[$sf] exact rows=${exact.size}")
      for (planes <- Seq(3, 4, 5, 6); tables <- Seq(8, 16, 24, 32)) {
        val t0 = System.nanoTime()
        val lsh = Similarity.lshCosineTopK(q, emb, "vec_id", "embedding", k = 10,
          planes = planes, tables = tables)
          .select("qid", "cid", "cos_r6", "rnk").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val missing = exact.diff(lsh).size
        println(f"[$sf] planes=$planes%d tables=$tables%2d equal=${lsh == exact}%5s missing=$missing%3d rows=${lsh.size}%4d $secs%6.2fs")
      }
    }
    spark.stop()
  }
}
