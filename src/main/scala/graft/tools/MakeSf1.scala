package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialize an sf1-equivalent dataset (×10 of sf0.1) as REAL parquet
 * tables, for the one-shot large-scale bench evidence run
 * (`BENCH_sf1` in BASELINE.md). Scaling discipline = disjoint
 * sub-database copies, the TPC-H way: copy k shifts every key column
 * by k·10⁹ so intra-copy joins stay coherent and cross-copy joins
 * cannot occur; nation/region stay fixed (true dimension tables);
 * document/embedding CONTENT is left unchanged (docsPlain rule —
 * near-dup density and vocabulary must not be diluted by suffixing);
 * event timestamps keep their original encoding-derived longs.
 *
 * Usage: `runMain graft.tools.MakeSf1 <srcSfDir> <outDir> [factor]`.
 * Output files inherit the union's partitioning (one split per copy),
 * so benchmark scans parallelize the way a real multi-file table does.
 */
object MakeSf1 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeSf1 <srcSfDir> <outDir> [factor]")
    val (src, out) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 1000000000L

    def inflate(table: String, keyCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val copies = (0 until factor).map { k =>
        keyCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * OFF))
        }
      }
      copies.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[mksf1] $table x$factor")
    }

    inflate("customer", Seq("c_custkey"))
    inflate("supplier", Seq("s_suppkey"))
    inflate("part", Seq("p_partkey"))
    inflate("orders", Seq("o_orderkey", "o_custkey"))
    inflate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    inflate("events", Seq("event_id", "user_id"))
    inflate("documents", Seq("doc_id"))
    inflate("embeddings", Seq("vec_id"))
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[mksf1] $t x1 (dimension)")
    }
    spark.stop()
  }
}
