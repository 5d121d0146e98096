package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints physical plans of representative queries for plan-quality
  * review: scan pruning (ReadSchema), pushed filters, exchange/codegen
  * structure. */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("j1_nearest", "j2_withindist_grid", "agg_q1", "simsearch_topk", "dedup_jaccard")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
