package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does a localCheckpoint snapshot preserve its
  * outputPartitioning for the optimizer (i.e. can a join on the
  * partitioning key skip the snapshot-side Exchange)? */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = (1 to 1000).toDF("id").withColumn("payload", col("id") * 2)
    val snap = base.repartition(col("id")).localCheckpoint(false)
    val agg = base.groupBy("id").agg(count(lit(1)).as("n"))
    val joined = agg.join(snap, Seq("id"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    println(s"[probe] exchanges in join plan: $exchanges")
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Scan ExistingRDD") || l.contains("Join"))
      .mkString("\n"))
    spark.stop()
  }
}
