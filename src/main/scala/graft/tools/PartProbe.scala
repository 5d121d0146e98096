package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: does a localCheckpoint snapshot preserve its
  * outputPartitioning for the optimizer (i.e. can a join on the
  * partitioning key skip the snapshot-side Exchange)? Checked across
  * AQE on/off and lazy/eager checkpoints, with and without an explicit
  * partition count — the iterative operators' co-partitioning contract
  * depends on the answer (see PlanAuditSpec's pin). */
object PartProbe {
  def main(args: Array[String]): Unit = {
    for (aqe <- Seq(false, true)) {
      val spark = SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val base = (1 to 1000).toDF("id").withColumn("payload", col("id") * 2)
      for (eager <- Seq(false, true); explicitN <- Seq(false, true)) {
        val part = if (explicitN) base.repartition(4, col("id"))
          else base.repartition(col("id"))
        val snap = part.localCheckpoint(eager)
        val agg = base.groupBy("id").agg(count(lit(1)).as("n"))
        val joined = agg.join(snap, Seq("id"))
        joined.count() // force AQE to finalize
        val plan = joined.queryExecution.executedPlan.toString
        val exchanges = plan.linesIterator.count(l =>
          l.contains("Exchange hashpartitioning"))
        println(s"[probe] aqe=$aqe eager=$eager explicitN=$explicitN " +
          s"exchanges=$exchanges (1 = snapshot side preserved)")
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
