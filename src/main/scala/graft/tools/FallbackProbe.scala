package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: isolates the layers of the grid-nearest exhaustive
  * fallback (cross join → distance → min-struct agg) to find where the
  * per-pair time goes. Not part of the library surface. */
object FallbackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GeoExpressions
    import graft.SparkEntry

    val cust = SparkEntry.customerPoints(spark, sfDir).select("c_custkey", "lon", "lat")
      .withColumn("lw", GeoExpressions.wkbPoint(col("lon"), col("lat")))
      .repartition(32)
    val sup = SparkEntry.supplierPoints(spark, sfDir)
      .select(col("s_suppkey"), col("lon").as("slon"), col("lat").as("slat"))
      .withColumn("rw", GeoExpressions.wkbPoint(col("slon"), col("slat")))

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    val cands = cust.crossJoin(sup)
    t("warmup count")(cands.count())
    t("cross count")(cands.count())
    t("cross + dist")(cands.select(GeoExpressions.stDistance(col("lw"), col("rw")).as("d"))
      .where(col("d") >= 0).count())
    t("cross + dist (again)")(cands.select(GeoExpressions.stDistance(col("lw"), col("rw")).as("d"))
      .where(col("d") >= 0).count())
    val withD = cands.withColumn("d", GeoExpressions.stDistance(col("lw"), col("rw")))
    t("agg min(double)")(withD.groupBy("c_custkey").agg(min(col("d"))).count())
    t("agg min(struct slim)")(withD.groupBy("c_custkey")
      .agg(min(struct(col("d"), col("s_suppkey")))).count())
    t("agg min(struct full)")(withD.groupBy(col("c_custkey"), col("lon"), col("lat"), col("lw"))
      .agg(min(when(col("rw").isNotNull,
        struct(col("d"), struct(col("s_suppkey")).as("tb"), col("s_suppkey"), col("slon"), col("slat"))))).count())

    // exact kernel-shaped variants: env array + lid in the group keys
    val l0 = cust
      .withColumn("env", GeoExpressions.stEnvelope(col("lw")))
      .withColumn("lid", monotonically_increasing_id())
    val candsK = l0.crossJoin(sup)
      .withColumn("d", GeoExpressions.stDistance(col("lw"), col("rw")))
    val candStruct = when(col("rw").isNotNull,
      struct(col("d"), struct(col("s_suppkey")).as("tb"), col("s_suppkey"), col("slon"), col("slat")))
    t("kernel keys w/ env")(candsK
      .groupBy(col("lid"), col("lw"), col("env"), col("c_custkey"), col("lon"), col("lat"))
      .agg(min(candStruct)).count())
    t("kernel keys w/o env")(candsK
      .groupBy(col("lid"), col("lw"), col("c_custkey"), col("lon"), col("lat"))
      .agg(min(candStruct)).count())
    t("kernel keys lid only")(candsK
      .groupBy(col("lid"))
      .agg(min(candStruct), first(struct(col("lw"), col("env"), col("c_custkey"), col("lon"), col("lat")))).count())
    t("kernel full (again)")(candsK
      .groupBy(col("lid"), col("lw"), col("env"), col("c_custkey"), col("lon"), col("lat"))
      .agg(min(candStruct)).count())

    // the real kernel, exactly as j1_nearest_gridscale calls it
    val cust2 = SparkEntry.customerPoints(spark, sfDir).select("c_custkey", "lon", "lat")
    val sup2 = SparkEntry.supplierPoints(spark, sfDir)
      .select(col("s_suppkey"), col("lon").as("slon"), col("lat").as("slat"))
    val real = graft.join.GridNearestJoin.nearest(
      cust2, sup2,
      GeoExpressions.wkbPoint(col("lon"), col("lat")),
      GeoExpressions.wkbPoint(col("slon"), col("slat")),
      cellDeg = 4.0, tieBreak = Some(col("s_suppkey")), fallbackBelow = 200L)
      .select("c_custkey", "s_suppkey")
    t("real kernel gridscale")(real.count())
    t("real kernel (again)")(real.count())
    println(real.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(200)).take(80).mkString("\n"))
    spark.stop()
  }
}
