package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.functions.GeoExpressions

/** Throwaway diagnostic for the band-pruning A/B: cardinalities of each
  * filter stage of the intersects grid join at a given factor. */
object BandDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val f = sys.env.getOrElse("BAND_FACTOR", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def keyed(name: String, key: String): org.apache.spark.sql.DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet").select(col(key))
        .select(explode(sequence(lit(0), lit(f - 1))).as("__k"), col(key))
        .select((col(key) + col("__k") * lit(100000000L)).as(key))
    val l = keyed("customer", "c_custkey")
      .select(col("c_custkey"), SparkEntry.lonOf("c_custkey").as("lon"), lit(0.0d).as("lat"))
      .withColumn("c_bal", pmod(col("c_custkey"), lit(10000)).cast("double"))
    val r = keyed("supplier", "s_suppkey")
      .select(col("s_suppkey"), SparkEntry.lonOf("s_suppkey").as("slon"))
      .withColumn("s_bal", pmod(col("s_suppkey"), lit(10000)).cast("double"))
    val rectWkt = concat(lit("POLYGON(("),
      col("slon") - 2.0d, lit(" -2,"), col("slon") + 2.0d, lit(" -2,"),
      col("slon") + 2.0d, lit(" 2,"), col("slon") - 2.0d, lit(" 2,"),
      col("slon") - 2.0d, lit(" -2))"))
    val cellDeg = 4.0
    val lw = col("__lw"); val rw = col("__rw")
    val lx = l.withColumn("__lw", GeoExpressions.wkbPoint(col("lon"), col("lat")))
      .withColumn("cell", explode(GeoExpressions.gridCells(lw, cellDeg)))
    val rx = r.withColumn("__rw", GeoExpressions.wkbFromWkt(rectWkt))
      .withColumn("cell", explode(GeoExpressions.gridCells(rw, cellDeg)))
    val joined = lx.join(rx, "cell")
    val n0 = joined.count()
    val refc = joined.where(GeoExpressions.refCell(lw, rw, cellDeg, 0.0) === col("cell"))
    val n1 = refc.count()
    val refine = refc.where(GeoExpressions.stRelates(lw, rw, "intersects"))
    val n2 = refine.count()
    val band = col("s_bal").between(col("c_bal") - 50.0, col("c_bal") + 50.0)
    val n3 = refine.where(band).count()
    val nBandFirst = joined.where(band).count()
    println(s"[banddiag] f=$f cellPairs=$n0 refCell=$n1 refine=$n2 band=$n3 bandOnCellPairs=$nBandFirst")
    // physical plans of the two variants (engine early-condition vs
    // post-hoc late condition)
    val early = graft.join.GridSpatialJoin.join(
      l, r, GeoExpressions.wkbPoint(col("lon"), col("lat")),
      GeoExpressions.wkbFromWkt(rectWkt),
      graft.spatial.SpatialPredicate.Intersects,
      cellDeg = 4.0, extraCondition = Some(band))
    val late = graft.join.GridSpatialJoin.join(
      l, r, GeoExpressions.wkbPoint(col("lon"), col("lat")),
      GeoExpressions.wkbFromWkt(rectWkt),
      graft.spatial.SpatialPredicate.Intersects,
      cellDeg = 4.0, extraCondition = None).where(band)
    println("[banddiag] EARLY PLAN:\n" + early.queryExecution.executedPlan.toString.take(4000))
    println("[banddiag] LATE PLAN:\n" + late.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
