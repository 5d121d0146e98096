package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.transformer.BroadcastSpatialJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Deterministic synthetic WGS84 coordinates derived from an integer key.
    * Pure integer arithmetic then one IEEE division — bit-identical in any
    * engine (used by the DuckDB oracles too). Spread over lon [-60,60),
    * lat [-45,45) to stay far from poles/antimeridian. */
  def lonOf(key: String): org.apache.spark.sql.Column =
    (((col(key) * 7919L + 104729L) % 1200000L).cast("double") / 10000.0d) - 60.0d
  def latOf(key: String): org.apache.spark.sql.Column =
    (((col(key) * 6007L + 15485863L) % 900000L).cast("double") / 10000.0d) - 45.0d

  /** customer with synthetic point coordinates. */
  def customerPoints(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
      .withColumn("lon", lonOf("c_custkey"))
      .withColumn("lat", latOf("c_custkey"))

  /** supplier as the external POI table with synthetic coordinates. */
  def supplierPoints(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
      .withColumn("lon", lonOf("s_suppkey"))
      .withColumn("lat", latOf("s_suppkey"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Nearest-supplier spatial join: every customer point joined to its
    * geodesically nearest supplier, with the distance in metres appended. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    supplierPoints(spark, dir).createOrReplaceTempView("graft_suppliers")
    new BroadcastSpatialJoin()
      .setDataset("graft_suppliers")
      .setDatasetPoint("lon, lat")
      .setInputPoint("lon, lat")
      .setDataColumns("s_suppkey as nearest_suppkey, s_name as nearest_supplier")
      .setBroadcast("dataset")
      .setPredicate("nearest")
      .setDistColAlias("distance_m")
      .transform(customerPoints(spark, dir))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
