package graft.plans

import graft.SparkTestKit.spark
import graft.transformer.BroadcastSpatialJoin
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Plan-quality audit over real parquet: the properties that make the
 * library scale are visible in the physical plan, so pin them —
 * a refactor that silently breaks filter pushdown or column pruning
 * fails HERE, not as a 100x slowdown in production.
 */
class PlanAuditSpec extends AnyFlatSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  private def supplierView(name: String): Unit = {
    assume(new java.io.File(s"$dir/supplier.parquet").exists(), "testdata not present")
    spark.read.parquet(s"$dir/supplier.parquet").createOrReplaceTempView(name)
  }

  behavior of "transformer physical plans"

  it should "push the dataset filter down to the parquet scan" in {
    supplierView("audit_sup_filter")
    val input = graft.SparkEntry.customerPoints(spark, dir).select("c_custkey", "lon", "lat")
    val out = new BroadcastSpatialJoin()
      .setDataset("audit_sup_filter").setDataColumns("s_suppkey as sk")
      .setDatasetPoint("s_suppkey, s_nationkey") // any numeric pair works as coords here
      .setInputPoint("lon, lat")
      .setDatasetFilter("s_acctbal > 0.0")
      .transform(input)
    val scan = out.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("FileScan")).mkString("\n")
    // the filter must reach the scan as a pushed predicate, not survive
    // as a post-scan Filter over full rows
    scan should include ("PushedFilters: [IsNotNull(s_acctbal), GreaterThan(s_acctbal,0.0)")
  }

  it should "prune unused external columns from the parquet scan" in {
    supplierView("audit_sup_prune")
    val input = graft.SparkEntry.customerPoints(spark, dir).select("c_custkey", "lon", "lat")
    val out = new BroadcastSpatialJoin()
      .setDataset("audit_sup_prune").setDataColumns("s_suppkey as sk")
      .setDatasetPoint("s_suppkey, s_nationkey")
      .setInputPoint("lon, lat")
      .transform(input)
    val scan = out.queryExecution.executedPlan.toString
      .linesIterator.filter(s => s.contains("FileScan") && s.contains("supplier"))
      .mkString("\n")
    // only the two geometry source columns are read; the wide columns
    // (s_name, s_address, s_comment, ...) never leave the parquet reader
    scan should include ("ReadSchema: struct<s_suppkey:bigint,s_nationkey:int>")
  }

  it should "keep the scoring pipeline inside whole-stage codegen" in {
    supplierView("audit_sup_codegen")
    val input = graft.SparkEntry.customerPoints(spark, dir).select("c_custkey", "lon", "lat")
    val out = new BroadcastSpatialJoin()
      .setDataset("audit_sup_codegen").setDataColumns("s_suppkey as sk")
      .setDatasetPoint("s_suppkey, s_nationkey")
      .setInputPoint("lon, lat")
      .transform(input)
    // the custom spatial-join exec's input projections (WKB construction
    // included) run inside whole-stage codegen spans — rendered as the
    // `*(n)` stage markers — rather than falling back to interpreted rows
    val plan = out.queryExecution.executedPlan.toString
    plan.linesIterator.count(_.trim.matches("[:+\\- ]*\\*\\(\\d+\\).*")) should be >= 3
  }
}
