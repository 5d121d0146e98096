package graft.layout

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class BucketedSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bucketed").toString

  behavior of "Bucketed"

  it should "join two co-bucketed tables with zero exchange and zero re-sort" in {
    val facts = (1 to 500).map(i => (i.toLong % 50, i.toLong, s"f$i"))
      .toDF("k", "fid", "fpay")
    val dim = (0 to 49).map(i => (i.toLong, s"d$i")).toDF("k", "dpay")
    Bucketed.writeBucketed(facts, "bspec_facts", tmp(), Seq("k"), 8)
    Bucketed.writeBucketed(dim, "bspec_dim", tmp(), Seq("k"), 8)

    Bucketed.bucketSpecOf(spark, "bspec_facts") shouldBe Some((8, Seq("k")))

    // one file per bucket + this conf => the writer's sortBy is
    // trusted and the merge join re-sorts NOTHING
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = Bucketed.colocatedJoin(spark, "bspec_facts", "bspec_dim", Seq("k"))
      val expected = facts.join(dim, Seq("k")).collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      val actual = joined.collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
      actual shouldBe expected

      joined.count() shouldBe 500
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include ("SortMergeJoin")
        plan should not include "Exchange"
        plan should not include "Sort ["
        plan should include ("SelectedBucketsCount: 8 out of 8")
      }
    } finally
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
  }

  it should "refuse mismatched bucket layouts instead of silently shuffling" in {
    val df = (1 to 20).map(i => (i.toLong, s"p$i")).toDF("k", "pay")
    Bucketed.writeBucketed(df, "bspec_a8", tmp(), Seq("k"), 8)
    Bucketed.writeBucketed(df, "bspec_a4", tmp(), Seq("k"), 4)
    Bucketed.writeBucketed(df, "bspec_pay", tmp(), Seq("pay"), 8)
    spark.sql("DROP TABLE IF EXISTS bspec_plain")
    df.write.format("parquet").option("path", tmp()).saveAsTable("bspec_plain")

    an[IllegalArgumentException] should be thrownBy
      Bucketed.colocatedJoin(spark, "bspec_a8", "bspec_a4", Seq("k")) // counts differ
    an[IllegalArgumentException] should be thrownBy
      Bucketed.colocatedJoin(spark, "bspec_a8", "bspec_pay", Seq("k")) // keys differ
    an[IllegalArgumentException] should be thrownBy
      Bucketed.colocatedJoin(spark, "bspec_a8", "bspec_plain", Seq("k")) // not bucketed
    an[IllegalArgumentException] should be thrownBy
      Bucketed.writeBucketed(df, "bspec_bad", tmp(), Seq("nope"), 8) // missing key
  }

  it should "make bucket-key aggregation exchange-free too" in {
    val facts = (1 to 300).map(i => (i.toLong % 30, i.toLong)).toDF("k", "v")
    Bucketed.writeBucketed(facts, "bspec_agg", tmp(), Seq("k"), 4)
    val agg = spark.table("bspec_agg").groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("v").as("s"))
    agg.count() shouldBe 30
    val plan = agg.queryExecution.executedPlan.toString
    withClue(plan) { plan should not include "Exchange" }
  }
}
