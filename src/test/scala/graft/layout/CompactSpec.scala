package graft.layout

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class CompactSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_compact").toString

  /** A fragmented bucketed table: one bucketed write + 3 bucketed
    * appends WITHOUT the one-file-per-bucket repartition, the way
    * day-to-day batch loads actually fragment a layout. */
  private def fragment(table: String): Unit = {
    val rows = (1 to 400).map(i => (i.toLong % 40, i.toLong, s"p$i"))
      .toDF("k", "id", "pay")
    Bucketed.writeBucketed(rows.where($"id" % 4 === 0), table, tmp(), Seq("k"), 8)
    for (m <- 1 to 3)
      rows.where($"id" % 4 === m)
        .repartition(3) // several writer tasks -> several files per bucket
        .write.format("parquet")
        .bucketBy(8, "k").sortBy("k")
        .mode("append").saveAsTable(table)
  }

  behavior of "Compact"

  it should "bin-pack a fragmented bucketed table to one file per bucket, content-identical" in {
    fragment("cspec_t")
    val before = spark.table("cspec_t").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val stats = Compact.compactBucketed(spark, "cspec_t", tmp())
    withClue(stats) {
      stats.filesBefore should be > 8
      stats.filesAfter shouldBe 8
    }
    val after = spark.table("cspec_t").collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    after shouldBe before
    // spec preserved through the rewrite
    Bucketed.bucketSpecOf(spark, "cspec_t") shouldBe Some((8, Seq("k")))
  }

  it should "keep the colocated join exchange-free and sort-free after compaction" in {
    fragment("cspec_j")
    val dim = (0 to 39).map(i => (i.toLong, s"d$i")).toDF("k", "dpay")
    Bucketed.writeBucketed(dim, "cspec_dim", tmp(), Seq("k"), 8)
    Compact.compactBucketed(spark, "cspec_j", tmp())
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val joined = Bucketed.colocatedJoin(spark, "cspec_j", "cspec_dim", Seq("k"))
      joined.count() shouldBe 400
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include ("SortMergeJoin")
        plan should not include "Exchange"
        plan should not include "Sort ["
      }
    } finally
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
  }

  it should "refuse in-place rewrites and non-bucketed tables" in {
    fragment("cspec_g")
    val loc = Compact.tableLocation(spark, "cspec_g").getPath
    an[IllegalArgumentException] should be thrownBy
      Compact.compactBucketed(spark, "cspec_g", loc)
    spark.sql("DROP TABLE IF EXISTS cspec_plain")
    (1 to 10).map(i => (i, s"x$i")).toDF("a", "b")
      .write.format("parquet").option("path", tmp()).saveAsTable("cspec_plain")
    an[IllegalArgumentException] should be thrownBy
      Compact.compactBucketed(spark, "cspec_plain", tmp())
  }

  it should "leave the previous registration intact when the rewrite fails" in {
    fragment("cspec_f")
    val before = spark.table("cspec_f").count()
    // poison the rewrite: a column expression that throws at execution
    val poisoned = spark.table("cspec_f")
      .withColumn("pay", when($"id" >= 0,
        raise_error(lit("injected failure"))).otherwise($"pay"))
    an[Exception] should be thrownBy
      Bucketed.writeBucketed(poisoned, "cspec_f", tmp(), Seq("k"), 8)
    // the table is still there, still bucketed, still fully readable
    Bucketed.bucketSpecOf(spark, "cspec_f") shouldBe Some((8, Seq("k")))
    spark.table("cspec_f").count() shouldBe before
  }

  behavior of "Compact.resolveLocation"

  it should "honor explicit schemes and absolutize only scheme-less paths" in {
    // round-10 ADVICE: an s3a:// export must never be coerced local
    Compact.resolveLocation("s3a://bucket/exports/v1").toUri.getScheme shouldBe "s3a"
    Compact.resolveLocation("hdfs://nn:8020/warehouse/t").toUri.toString shouldBe
      "hdfs://nn:8020/warehouse/t"
    val local = Compact.resolveLocation("relative/dir").toUri
    local.getScheme shouldBe "file"
    local.getPath should startWith ("/") // absolutized
    // strings URI.create rejects (spaces) still resolve as local paths
    Compact.resolveLocation("/tmp/with space/x").toUri.getScheme shouldBe "file"
  }

  behavior of "Compact.vacuum"

  it should "remove a superseded location and report what it removed" in {
    fragment("cspec_v")
    val stats = Compact.compactBucketed(spark, "cspec_v", tmp())
    val old = new java.io.File(java.net.URI.create(stats.previousLocation))
    old.exists() shouldBe true
    val v = Compact.vacuum(spark, stats.previousLocation)
    withClue(v) {
      v.filesRemoved should be > 8 // the fragmented data files + markers
      v.bytesRemoved should be > 0L
    }
    old.exists() shouldBe false
    // the live table is untouched
    spark.table("cspec_v").count() shouldBe 400
    Bucketed.bucketSpecOf(spark, "cspec_v") shouldBe Some((8, Seq("k")))
  }

  it should "refuse to vacuum a live table location or a missing path" in {
    fragment("cspec_vg")
    val live = Compact.tableLocation(spark, "cspec_vg").toString
    val e = intercept[IllegalArgumentException] {
      Compact.vacuum(spark, live)
    }
    e.getMessage should include("currently live there")
    // a parent of the live location is refused too
    val parent = live.stripSuffix("/").split('/').dropRight(1).mkString("/")
    intercept[IllegalArgumentException] {
      Compact.vacuum(spark, parent)
    }.getMessage should include("currently live there")
    intercept[IllegalArgumentException] {
      Compact.vacuum(spark, tmp() + "/never_written")
    }.getMessage should include("nothing to vacuum")
  }

  it should "abort loudly (deleting nothing) past the maxFiles bound" in {
    val dir = new java.io.File(tmp(), "many")
    dir.mkdirs()
    for (i <- 1 to 10)
      java.nio.file.Files.write(
        dir.toPath.resolve(s"f$i.bin"), Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException] {
      Compact.vacuum(spark, dir.toString, maxFiles = 5)
    }.getMessage should include("more than 5 files")
    // nothing was deleted by the aborted walk
    dir.listFiles().count(_.isFile) shouldBe 10
    // an explicit larger bound vacuums it
    Compact.vacuum(spark, dir.toString, maxFiles = 100)
      .filesRemoved shouldBe 10
    dir.exists() shouldBe false
  }

  it should "bin-pack a plain sorted directory preserving range clustering" in {
    val dir = tmp() + "/zin"
    val out = tmp() + "/zout"
    (1 to 1000).map(i => ((i * 37) % 1000, i)).toDF("z", "v")
      .repartitionByRange(13, $"z").sortWithinPartitions($"z")
      .write.parquet(dir)
    val stats = Compact.compactFiles(spark, dir, out, Seq("z"), 4)
    withClue(stats) {
      stats.filesBefore shouldBe 13
      stats.filesAfter should be <= 4
    }
    val back = spark.read.parquet(out)
    back.count() shouldBe 1000
    // range clustering: per-file z ranges must not overlap
    val ranges = back
      .select(input_file_name().as("f"), $"z")
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => lo2 should be >= hi1
      case _ =>
    }
  }
}
