package graft.text

import graft.SparkTestKit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestKit.spark
  import spark.implicits._

  test("sketch report: exact columns exact, estimates within bound, token-less strata kept") {
    val docs = Seq(
      ("a", "x y z"), ("a", "x y z"), ("a", "p q"),
      ("b", "one two three four"),
      ("c", ""), ("c", "")).toDF("source", "text")
    val got = CorpusSketch.sketch(docs, Seq("source"), "text")
      .orderBy("source").collect()
    val bySrc = got.map(r => r.getString(0) -> r).toMap
    // exact columns
    assert(bySrc("a").getLong(1) == 3 && bySrc("a").getLong(3) == 8) // n_docs, total_tokens
    assert(bySrc("b").getLong(1) == 1 && bySrc("b").getLong(3) == 4)
    // token-less stratum survives the left join with zero totals
    assert(bySrc("c").getLong(1) == 2 && bySrc("c").getLong(3) == 0
      && bySrc("c").getLong(4) == 0)
    // small-cardinality HLL++ is exact (sparse mode): 2 distinct texts,
    // 5 distinct tokens in 'a'
    assert(bySrc("a").getLong(2) == 2 && bySrc("a").getLong(4) == 5)
  }

  test("estimates stay within 3-sigma of exact on real data (the gate bound)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sk = CorpusSketch.sketch(docs, Seq("source"), "text", rsd = 0.05)
    val exact = docs.groupBy("source").agg(
      countDistinct(col("text")).as("uc"))
    val bad = sk.join(exact, "source")
      .where(!CorpusSketch.withinBound(col("approx_distinct_content"), col("uc"), 0.15))
      .count()
    assert(bad == 0L)
  }

  test("sketch state merges across partitionings (determinism)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = CorpusSketch.sketch(docs.repartition(13), Seq("source"), "text")
      .orderBy("source").collect().map(_.toSeq).toSeq
    val b = CorpusSketch.sketch(docs.coalesce(1), Seq("source"), "text")
      .orderBy("source").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("CMS never undercounts, is exact at generous width, and is partition-invariant") {
    val docs = Seq(
      "apple apple apple banana", "banana cherry", "apple date egg fig",
      "grape grape", "cherry cherry cherry cherry").toDF("text")
    val exact = docs.select(explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact"))
    // tight sketch: 8 terms into 4 buckets forces collisions — every
    // estimate must still be >= exact (the one-sided guarantee)
    val tight = CorpusSketch.cmsBuild(docs, "text", depth = 3, width = 4)
    val estT = CorpusSketch.cmsEstimate(tight, exact.select("term"), "term",
        depth = 3, width = 4)
      .join(exact, "term").collect()
    assert(estT.nonEmpty && estT.forall(r => r.getLong(1) >= r.getLong(2)))
    // generous sketch: collisions virtually impossible at width 1024 —
    // estimates collapse to exact counts
    val wide = CorpusSketch.cmsBuild(docs, "text", depth = 4, width = 1024)
    val estW = CorpusSketch.cmsEstimate(wide, exact.select("term"), "term")
      .join(exact, "term").collect()
    assert(estW.forall(r => r.getLong(1) == r.getLong(2)))
    // determinism across partitioning (register merges commute)
    val a = CorpusSketch.cmsBuild(docs.repartition(7), "text", depth = 3, width = 4)
      .orderBy("r", "bucket").collect().map(_.toSeq).toSeq
    val b = CorpusSketch.cmsBuild(docs.coalesce(1), "text", depth = 3, width = 4)
      .orderBy("r", "bucket").collect().map(_.toSeq).toSeq
    assert(a == b)
    // absent probe term estimates from untouched buckets (possibly 0)
    val ghost = CorpusSketch.cmsEstimate(wide, Seq("zzz-absent").toDF("term"), "term")
      .head
    assert(ghost.getLong(1) == 0L)
    // parameter validation: width must be a power of two
    intercept[IllegalArgumentException] {
      CorpusSketch.cmsBuild(docs, "text", depth = 4, width = 100)
    }
  }
}
