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
}
