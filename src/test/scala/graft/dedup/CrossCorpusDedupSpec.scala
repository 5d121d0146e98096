package graft.dedup

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Cross-corpus (incremental) dedup contract: near-dups reported ACROSS
 * the two corpora only — within-side pairs are exactly the work an
 * incremental pipeline must not repeat — with exact Jaccard values and
 * no id-ordering assumption between sides.
 */
class CrossCorpusDedupSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def doc(prefix: String, n: Int, tail: String = ""): String =
    ((0 until n).map(i => s"$prefix$i") ++ (if (tail.isEmpty) Nil else Seq(tail)))
      .mkString(" ")

  behavior of "Dedup.minhashPairsAcross"

  it should "find new-vs-old near-dups but never within-side pairs" in {
    import spark.implicits._
    val base = doc("w", 50)
    val newDocs = Seq(
      (1L, base + " fresh1"), // near-dup of old 10
      (2L, base + " fresh2"), // also near-dup of old 10 AND of new 1 (within-side: must not appear)
      (3L, doc("u", 40)) // unrelated
    ).toDF("doc_id", "text")
    val oldDocs = Seq(
      (10L, base),
      (11L, doc("v", 40)) // unrelated; near-dup of nothing
    ).toDF("doc_id", "text")

    val got = Dedup.minhashPairsAcross(newDocs, oldDocs, "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    got shouldBe Seq((1L, 10L), (2L, 10L))
  }

  it should "agree with the self-join operator on the same logical pairs" in {
    import spark.implicits._
    val texts = (0 until 12).map { i =>
      if (i % 3 == 0) (i.toLong, doc("s", 40, s"tail${i / 3}x"))
      else (i.toLong, doc(s"d$i-", 30))
    }
    val df = texts.toDF("doc_id", "text")
    val self = Dedup.minhashPairs(df, "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val cross = Dedup.minhashPairsAcross(
      df.where($"doc_id" % 2 === 1), df.where($"doc_id" % 2 === 0),
      "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // the cross result must be exactly the odd→even slice of the self-join
    // result (with the self-join's i<j normalized away)
    val expected = self.collect {
      case (i, j, jac) if i % 2 == 1 && j % 2 == 0 => (i, j, jac)
      case (i, j, jac) if i % 2 == 0 && j % 2 == 1 => (j, i, jac)
    }
    cross.sorted shouldBe expected.sorted
  }

  it should "not assume ids are distinct across corpora" in {
    import spark.implicits._
    val newDocs = Seq((1L, doc("a", 40))).toDF("doc_id", "text")
    val oldDocs = Seq((1L, doc("a", 40))).toDF("doc_id", "text") // same id, same text
    val got = Dedup.minhashPairsAcross(newDocs, oldDocs, "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe Seq((1L, 1L, 1.0))
  }

  behavior of "Dedup.minhashPairsVsIndex"

  it should "equal minhashPairsAcross after a parquet index round-trip" in {
    import spark.implicits._
    val newDocs = Seq(
      (1L, doc("a", 40) + " fresh extra"),
      (2L, doc("u", 30))).toDF("doc_id", "text")
    val oldDocs = Seq((10L, doc("a", 40)), (11L, doc("v", 25))).toDF("doc_id", "text")
    val direct = Dedup.minhashPairsAcross(newDocs, oldDocs, "doc_id", "text", tau = 0.5)
      .collect().map(_.toSeq).toSet
    val path = java.nio.file.Files.createTempDirectory("graft-mhidx-spec-").toString
    graft.ml.ModelStore.saveMinhashIndex(
      Dedup.buildMinhashIndex(oldDocs, "doc_id", "text"), path)
    val viaIndex = Dedup.minhashPairsVsIndex(newDocs, "doc_id", "text",
      graft.ml.ModelStore.loadMinhashIndex(spark, path), tau = 0.5)
      .collect().map(_.toSeq).toSet
    viaIndex shouldBe direct
    direct.map(_.head) should contain(1L)
  }

  it should "derive n and numHashes from the index and reject incompatible banding" in {
    import spark.implicits._
    val oldDocs = Seq((10L, doc("a", 40))).toDF("doc_id", "text")
    val ix = Dedup.buildMinhashIndex(oldDocs, "doc_id", "text", n = 5, numHashes = 24)
    // 5-token shingles + 24-wide signatures round-trip through the rows
    val newDocs = Seq((1L, doc("a", 40))).toDF("doc_id", "text")
    Dedup.minhashPairsVsIndex(newDocs, "doc_id", "text", ix, tau = 0.8, bandRows = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 10L))
    an[IllegalArgumentException] should be thrownBy
      Dedup.minhashPairsVsIndex(newDocs, "doc_id", "text", ix, tau = 0.8, bandRows = 7)
  }

  it should "yield no pairs against an empty index" in {
    import spark.implicits._
    val newDocs = Seq((1L, doc("a", 40))).toDF("doc_id", "text")
    val empty = Dedup.buildMinhashIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    Dedup.minhashPairsVsIndex(newDocs, "doc_id", "text", empty, tau = 0.1)
      .count() shouldBe 0L
  }
}
