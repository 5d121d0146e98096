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

  behavior of "Dedup.appendToMinhashIndex / compactMinhashIndex"

  it should "make (index + delta + re-ingest, compacted) equal a from-scratch rebuild" in {
    import spark.implicits._
    val corpus0 = Seq((1L, doc("a", 30)), (2L, doc("b", 30))).toDF("doc_id", "text")
    val delta = Seq((3L, doc("a", 30, "tail")), (4L, doc("c", 25))).toDF("doc_id", "text")
    val idx0 = Dedup.buildMinhashIndex(corpus0, "doc_id", "text", n = 4, numHashes = 16)
    val maintained = Dedup.compactMinhashIndex(
      Dedup.appendToMinhashIndex(
        Dedup.appendToMinhashIndex(idx0, delta, "doc_id", "text"),
        corpus0, "doc_id", "text")) // unchanged re-ingest must collapse
    val rebuilt = Dedup.buildMinhashIndex(
      corpus0.unionByName(delta), "doc_id", "text", n = 4, numHashes = 16)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).mkString("|"),
        r.getSeq[Long](2).mkString(","))).sortBy(x => (x._1, x._2))
    canon(maintained) shouldBe canon(rebuilt)
  }

  it should "derive the delta's parameters from the index, not from defaults" in {
    import spark.implicits._
    val corpus0 = Seq((1L, doc("a", 30))).toDF("doc_id", "text")
    val delta = Seq((2L, doc("b", 30))).toDF("doc_id", "text")
    // non-default parameters: the appended rows must match them exactly
    val idx0 = Dedup.buildMinhashIndex(corpus0, "doc_id", "text", n = 5, numHashes = 8)
    val appended = Dedup.appendToMinhashIndex(idx0, delta, "doc_id", "text")
    val rows = appended.where(org.apache.spark.sql.functions.col("doc") === 2L).collect()
    rows should have size 1
    rows.head.getSeq[Long](2) should have size 8          // numHashes from index
    rows.head.getSeq[String](1).head.split(" ") should have size 5 // n from index
  }

  it should "keep both rows when a re-appended doc id carries changed text" in {
    import spark.implicits._
    val corpus0 = Seq((1L, doc("a", 30))).toDF("doc_id", "text")
    val changed = Seq((1L, doc("z", 30))).toDF("doc_id", "text")
    val maintained = Dedup.compactMinhashIndex(
      Dedup.appendToMinhashIndex(
        Dedup.buildMinhashIndex(corpus0, "doc_id", "text"),
        changed, "doc_id", "text"))
    maintained.count() shouldBe 2
  }
}
