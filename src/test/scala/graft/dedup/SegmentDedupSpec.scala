package graft.dedup

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Contracts of the round-7 contamination/line-dedup wave:
 *
 *  - [[Dedup.segmentDedup]]: global first-occurrence survival of
 *    `seg`-token segments with in-order document reassembly (the
 *    C4-style line-dedup generalized to token windows), executed as the
 *    skew-safe agg+join-back shape — never a window over a digest
 *    partition;
 *  - [[Dedup.decontamOverlap]]: exact distinct-n-gram overlap fractions
 *    against a benchmark slice;
 *  - [[Dedup.decontaminateBloom]]: bloom prefiltering is
 *    correctness-invisible — output identical to the exact digest join
 *    at ANY false-positive rate.
 */
class SegmentDedupSpec extends AnyFlatSpec with Matchers with AdaptiveSparkPlanHelper {

  lazy val spark = SparkTestKit.spark

  behavior of "Dedup.segmentDedup"

  it should "keep first occurrences, drop later duplicates, and reassemble in order" in {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),          // both segments first occurrences
      (2L, "e f g h x y z w"),          // "e f g h" already seen in doc 1
      (3L, "a b c d e f g h")           // fully deduplicated away
    ).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "doc_id", "text", seg = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    got shouldBe Seq(
      (1L, "a b c d e f g h", 2L, 0L),
      (2L, "x y z w", 1L, 1L),
      (3L, "", 0L, 2L))
  }

  it should "deduplicate repeated segments WITHIN a document too" in {
    import spark.implicits._
    val docs = Seq((7L, "p q r s p q r s")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "doc_id", "text", seg = 4).collect()
    got.map(r => (r.getString(1), r.getLong(2), r.getLong(3))) shouldBe
      Array(("p q r s", 1L, 1L))
  }

  it should "treat a document shorter than one segment as a single whole-doc segment" in {
    import spark.implicits._
    val docs = Seq((1L, "mm nn"), (2L, "mm nn zz")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(docs, "doc_id", "text", seg = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    // "mm nn" and "mm nn zz" are DIFFERENT segments — no prefix aliasing
    got shouldBe Seq((1L, "mm nn"), (2L, "mm nn zz"))
  }

  it should "pick the keeper by (doc, idx) lexicographic order, not partition luck" in {
    import spark.implicits._
    // same segment at a LATER index of an earlier doc vs an EARLIER index
    // of a later doc: (1, idx 1) < (2, idx 0) — doc 1 keeps it
    val docs = Seq(
      (1L, "u u u u k k k k"),
      (2L, "k k k k v v v v")
    ).toDF("doc_id", "text").repartition(7)
    val got = Dedup.segmentDedup(docs, "doc_id", "text", seg = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    got shouldBe Seq((1L, "u u u u k k k k"), (2L, "v v v v"))
  }

  it should "execute the keeper selection as agg+join-back, not a digest window" in {
    import spark.implicits._
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = (1L to 40L).map(i => (i, s"w$i x$i y$i z$i a b c d")).toDF("doc_id", "text")
    val plan = Dedup.segmentDedup(docs, "doc_id", "text", seg = 4)
      .queryExecution.executedPlan
    collectWithSubqueries(plan) { case w: WindowExec => w } shouldBe empty
  }

  behavior of "Dedup.decontamOverlap"

  it should "report exact distinct-gram overlap fractions" in {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c x y"),   // grams(2): ab bc cx xy; ab + bc hit -> 0.5
      (2L, "p q r s t")    // no overlap
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1("a b c")).toDF("text")
    val got = Dedup.decontamOverlap(corpus, "doc_id", "text", bench, "text",
      n = 2, theta = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq.sortBy(_._1)
    got shouldBe Seq(
      (1L, 4L, 2L, 0.5, true),
      (2L, 4L, 0L, 0.0, false))
  }

  it should "count DISTINCT grams once however often they repeat in the doc" in {
    import spark.implicits._
    val corpus = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("a b")).toDF("text")
    val got = Dedup.decontamOverlap(corpus, "doc_id", "text", bench, "text",
      n = 2, theta = 0.1).collect()
    // distinct grams: "a b", "b a" — only "a b" is in the benchmark
    got.map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))) shouldBe
      Array((2L, 1L, 0.5))
  }

  it should "exclude documents with fewer than n tokens and agree across regimes" in {
    import spark.implicits._
    val corpus = Seq((1L, "one"), (2L, "two words here")).toDF("doc_id", "text")
    val bench = Seq(Tuple1("two words")).toDF("text")
    val b = Dedup.decontamOverlap(corpus, "doc_id", "text", bench, "text",
      n = 2, theta = 0.1, broadcastBench = true).collect().map(_.toSeq).toSeq
    val s = Dedup.decontamOverlap(corpus, "doc_id", "text", bench, "text",
      n = 2, theta = 0.1, broadcastBench = false).collect().map(_.toSeq).toSeq
    b should contain theSameElementsAs s
    b.map(_.head) should contain theSameElementsAs Seq(2L)
  }

  behavior of "Dedup.decontaminateBloom"

  it should "match the exact decontamination doc set at any false-positive rate" in {
    import spark.implicits._
    def run(prefix: String, n: Int) = (0 until n).map(i => s"$prefix$i").mkString(" ")
    val corpus = (1L to 30L).map(i => (i, run(s"d$i-", 20))).toDF("doc_id", "text")
    val bench = Seq(Tuple1(run("d7-", 20)), Tuple1(run("d21-", 20))).toDF("text")
    val exact = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text", k = 8)
      .select("doc").collect().map(_.getLong(0)).toSet
    // absurdly small filter + fpp 0.5: floods of false positives the
    // verify join must remove
    val got = Dedup.decontaminateBloom(corpus, "doc_id", "text", bench, "text",
      k = 8, expectedItems = 4L, fpp = 0.5)
      .collect().map(_.getLong(0)).toSet
    got shouldBe exact
    got shouldBe Set(7L, 21L)
  }
}
