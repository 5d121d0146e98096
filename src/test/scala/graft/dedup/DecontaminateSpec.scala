package graft.dedup

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Benchmark-decontamination contract: a corpus document is flagged iff it
 * shares a verbatim k-token run with the benchmark, with exact hit counts
 * and span lengths; and the corpus side must NOT shuffle in the default
 * (broadcast-benchmark) regime — the property that makes the operator
 * viable when the corpus is 100 TB and the benchmark is an eval suite.
 */
class DecontaminateSpec extends AnyFlatSpec with Matchers with AdaptiveSparkPlanHelper {

  lazy val spark = SparkTestKit.spark

  private def doc(tokens: Seq[String]): String = tokens.mkString(" ")
  private def toks(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  behavior of "Dedup.decontaminate"

  it should "flag a leaked eval question with its exact span and leave clean docs alone" in {
    import spark.implicits._
    val question = toks("q", 120) // the "eval question"
    val corpus = Seq(
      (1L, doc(toks("h", 400) ++ question ++ toks("z", 400))), // contaminated host
      (2L, doc(toks("u", 300))), // clean
      (3L, doc(question)) // the question verbatim, nothing else
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(doc(question))).toDF("text")

    val got = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text", k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    // a shared span of L=120 tokens matches at L-k+1 = 81 consecutive
    // window positions; max_span reconstructs the exact 120
    got shouldBe Seq((1L, 81L, 120L), (3L, 81L, 120L))
  }

  it should "count disjoint contaminated runs separately in hits but report the longest span" in {
    import spark.implicits._
    val runA = toks("a", 60)
    val runB = toks("b", 45)
    val corpus = Seq(
      (1L, doc(toks("x", 30) ++ runA ++ toks("y", 30) ++ runB ++ toks("w", 10)))
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(doc(runA)), Tuple1(doc(runB))).toDF("text")

    val got = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text", k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 60-run: 21 window hits; 45-run: 6 window hits; islands are disjoint
    got shouldBe Seq((1L, 27L, 60L))
  }

  it should "agree between the broadcast and shuffle benchmark regimes" in {
    import spark.implicits._
    val question = toks("q", 50)
    val corpus = Seq(
      (1L, doc(toks("h", 100) ++ question)),
      (2L, doc(toks("u", 100)))
    ).toDF("doc_id", "text")
    val bench = Seq(Tuple1(doc(question))).toDF("text")

    val b = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text",
      k = 8, broadcastBench = true).collect().toSeq.map(_.toSeq)
    val s = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text",
      k = 8, broadcastBench = false).collect().toSeq.map(_.toSeq)
    b should contain theSameElementsAs s
  }

  it should "probe the benchmark as a broadcast join — no shuffle of corpus windows" in {
    import spark.implicits._
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val corpus = (1L to 50L).map(i => (i, doc(toks(s"d$i-", 60)))).toDF("doc_id", "text")
    val bench = Seq(Tuple1(doc(toks("d7-", 60)))).toDF("text")

    val out = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text", k = 8)
    out.collect() // materialize so the adaptive plan is final
    val plan = out.queryExecution.executedPlan
    collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j } should not be empty
    // the only shuffles sit ABOVE the match (island/doc aggregation of
    // matched windows, output-sized) or inside the benchmark distinct —
    // none may carry the corpus window stream. The corpus-side scan
    // below the broadcast join must be exchange-free.
    val probeSide = collectWithSubqueries(plan) { case j: BroadcastHashJoinExec => j.left }
    probeSide.foreach { side =>
      collectWithSubqueries(side) { case e: ShuffleExchangeExec => e } shouldBe empty
    }
  }

  it should "reject k < 2" in {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Dedup.decontaminate(df, "doc_id", "text", df, "text", k = 1)
  }
}
