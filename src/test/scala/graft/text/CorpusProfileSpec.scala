package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit
import graft.text.CorpusProfile

class CorpusProfileSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "CorpusProfile"

  it should "compute explicit-rank quantiles per language" in {
    // 5 English docs with token counts 1..5; 2 marker-free docs ("und")
    val docs = (
      (1 to 5).map(n => ("the " * (n - 1) + "the").trim) ++
        Seq("xyz", "zzz qqq qqq")
    ).toDF("text")
    val out = CorpusProfile.profile(docs, "text")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val en = out("en")
    en._2 shouldBe 5L // n_docs
    en._3 shouldBe 15L // total tokens 1+2+3+4+5
    en._4 shouldBe 5L // max
    en._5 shouldBe 3L // p50: ceil(5/2)=3rd smallest => 3
    en._6 shouldBe 5L // p90: ceil(4.5)=5th smallest => 5
    val und = out("und")
    und._2 shouldBe 2L
    und._3 shouldBe 4L // 1 + 3
    und._5 shouldBe 1L // p50 of {1,3}: rank ceil(1) ... 2*cum>=2 at n=1
    und._6 shouldBe 3L // p90: 10*cum >= 18 first at n=3
  }

  it should "run the quantile window over histogram rows, not documents" in {
    // 1000 docs but only 3 distinct token counts: the cumsum window's
    // input is bounded by distinct lengths — assert the histogram
    // collapse happened by checking the plan aggregates before the window
    val docs = (0 until 1000).map(i => ("the " * (i % 3 + 1)).trim).toDF("text")
    val out = CorpusProfile.profile(docs, "text")
    val plan = out.queryExecution.executedPlan.toString
    // the window must sit above an aggregate (histogram), not the scan
    val winIdx = plan.indexOf("Window")
    val aggBelow = plan.indexOf("HashAggregate", winIdx)
    winIdx should be >= 0
    aggBelow should be > winIdx // at least one aggregate below the window
    val row = out.where(col("lang_pred") === "en")
      .as[(String, Long, Long, Long, Long, Long)].head()
    row._2 shouldBe 1000L
    row._5 shouldBe 2L // counts 1,2,3 each ~333 docs; median token count 2
  }
}
