package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class LangIdParitySpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "LangScores (native langId kernel)"

  it should "equal the composed formulation on randomized token soups" in {
    val rnd = new scala.util.Random(31)
    val vocab = TextFunctions.LangMarkers.flatMap(_._2) ++
      Seq("zz", "qq", "meta", "data", "")
    val texts = (0 until 400).map { _ =>
      (0 until rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ "" :+ "the the el el" /* exact tie: priority order decides */ :+
      "der und die le les et" /* 3-3 tie across de/fr */
    val df = texts.toDF("text").select(TextFunctions.tokens(col("text")).as("ws"))
    val both = df.select(
      TextFunctions.langId(col("ws")).as("native"),
      TextFunctions.langIdComposed(col("ws")).as("composed"))
    both.where(col("native") =!= col("composed")).count() shouldBe 0L
  }

  it should "honor the null contract and priority ties" in {
    Seq(Option.empty[String]).toDF("text")
      .select(TextFunctions.langId(TextFunctions.tokens(col("text"))))
      .head.getString(0) shouldBe "und" // null tokens -> und, like composed
    Seq("the el").toDF("text")
      .select(TextFunctions.langId(TextFunctions.tokens(col("text"))))
      .head.getString(0) shouldBe "en" // 1-1 tie: marker-table order wins
    Seq("xyzzy blorp").toDF("text")
      .select(TextFunctions.langId(TextFunctions.tokens(col("text"))))
      .head.getString(0) shouldBe "und"
  }
}
