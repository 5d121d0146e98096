package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class StripHtmlSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("h").select(TextFunctions.stripHtml(col("h"))).head.getString(0)

  behavior of "TextFunctions.stripHtml"

  it should "drop script/style blocks wholesale and flatten tags to spaces" in {
    strip("<html><STYLE>b{c:1}</STYLE><script x=1>var a='<p>';</script>" +
      "<body><p>one</p><br/>two</body></html>") shouldBe "one two"
  }

  it should "decode the six entities without double-decoding" in {
    strip("a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g") shouldBe
      "a <b> \"c\" 'd' e f & g"
    // &amp;lt; is the ESCAPED text "&lt;" — must decode once, not twice
    strip("x &amp;lt; y") shouldBe "x &lt; y"
  }

  it should "collapse whitespace runs and trim" in {
    strip("  <p>a</p>\n\n<p>b</p>\t c  ") shouldBe "a b c"
  }

  behavior of "TextFunctions.sentences"

  it should "segment on terminator runs, keep terminators, drop empties" in {
    def seg(s: String): Seq[String] =
      Seq(s).toDF("t").select(TextFunctions.sentences(col("t"))).head.getSeq[String](0)
    seg("one two. three four! five") shouldBe Seq("one two.", "three four!", "five")
    seg("wait... what?! ok") shouldBe Seq("wait...", "what?!", "ok")
    // terminator at end of text: no trailing empty segment
    seg("done.") shouldBe Seq("done.")
    seg("a.   b") shouldBe Seq("a.", "b") // space runs collapse into one cut
    seg("") shouldBe Seq.empty
    // no mid-token split: "3.14" has no space after the dot
    seg("pi is 3.14 ok") shouldBe Seq("pi is 3.14 ok")
  }

  behavior of "TextFunctions.stripHtml (misc)"

  it should "propagate null and survive tagless / pathological input" in {
    Seq(Option.empty[String]).toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).head.isNullAt(0) shouldBe true
    strip("plain text, no markup") shouldBe "plain text, no markup"
    // unclosed script: tag stripped, body text kept (documented limit)
    strip("<script>var x=1") shouldBe "var x=1"
    strip("") shouldBe ""
  }
}
