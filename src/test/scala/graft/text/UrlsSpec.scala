package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class UrlsSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "TextFunctions.urls / urlDomain"

  it should "extract whitespace-delimited URLs in order with domain keys" in {
    val df = Seq(
      (1L, "intro https://www.Example.org/p/1?q=2 mid http://cdn3.site.io:8080/x tail"),
      (2L, "no links here"),
      (3L, "https://a.b.c/d."), // trailing punctuation stays with the token
      (4L, null.asInstanceOf[String]))
      .toDF("id", "tx")
    val out = df.select(col("id"), posexplode(TextFunctions.urls(col("tx"))))
      .select(col("id"), col("pos"), col("col").as("url"),
        TextFunctions.urlDomain(col("col")).as("domain"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3)))
    out.toSeq shouldBe Seq(
      (1L, 0, "https://www.Example.org/p/1?q=2", "example.org"), // lower + www strip
      (1L, 1, "http://cdn3.site.io:8080/x", "cdn3.site.io"),     // port drops
      (3L, 0, "https://a.b.c/d.", "a.b.c"))                      // doc 2: none; doc 4: null in, no rows
  }

  it should "return empty-string domain for non-URL input (no-match contract)" in {
    val d = Seq(Tuple1("not a url")).toDF("u")
      .select(TextFunctions.urlDomain(col("u"))).head.getString(0)
    d shouldBe ""
  }
}
