package graft.join

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class SkewJoinSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  behavior of "SkewJoin.salted"

  it should "equal the plain inner join exactly, including multiplicities" in {
    val rnd = new scala.util.Random(7)
    // skewed probe: key 0 holds half the rows; duplicates included
    val probe = Seq.tabulate(400)(i =>
      (if (i % 2 == 0) 0L else rnd.nextInt(20).toLong, s"p${i % 37}"))
      .toDF("k", "pay")
    val build = Seq.tabulate(60)(i => (rnd.nextInt(25).toLong, s"b$i"))
      .toDF("k", "bpay")
    val plain = probe.join(build, Seq("k"))
    val salted = SkewJoin.salted(probe, build, Seq("k"), saltFactor = 4)
    canon(salted) shouldBe canon(plain)
    // bounded variant: only the hot key replicates
    val hot = Seq(Tuple1(0L)).toDF("k")
    val saltedHot = SkewJoin.salted(probe, build, Seq("k"), 4, Some(hot))
    canon(saltedHot) shouldBe canon(plain)
  }

  it should "preserve left-join semantics with null and unmatched keys" in {
    val probe = Seq((Some(1L), "a"), (Some(2L), "b"), (None, "c"), (Some(9L), "d"))
      .toDF("k", "pay")
    val build = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "bpay")
    val plain = probe.join(build, Seq("k"), "left")
    val salted = SkewJoin.salted(probe, build, Seq("k"), 3, joinType = "left")
    canon(salted) shouldBe canon(plain)
    val hot = Seq(Tuple1(1L)).toDF("k")
    val saltedHot = SkewJoin.salted(probe, build, Seq("k"), 3, Some(hot), "left")
    canon(saltedHot) shouldBe canon(plain)
  }

  it should "spread a hot key across salts on the shuffled side" in {
    val probe = Seq.tabulate(200)(i => (0L, s"p$i")).toDF("k", "pay")
    val build = Seq((0L, "b")).toDF("k", "bpay")
    // peek at the salt distribution before the drop: distinct salts > 1
    // means the hot partition actually split
    val salts = probe
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.col("pay")),
        org.apache.spark.sql.functions.lit(4)).as("s"))
      .distinct().count()
    salts should be > 1L
    canon(SkewJoin.salted(probe, build, Seq("k"), 4)) shouldBe
      canon(probe.join(build, Seq("k")))
  }

  it should "validate inputs" in {
    val df = Seq((1L, "a")).toDF("k", "pay")
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.salted(df, df.withColumnRenamed("pay", "bpay"), Seq("k"), 1)
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.salted(df, df, Seq("nope"), 4)
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.salted(df, df, Seq("k"), 4, joinType = "full")
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.salted(df, df.withColumnRenamed("pay", "bpay"), Seq("k"), 4,
        hotKeys = Some(df)) // hotKeys columns must be exactly the keys
  }
}
