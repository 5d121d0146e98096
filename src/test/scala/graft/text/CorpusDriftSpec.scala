package graft.text

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * [[CorpusDrift]] contract: zero drift between identical snapshots,
 * sign-correct localized log ratios, exact replication of the integer
 * KL/TVD pipeline, partition independence.
 */
class CorpusDriftSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  behavior of "CorpusDrift"

  it should "report zero drift between identical snapshots" in {
    val a = docs("alpha beta gamma", "delta epsilon")
    val r = CorpusDrift.summary(a, "text", a, "text").collect().head
    r.getLong(0) shouldBe 5L // n_grams_a
    r.getLong(1) shouldBe 5L
    r.getLong(2) shouldBe 0L // kl micro
    r.getLong(3) shouldBe 0L // tvd numerator
    r.getDouble(4) shouldBe 0.0
  }

  it should "localize drift with sign-correct log ratios" in {
    val a = docs("xx xx xx shared")
    val b = docs("yy yy yy shared")
    val rep = CorpusDrift.report(a, "text", b, "text", buckets = 4096)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // the xx bucket: present only in A -> positive lr; yy only in B ->
    // negative; shared bucket: equal counts -> lr == ln(1) rounded = 0
    rep.filter(t => t._1 > 0 && t._2 == 0).map(_._3).foreach(_ should be > 0L)
    rep.filter(t => t._1 == 0 && t._2 > 0).map(_._3).foreach(_ should be < 0L)
    rep.filter(t => t._1 == t._2).map(_._3).foreach(_ shouldBe 0L)
    val s = CorpusDrift.summary(a, "text", b, "text").collect().head
    s.getLong(2) should be > 0L // disjoint mass -> positive KL
    s.getDouble(4) should be > 0.0
  }

  it should "replicate the exact integer KL pipeline" in {
    val B = 4096L
    val a = docs("p p p")
    val b = docs("q")
    val s = CorpusDrift.summary(a, "text", b, "text").collect().head
    val (ta, tb) = (3L, 1L)
    def lr(ca: Long, cb: Long): Long =
      math.round(math.log(((ca + 1) * (tb + B)).toDouble
        / ((ta + B) * (cb + 1)).toDouble) * 1e6)
    // present buckets: p (3, 0), q (0, 1); absent: B - 2 at (0, 0)
    val klnum = (3 + 1) * lr(3, 0) + (0 + 1) * lr(0, 1) + (B - 2) * lr(0, 0)
    val d = ta + B
    val expectKl =
      if (klnum >= 0) (klnum * 2 + d) / (2 * d) else -(((-klnum) * 2 + d) / (2 * d))
    s.getLong(2) shouldBe expectKl
    val tvnum = math.abs((3 + 1) * (tb + B) - (0 + 1) * (ta + B)) +
      math.abs((0 + 1) * (tb + B) - (1 + 1) * (ta + B)) +
      (B - 2) * math.abs(tb - ta)
    s.getLong(3) shouldBe tvnum
  }

  it should "be partition-independent and reject invalid arguments" in {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(3)
    val a = docs((1 to 50).map(_ =>
      (1 to 10).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")): _*)
    val b = docs((1 to 50).map(_ =>
      (1 to 10).map(_ => s"v${rnd.nextInt(40)}").mkString(" ")): _*)
    val r1 = CorpusDrift.summary(a.repartition(1), "text", b.repartition(1), "text")
      .collect().head.toSeq
    val r2 = CorpusDrift.summary(a.repartition(13), "text", b.repartition(7), "text")
      .collect().head.toSeq
    r1 shouldBe r2
    an[IllegalArgumentException] should be thrownBy
      CorpusDrift.report(a, "text", b, "text", buckets = 1000)
    an[IllegalArgumentException] should be thrownBy
      CorpusDrift.report(a, "text", b, "text", ns = Seq(0))
  }
}
