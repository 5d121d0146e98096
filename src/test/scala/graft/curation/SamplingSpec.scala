package graft.curation

import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * Deterministic sampling contracts: quota selection equals the
 * window-function formulation row for row (but never plans a window —
 * the O(k)-state aggregate is the point), and hash sampling is a pure
 * function of row content.
 */
class SamplingSpec extends AnyFlatSpec with Matchers with AdaptiveSparkPlanHelper {

  lazy val spark = SparkTestKit.spark

  behavior of "Sampling.quotaTopK"

  it should "match the window-function formulation including ties, ranks and both directions" in {
    import spark.implicits._
    // scores collide on purpose: ties must break by ascending id
    val df = (1L to 200L).map(i => (s"s${i % 7}", i, (i % 13).toInt))
      .toDF("source", "doc_id", "score")

    for (desc <- Seq(true, false)) {
      val got = Sampling.quotaTopK(df, Seq("source"), "score", "doc_id", k = 4,
        descending = desc)
        .select("source", "rank", "doc_id", "score")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq

      val ord = if (desc) col("score").desc else col("score").asc
      val exp = df.withColumn("rank",
        row_number().over(Window.partitionBy("source").orderBy(ord, col("doc_id"))))
        .where(col("rank") <= 4)
        .select("source", "rank", "doc_id", "score")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq

      got.sorted shouldBe exp.sorted
    }
  }

  it should "plan the bounded aggregate, not a per-stratum window sort" in {
    import spark.implicits._
    val df = (1L to 100L).map(i => ("one-hot-stratum", i, i * 2)).toDF("source", "doc_id", "score")
    val out = Sampling.quotaTopK(df, Seq("source"), "score", "doc_id", k = 3)
    out.collect()
    val plan = out.queryExecution.executedPlan
    collectWithSubqueries(plan) { case w: WindowExec => w } shouldBe empty
    collectWithSubqueries(plan) { case a: ObjectHashAggregateExec => a } should not be empty
  }

  it should "exclude null scores and ids up front" in {
    import spark.implicits._
    val df = Seq(
      ("s", java.lang.Long.valueOf(1L), java.lang.Integer.valueOf(5)),
      ("s", java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Integer]),
      ("s", null.asInstanceOf[java.lang.Long], java.lang.Integer.valueOf(9))
    ).toDF("source", "doc_id", "score")
    val got = Sampling.quotaTopK(df, Seq("source"), "score", "doc_id", k = 10)
      .select("doc_id").as[Long].collect().toSeq
    got shouldBe Seq(1L)
  }

  behavior of "Sampling.hashSample"

  it should "select deterministically at close to the nominal rate and drop unlisted strata" in {
    import spark.implicits._
    val df = (1L to 4000L).map(i => (s"k$i", if (i % 2 == 0) "half" else "none"))
      .toDF("key", "stratum")
    val thr = Map("half" -> "8000") // rate 0x8000/0x10000 = 50%
    val got = Sampling.hashSample(df, "key", "stratum", thr)
    val again = Sampling.hashSample(df, "key", "stratum", thr)

    got.where(col("stratum") === "none").count() shouldBe 0L
    val kept = got.count()
    kept shouldBe again.count() // bit-identical re-run
    kept.toDouble should be(1000.0 +- 100.0) // 2000 candidates at ~50%
  }

  it should "reject malformed thresholds" in {
    import spark.implicits._
    val df = Seq(("a", "s")).toDF("key", "stratum")
    an[IllegalArgumentException] should be thrownBy
      Sampling.hashSample(df, "key", "stratum", Map("s" -> "80"))
    an[IllegalArgumentException] should be thrownBy
      Sampling.hashSample(df, "key", "stratum", Map("s" -> "ZZZZ"))
  }

  behavior of "Sampling.mixtureSample"

  it should "keep the binding stratum whole and downsample the rest to proportion" in {
    import spark.implicits._
    // supply: a=1000, b=4000, c=4000; targets 2:1:1 — a is binding
    // (its 50% target share is scarcest vs supply), so a keeps 100%
    // (T* = 2000) and b/c keep 500/4000 = 12.5% each
    val df = ((1L to 1000L).map(i => (s"ka$i", "a")) ++
      (1L to 4000L).map(i => (s"kb$i", "b")) ++
      (1L to 4000L).map(i => (s"kc$i", "c")))
      .toDF("key", "stratum")
    val got = Sampling.mixtureSample(df, "key", "stratum",
      Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0)).cache()
    got.where(col("stratum") === "a").count() shouldBe 1000L // rate 1: no hash test
    val nb = got.where(col("stratum") === "b").count().toDouble
    val nc = got.where(col("stratum") === "c").count().toDouble
    nb should be(500.0 +- 75.0)
    nc should be(500.0 +- 75.0)
    // deterministic re-run selects the same rows
    val again = Sampling.mixtureSample(df, "key", "stratum",
      Map("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
    again.exceptAll(got).count() shouldBe 0L
    got.unpersist()
  }

  it should "drop unlisted strata and handle an all-absent mix" in {
    import spark.implicits._
    val df = Seq(("k1", "x"), ("k2", "y")).toDF("key", "stratum")
    Sampling.mixtureSample(df, "key", "stratum", Map("x" -> 1.0))
      .select("stratum").distinct().as[String].collect().toSeq shouldBe Seq("x")
    Sampling.mixtureSample(df, "key", "stratum", Map("absent" -> 1.0))
      .count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Sampling.mixtureSample(df, "key", "stratum", Map("x" -> -1.0))
  }

  behavior of "Sampling.splitByHash"

  it should "assign every row one content-determined split at target rates" in {
    import spark.implicits._
    val df = (0 until 2000).map(i => s"doc $i").toDF("key")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val got = Sampling.splitByHash(df, "key", splits).cache()
    got.count() shouldBe 2000L // total partition: nothing dropped
    val byLabel = got.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    byLabel.keySet shouldBe Set("train", "val", "test")
    byLabel("train").toDouble should be(1600.0 +- 80.0)
    byLabel("val").toDouble should be(200.0 +- 60.0)
    byLabel("test").toDouble should be(200.0 +- 60.0)
    // a row's split is a pure function of its content: an incremental
    // re-run over a subset agrees row-for-row
    val sub = Sampling.splitByHash(
      df.where(expr("length(key) > 7")), "key", splits)
    sub.join(got, Seq("key"))
      .where(sub("split") =!= got("split")).count() shouldBe 0L
    got.unpersist()
  }

  it should "route null keys to the LAST split, explicitly" in {
    import spark.implicits._
    val df = Seq(Some("doc a"), None, Some("doc b"), None).toDF("key")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val got = Sampling.splitByHash(df, "key", splits)
    got.count() shouldBe 4L // partition semantics: null rows keep a label
    got.where(col("key").isNull).select("split")
      .as[String].collect().toSeq shouldBe Seq("test", "test")
  }

  it should "derive oracle-shareable hex boundaries and validate input" in {
    Sampling.splitBoundsHex(
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)) shouldBe Seq("cccd", "e666")
    // weights normalize: 8/1/1 is the same split
    Sampling.splitBoundsHex(
      Seq("a" -> 8.0, "b" -> 1.0, "c" -> 1.0)) shouldBe Seq("cccd", "e666")
    import spark.implicits._
    val df = Seq("k").toDF("key")
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitByHash(df, "key", Seq("only" -> 1.0))
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitByHash(df, "key", Seq("a" -> 1.0, "a" -> 1.0))
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitByHash(df, "key", Seq("a" -> 1.0, "b" -> -0.5))
    // an existing column must not be silently replaced
    val withSplit = Seq(("k", "x")).toDF("key", "split")
    an[IllegalArgumentException] should be thrownBy
      Sampling.splitByHash(withSplit, "key", Seq("a" -> 1.0, "b" -> 1.0))
  }

  behavior of "Sampling.groupSplit"

  it should "never let a near-dup pair straddle the split" in {
    import spark.implicits._
    // 100 docs; a 3-chain (1-2, 2-3) and a detached pair (10-11)
    val docs = (0 until 100).map(i => (i.toLong, s"doc $i")).toDF("id", "body")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_i", "doc_j")
    val splits = Seq("train" -> 0.5, "test" -> 0.5)
    val got = Sampling.groupSplit(docs, "id", pairs, splits).cache()
    got.count() shouldBe 100L // partition semantics: nothing dropped
    val byId = got.select("id", "split").as[(Long, String)].collect().toMap
    // each component shares one label — including across the 1-3 chain
    // (transitive closure, not just direct pairs)
    byId(1L) shouldBe byId(2L)
    byId(2L) shouldBe byId(3L)
    byId(10L) shouldBe byId(11L)
    // singletons label by their own id — identical to splitByHash on
    // the stringified id
    val solo = Sampling.splitByHash(
      docs.where(!col("id").isin(1L, 2L, 3L, 10L, 11L))
        .withColumn("g", col("id").cast("string")), "g", splits)
      .select("id", "split").as[(Long, String)].collect().toMap
    solo.foreach { case (id, s) => byId(id) shouldBe s }
    got.unpersist()
  }

  it should "reject reserved/duplicate output names" in {
    import spark.implicits._
    val docs = Seq((1L, "a")).toDF("id", "body")
    val pairs = Seq((1L, 1L)).toDF("doc_i", "doc_j")
    an[IllegalArgumentException] should be thrownBy
      Sampling.groupSplit(docs.withColumn("split", lit("x")), "id", pairs,
        Seq("a" -> 1.0, "b" -> 1.0))
    an[IllegalArgumentException] should be thrownBy
      Sampling.groupSplit(docs.withColumn("__group", lit("x")), "id", pairs,
        Seq("a" -> 1.0, "b" -> 1.0))
  }

  behavior of "Sampling.temperatureSample"

  it should "keep small strata whole and downsample large ones toward sqrt shares" in {
    import spark.implicits._
    // a=100, b=10000: sqrt weights 10:100 — a binds (keeps 100%), b's
    // rate = (tStar·w_b)/(sumW·c_b) = sqrt(c_a·c_b)/c_b = 1000/10000 = 10%
    val df = ((1L to 100L).map(i => (s"ka$i", "a")) ++
      (1L to 10000L).map(i => (s"kb$i", "b"))).toDF("key", "stratum")
    val got = Sampling.temperatureSample(df, "key", "stratum", alpha = 0.5).cache()
    got.where(col("stratum") === "a").count() shouldBe 100L
    got.where(col("stratum") === "b").count().toDouble should be(1000.0 +- 150.0)
    // deterministic re-run
    Sampling.temperatureSample(df, "key", "stratum", alpha = 0.5)
      .exceptAll(got).count() shouldBe 0L
    got.unpersist()
  }

  it should "keep everything at alpha = 1 (natural proportions) and reject bad alphas" in {
    import spark.implicits._
    val df = ((1L to 50L).map(i => (s"a$i", "a")) ++
      (1L to 500L).map(i => (s"b$i", "b"))).toDF("key", "stratum")
    // alpha = 1: weights = counts, every ratio equal, every rate 1
    Sampling.temperatureSample(df, "key", "stratum", alpha = 1.0)
      .count() shouldBe 550L
    an[IllegalArgumentException] should be thrownBy
      Sampling.temperatureSample(df, "key", "stratum", alpha = 0.0)
    an[IllegalArgumentException] should be thrownBy
      Sampling.temperatureSample(df, "key", "stratum", alpha = 1.5)
  }

  behavior of "Sampling.importanceWeights"

  it should "score target-looking documents above off-domain ones" in {
    import spark.implicits._
    val target = Seq(Tuple1("alpha beta gamma alpha beta"),
      Tuple1("alpha gamma beta alpha")).toDF("text")
    val raw = Seq(
      (1L, "alpha beta gamma beta"),      // target-like
      (2L, "zeta eta theta iota kappa"),  // off-domain
      (3L, "alpha beta zeta eta")         // mixed
    ).toDF("doc_id", "text")
    val got = Sampling.importanceWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.keySet shouldBe Set(1L, 2L, 3L)
    got(1L)._1 shouldBe 7L // 4 unigrams + 3 bigrams
    got(1L)._2 should be > got(3L)._2
    got(3L)._2 should be > got(2L)._2
  }

  it should "be partition-independent and reject invalid bucket counts" in {
    import spark.implicits._
    val target = Seq(Tuple1("t u v w")).toDF("text")
    val raw = (1L to 40L).map(i => (i, s"t u v token$i")).toDF("doc_id", "text")
    val a = Sampling.importanceWeights(raw.repartition(1), "doc_id", "text",
      target, "text").collect().map(_.toSeq).toSet
    val b = Sampling.importanceWeights(raw.repartition(13), "doc_id", "text",
      target, "text").collect().map(_.toSeq).toSet
    a shouldBe b
    an[IllegalArgumentException] should be thrownBy
      Sampling.importanceWeights(raw, "doc_id", "text", target, "text", buckets = 1000)
    an[IllegalArgumentException] should be thrownBy
      Sampling.importanceWeights(raw, "doc_id", "text", target, "text", ns = Seq(1, 1))
  }

  behavior of "Sampling.negativeSamples"

  it should "draw deterministic non-positive items, earliest k per user" in {
    import spark.implicits._
    val pos = Seq((1L, 10L), (1L, 11L), (2L, 12L)).toDF("u", "it")
    val items = (10L to 19L).toDF("it")
    val a = Sampling.negativeSamples(pos, items, "u", "it", k = 3)
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toList
    // re-run is bit-identical (pure md5 function)
    val b = Sampling.negativeSamples(pos, items, "u", "it", k = 3)
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toList
    a shouldBe b
    // no drawn item is a positive; ranks are 1..k' per user
    val posSet = Set((1L, 10L), (1L, 11L), (2L, 12L))
    a.foreach { case (u, r, it) =>
      posSet should not contain ((u, it))
      r should be >= 1L
      r should be <= 3L
    }
    a.map(_._1).distinct.sorted shouldBe List(1L, 2L)
    a.groupBy(_._1).values.foreach(g =>
      g.map(_._2).sorted shouldBe (1L to g.size).toList)
  }

  it should "reject an empty catalog and validate parameters" in {
    import spark.implicits._
    val pos = Seq((1L, 10L)).toDF("u", "it")
    an[IllegalArgumentException] should be thrownBy
      Sampling.negativeSamples(pos, Seq.empty[Long].toDF("it"), "u", "it", 1)
    an[IllegalArgumentException] should be thrownBy
      Sampling.negativeSamples(pos, Seq(1L).toDF("it"), "u", "it", 0)
  }

  behavior of "Sampling.epochPlan"

  it should "hand a repeat factor to every source, NULL to absent ones" in {
    import spark.implicits._
    // corpus: a has 100 tokens, b has 400; weights a=3, b=1, ghost=4
    // (Σw=8), target 800 -> targets 300, 100, 400.
    // epochs: a = 300/100 = 3.0, b = 100/400 = 0.25, ghost = NULL.
    val corpus = (Seq.fill(2)(("a", 50L)) ++ Seq.fill(4)(("b", 100L)))
      .toDF("src", "tok")
    val w = Seq(("a", 3L), ("b", 1L), ("ghost", 4L)).toDF("s", "wt")
    val out = Sampling.epochPlan(corpus, "src", "tok", w, "s", "wt", 800L)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .sortBy(_._1).toList
    out shouldBe List(
      ("a", 100L, 375000L, 300L, Some(3000000L)),
      ("b", 400L, 125000L, 100L, Some(250000L)),
      ("ghost", 0L, 500000L, 400L, None))
  }

  it should "give unweighted corpus sources weight 0 and fail loudly on bad weights" in {
    import spark.implicits._
    val corpus = Seq(("a", 10L), ("z", 5L)).toDF("src", "tok")
    val w = Seq(("a", 1L)).toDF("s", "wt")
    val out = Sampling.epochPlan(corpus, "src", "tok", w, "s", "wt", 100L)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .sortBy(_._1).toList
    out shouldBe List(
      ("a", 10L, 1000000L, 100L, Some(10000000L)),
      ("z", 5L, 0L, 0L, Some(0L)))
    val neg = Seq(("a", -1L)).toDF("s", "wt")
    intercept[Exception] {
      Sampling.epochPlan(corpus, "src", "tok", neg, "s", "wt", 100L).collect()
    }.getMessage should include("must be in [0,")
    val zeros = Seq(("a", 0L)).toDF("s", "wt")
    intercept[Exception] {
      Sampling.epochPlan(corpus, "src", "tok", zeros, "s", "wt", 100L).collect()
    }.getMessage should include("sum to zero")
  }
}
