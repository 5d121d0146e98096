package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit

/**
 * [[Unigram]] contract: Viterbi picks the globally best segmentation
 * (where greedy BPE-style longest-match would not), ties break toward
 * fewer pieces, unknown characters stay covered, the combined integer
 * encoding round-trips, and the parquet artifact reproduces the model.
 */
class UnigramSpec extends AnyFlatSpec with Matchers {

  lazy val spark = SparkTestKit.spark

  private def df(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  behavior of "Unigram"

  it should "train a coverage-complete vocabulary with micro-nat log-probs" in {
    val m = Unigram.train(df("abab abab cd"), "text", vocabSize = 4, maxPieceLen = 3)
    // every character present is a piece (coverage guarantee)
    Set("a", "b", "c", "d").subsetOf(m.pieces.keySet) shouldBe true
    // multi-char pieces bounded by vocabSize
    m.pieces.keys.count(_.length > 1) should be <= 4
    // probabilities: counts over the selected total — all negative logs
    all(m.pieces.values) should be < 0L
  }

  it should "segment with globally optimal Viterbi and prefer fewer pieces on ties" in {
    import spark.implicits._
    // hand-built model: "ab", "cd" strong pieces; singles weak
    val m = Unigram.Model(
      Map("ab" -> -1000000L, "cd" -> -1000000L,
        "a" -> -5000000L, "b" -> -5000000L, "c" -> -5000000L, "d" -> -5000000L,
        "abc" -> -4000000L),
      maxPieceLen = 3, unkMicro = -18000000L)
    val r = Seq("abcd").toDF("w")
      .select(Unigram.wordScore(col("w"), m).as("s"))
      .select(col("s.score_micro"), col("s.n_pieces")).head
    // ab + cd = -2e6 (2 pieces) beats abc + d = -9e6 and singles -20e6
    r.getLong(0) shouldBe -2000000L
    r.getLong(1) shouldBe 2L
    // tie on score: "ab"+"ab" (-2e6, 2 pieces) vs any 3+-piece -2e6 path
    // — the combined encoding already prefers the 2-piece split
    val m2 = Unigram.Model(
      Map("ab" -> -1000000L, "a" -> -500000L, "b" -> -500000L),
      maxPieceLen = 2, unkMicro = -18000000L)
    val r2 = Seq("abab").toDF("w")
      .select(Unigram.wordScore(col("w"), m2).as("s"))
      .select(col("s.score_micro"), col("s.n_pieces")).head
    // a+b+a+b also sums -2e6 — equal score, MORE pieces: ab+ab wins
    r2.getLong(0) shouldBe -2000000L
    r2.getLong(1) shouldBe 2L
  }

  it should "cover unknown characters via the UNK penalty, never dropping a word" in {
    import spark.implicits._
    val m = Unigram.Model(Map("x" -> -100000L), maxPieceLen = 2,
      unkMicro = -18000000L)
    val r = Seq("xqx").toDF("w")
      .select(Unigram.wordScore(col("w"), m).as("s"))
      .select(col("s.score_micro"), col("s.n_pieces")).head
    r.getLong(0) shouldBe (-100000L - 18000000L - 100000L)
    r.getLong(1) shouldBe 3L
  }

  it should "count trained subwords per text and round-trip through parquet" in {
    import spark.implicits._
    val corpus = df("ababab ababab cdcd", "ababab cdcd cdcd")
    val m = Unigram.train(corpus, "text", vocabSize = 8, maxPieceLen = 4)
    val counts = corpus.select(Unigram.tokenCount(col("text"), m).as("n"))
      .collect().map(_.getLong(0))
    all(counts) should be > 0L
    val path = java.nio.file.Files.createTempDirectory("graft-unigram-spec-").toString
    Unigram.piecesDF(spark, m).write.mode("overwrite").parquet(path)
    val m2 = Unigram.piecesFrom(spark.read.parquet(path))
    m2 shouldBe m
    an[IllegalArgumentException] should be thrownBy
      Unigram.train(corpus, "text", vocabSize = 0)
  }

  it should "serve natively exactly like the expression fold (randomized)" in {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 6) {
      val alpha = "abc".take(1 + rnd.nextInt(3))
      val words = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(14))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val m = Unigram.train(docs, "text", vocabSize = 1 + rnd.nextInt(32),
        maxPieceLen = 1 + rnd.nextInt(5))
      val wdf = docs.select(org.apache.spark.sql.functions.explode(
        TextFunctions.tokens(org.apache.spark.sql.functions.col("text"))).as("w")).distinct()
      val diff = wdf
        .select(org.apache.spark.sql.functions.col("w"),
          Unigram.wordScore(org.apache.spark.sql.functions.col("w"), m).as("a"),
          Unigram.wordScoreFold(org.apache.spark.sql.functions.col("w"), m).as("b"))
        .where("a.score_micro != b.score_micro OR a.n_pieces != b.n_pieces")
        .collect()
      assert(diff.isEmpty, s"trial $trial: native/fold diverged: ${diff.take(3).mkString(";")}")
    }
  }

  it should "serve a large vocabulary over long words (vocab-scale path)" in {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val derived = docs
      .select(org.apache.spark.sql.functions.col("doc_id"),
        TextFunctions.tokens(org.apache.spark.sql.functions.col("text")).as("ws"))
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.concat_ws(" ", org.apache.spark.sql.functions.expr(
          "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), (w, i) -> concat(w, '_', ws[i + 1]))"))
          .as("btext"))
    val m = Unigram.train(derived, "btext", vocabSize = 512, maxPieceLen = 4)
    assert(m.pieces.size > 256) // genuinely large piece table
    val scored = derived.select(org.apache.spark.sql.functions.explode(
        TextFunctions.tokens(org.apache.spark.sql.functions.col("btext"))).as("w")).distinct()
      .select(org.apache.spark.sql.functions.col("w"),
        Unigram.wordScore(org.apache.spark.sql.functions.col("w"), m).as("sc"))
      .collect()
    assert(scored.nonEmpty)
    // every word scored (no NULL-louds: runtime has no position cap)
    scored.foreach { r =>
      val sc = r.getStruct(1)
      assert(sc.getLong(0) < 0 && sc.getLong(1) >= 1, s"bad score for ${r.getString(0)}")
    }
  }

  it should "backtrack the best path (smallest-k rule) consistently with score" in {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = Unigram.train(docs, "text", vocabSize = 64, maxPieceLen = 4)
    val rt = Unigram.runtime(m)
    val words = docs
      .select(org.apache.spark.sql.functions.explode(
        TextFunctions.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      val pieces = rt.segment(w)
      // the segmentation reassembles the word exactly...
      assert(pieces.mkString("") == w, s"lossy segmentation of $w")
      // ...and its piece count matches the DP's fewest-pieces answer
      assert(pieces.length == rt.score(w)(1),
        s"backtrack path length ${pieces.length} != DP n_pieces for $w")
      // every multi-char piece is vocabulary (unknown multis forbidden)
      pieces.filter(p => p.codePointCount(0, p.length) > 1)
        .foreach(p => assert(rt.pieces.containsKey(p), s"unknown multi piece $p"))
    }
  }

  it should "refine by one Viterbi-EM round without breaking serving" in {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m0 = Unigram.train(docs, "text", vocabSize = 64, maxPieceLen = 4)
    val m1 = Unigram.emRefine(docs, "text", m0)
    // EM keeps only path-used vocabulary: never grows, stays non-empty
    assert(m1.pieces.nonEmpty && m1.pieces.size <= m0.pieces.size)
    assert(m1.pieces.keySet.subsetOf(m0.pieces.keySet))
    assert(m1.maxPieceLen == m0.maxPieceLen && m1.unkMicro == m0.unkMicro)
    // log-probs re-normalize: every kept piece has lp < 0; pieces the
    // corpus actually uses got RELATIVELY more probable or equal mass
    m1.pieces.values.foreach(lp => assert(lp < 0))
    // the refined model still serves every corpus word
    val scored = docs.select(org.apache.spark.sql.functions.explode(
        TextFunctions.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .distinct()
      .select(Unigram.wordScore(org.apache.spark.sql.functions.col("w"), m1).as("sc"))
      .collect()
    scored.foreach(r => assert(r.getStruct(0).getLong(1) >= 1))
    // EM is deterministic: same input, same refined model
    val m1b = Unigram.emRefine(docs, "text", m0)
    assert(m1b.pieces == m1.pieces)
  }

  it should "record a monotone non-decreasing corpus log-likelihood over >=3 EM rounds" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m0 = Unigram.train(docs, "text", vocabSize = 64, maxPieceLen = 4)
    val r = Unigram.emTrain(docs, "text", m0, rounds = 3)
    // trajectory shape: seed score first, one entry per round
    r.llMicro.length shouldBe 4
    // hard-EM guarantee, pinned EXACTLY on the fixture corpus: each
    // round's re-segmentation + MLE renormalization never lowers the
    // total Viterbi score (micro-nat rounding noise stays below the
    // per-round improvements here)
    r.llMicro.sliding(2).foreach { case Array(a, b) =>
      assert(b >= a, s"LL decreased: ${r.llMicro.mkString(",")}")
    }
    // trajectory entries ARE corpusScore: endpoints recompute exactly
    Unigram.corpusScore(docs, "text", m0) shouldBe r.llMicro.head
    Unigram.corpusScore(docs, "text", r.model) shouldBe r.llMicro.last
    // emTrain == emRefine composed (the cached-histogram path changes
    // the job shape, never the statistics)
    val viaRefine =
      Unigram.emRefine(docs, "text",
        Unigram.emRefine(docs, "text", Unigram.emRefine(docs, "text", m0)))
    r.model.pieces shouldBe viaRefine.pieces
  }

  it should "round-trip the EM artifact (model + trajectory) bit-for-bit" in {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m0 = Unigram.train(docs, "text", vocabSize = 48, maxPieceLen = 3)
    val r = Unigram.emTrain(docs, "text", m0, rounds = 2)
    val path = java.nio.file.Files.createTempDirectory("unigram_em").toString + "/m"
    graft.ml.ModelStore.saveUnigram(spark, r, path)
    val back = graft.ml.ModelStore.loadUnigram(spark, path)
    back.model.pieces shouldBe r.model.pieces
    back.model.maxPieceLen shouldBe r.model.maxPieceLen
    back.model.unkMicro shouldBe r.model.unkMicro
    back.llMicro.toSeq shouldBe r.llMicro.toSeq
  }
}
