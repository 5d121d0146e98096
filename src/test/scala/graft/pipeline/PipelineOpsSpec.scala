package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark
import graft.dedup.Dedup
import graft.functions.{MinhashSignature, WordShingles}
import graft.similarity.Similarity
import graft.text.TextFunctions

/** Specs for the training-data pipeline operators: dedup, text analysis,
  * similarity search, and the custom codegen'd expressions backing them. */
class PipelineOpsSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "WordShingles"

  it should "match the composed higher-order-function formulation" in {
    val docs = Seq(
      "a b c d e", "one two three", "x x x x", "  spaced   out  words here ",
      "ab", "", "a b c").toDF("text")
    val native = docs.select(WordShingles.wordShingles(col("text"), 3).as("sh"))
    val composed = docs
      .select(TextFunctions.tokens(col("text")).as("ws"))
      .select(TextFunctions.shingles(col("ws"), 3).as("sh"))
    native.collect().map(_.getSeq[String](0)).toSeq shouldBe
      composed.collect().map(_.getSeq[String](0)).toSeq
  }

  it should "dedupe shingles keeping first occurrence" in {
    val out = Seq("p q p q p q p q").toDF("text")
      .select(WordShingles.wordShingles(col("text"), 2).as("sh"))
      .head.getSeq[String](0)
    out shouldBe Seq("p q", "q p")
  }

  behavior of "MinhashSignature"

  it should "be a permutation-stable minimum (superset shrinks it monotonically)" in {
    val sig1 = Seq(Seq("a b c", "b c d")).toDF("sh")
      .select(MinhashSignature.minhashSignature(col("sh"), 16)).head.getSeq[Long](0)
    val sig2 = Seq(Seq("b c d", "a b c")).toDF("sh")
      .select(MinhashSignature.minhashSignature(col("sh"), 16)).head.getSeq[Long](0)
    sig1 shouldBe sig2 // order-insensitive
    val sup = Seq(Seq("a b c", "b c d", "zz yy xx")).toDF("sh")
      .select(MinhashSignature.minhashSignature(col("sh"), 16)).head.getSeq[Long](0)
    sig1.zip(sup).foreach { case (s, t) => t should be <= s }
  }

  behavior of "Dedup"

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different text with other words entirely present"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "short one")).toDF("doc_id", "text")

  it should "group exact duplicates to the minimum id" in {
    val canon = Dedup.exactCanon(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    canon shouldBe Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 4L)
  }

  it should "pick keepers by score under exactCanonBy, ties to the smallest id" in {
    val scored = docs.withColumn("q",
      when(col("doc_id") === 3L, 9.0).otherwise(col("doc_id").cast("double")))
    // doc 3 outscores its duplicate twin 0 — freshest/highest-quality wins
    Dedup.exactCanonBy(scored, "doc_id", "text", "q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(0L -> 3L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    // ascending: the LOWEST score wins; equal scores tie to the min id
    val tied = docs.withColumn("q", lit(1.0))
    Dedup.exactCanonBy(tied, "doc_id", "text", "q", descending = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 4L)
  }

  it should "never let a null score win a group, falling back to min id when all are null" in {
    val scored = docs.withColumn("q",
      when(col("doc_id") === 3L, lit(null).cast("double"))
        .when(col("doc_id") === 0L, 5.0)
        .otherwise(lit(null).cast("double")))
    // group {0, 3}: 3's null never beats 0's 5.0; singleton null groups
    // keep their own (minimum) id
    Dedup.exactCanonBy(scored, "doc_id", "text", "q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 4L)
  }

  it should "find near-dup pairs by exact shingle Jaccard" in {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 1L), (0L, 3L), (1L, 3L))
    // exact duplicates have jac exactly 1.0
    Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .where("doc_i = 0 and doc_j = 3").head.getDouble(2) shouldBe 1.0
  }

  it should "recall the same pairs via MinHash-LSH with exact verification" in {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.minhashPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    lsh shouldBe exact
  }

  it should "emit exactly the exact-join pair set through prefix filtering" in {
    // prefix filtering is lossless: identical (doc_i, doc_j, jac) rows
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    pref shouldBe exact
  }

  it should "match the exact join under randomized corpora and thresholds (prefix)" in {
    // randomized equivalence across tau, including tau = 1.0 (prefix
    // length collapses to 1) and repeated/near-dup docs
    val rnd = new scala.util.Random(421)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val texts = (0 until 60).foldLeft(Vector.empty[String]) { (acc, i) =>
      // inject exact dups of the previous doc every 7th position
      if (i % 7 == 3 && acc.nonEmpty) acc :+ acc.last
      else acc :+ (0 until (5 + rnd.nextInt(20)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (tau <- Seq(0.4, 0.8, 1.0)) {
      val exact = Dedup.jaccardPairs(df, "doc_id", "text", tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val pref = Dedup.jaccardPairsPrefix(df, "doc_id", "text", tau = tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      withClue(s"tau=$tau: ") { pref shouldBe exact }
    }
  }

  it should "stay sound under a maxDocFreq skew cap (capped pairs are a subset)" in {
    // dropping hot shingles removes them from intersection counts only, so
    // capped Jaccard <= exact Jaccard: the cap may lose pairs (documented
    // recall trade-off) but can never invent them
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped.subsetOf(exact) shouldBe true
    // a generous cap changes nothing
    Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.5, maxDocFreq = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe exact
  }

  it should "audit curation verdicts consistently with curate's survivors" in {
    val mixed = Seq(
      (0L, "the and for with this that from are was have some words here"),
      (1L, "the and for with this that from are was have some words here"), // dup of 0
      (2L, "le la et un une dans pour sur avec est sont ce cette mots"),
      (3L, "the and"), // too short
      (4L, "the the the the the the the the the the")) // degenerate
      .toDF("doc_id", "text")
    val audit = graft.api.PyFacade.curateAudit(mixed, "doc_id", "text",
        lang = "en", minTokens = 5, minDistinctRatio = 0.3)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    audit shouldBe Map(
      0L -> ((true, "kept")), 1L -> ((false, "duplicate")),
      2L -> ((false, "lang")), 3L -> ((false, "short")),
      4L -> ((false, "degenerate")))
    // kept=true ids == curate's survivor ids, by construction
    val survivors = graft.api.PyFacade.curate(mixed, "doc_id", "text",
      "en", 5, 0.3).select("doc_id").collect().map(_.getLong(0)).toSet
    audit.filter(_._2._1).keySet shouldBe survivors
  }

  it should "find exact duplicates by SimHash (identical fingerprints)" in {
    // exact duplicates have identical fingerprints (hamming 0)
    Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet should contain((0L, 3L))
    Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .where("doc_i = 0 and doc_j = 3").head.getInt(2) shouldBe 0
  }

  it should "emit exactly the brute-force SimHash pair set (fp-collapse is invisible)" in {
    // many exact-dup clusters + near-dups: the collapsed (band distinct
    // fingerprints, re-expand members) plan must equal all-pairs popcount
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta epsilon eta", "alpha beta gamma delta epsilon zeta",
      "totally unrelated words here live now", "totally unrelated words here live now",
      "moon sun star cloud rain snow wind")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (hasher <- Seq(
        graft.functions.TextSimhash.textSimhash _,
        graft.functions.Md5Simhash.md5Simhash _)) {
      val fp = d.select(col("doc_id"),
        hasher(graft.functions.WordShingles.wordShingles(col("text"), 1)).as("fp"))
      val brute = fp.as("a").join(fp.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("h"))
        .where(col("h") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val banded = Dedup.simhashPairs(d, "doc_id", "text", hasher = hasher)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      banded shouldBe brute
    }
  }

  it should "not inflate the band join on a massive exact-dup cluster" in {
    // 10k byte-identical copies: the old per-doc banding would push
    // 4·10k rows into the band join and dropDuplicates 2·10⁸ candidate
    // pairs; the collapsed plan bands ONE row and the only quadratic
    // stage is the output-sized member expansion
    val n = 10000
    val cluster = spark.range(n).selectExpr("id as doc_id",
      "'same boilerplate text repeated everywhere' as text")
      .unionByName(Seq((1000000L, "one genuinely different document text"))
        .toDF("doc_id", "text"))
    val pairs = Dedup.simhashPairs(cluster, "doc_id", "text")
    pairs.count() shouldBe n.toLong * (n - 1) / 2
  }

  it should "recall clustered embedding pairs through LSH buckets with exact cosines" in {
    // 3 tight clusters of near-parallel vectors + isolated noise: the
    // near-dup regime the defaults target. LSH output must equal the
    // exact brute-force pairs — same pairs, same cos_r6 values
    val rnd = new scala.util.Random(7)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def jitter(base: Array[Float]): Array[Float] =
      base.zipWithIndex.map { case (x, i) => x + 0.02f * (((i * 31 + 7) % 5) - 2) }
    val centers = Seq.fill(3)(unit(32))
    val members = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 6).map(j => ((ci * 100 + j).toLong, if (j == 0) c else jitter(c)))
    }
    val noise = (0 until 40).map(i => ((1000 + i).toLong, unit(32)))
    val vecs = (members ++ noise).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingPairs(vecs, "vec_id", "embedding", tau = 0.9)
      .collect().map(_.mkString("|")).toSet
    val lsh = Dedup.embeddingPairsLsh(vecs, "vec_id", "embedding", tau = 0.9)
      .collect().map(_.mkString("|")).toSet
    exact.size should be >= (3 * 6 * 5 / 2) // every intra-cluster pair qualifies
    lsh shouldBe exact
  }

  it should "find embedding-cosine near-dup pairs exactly" in {
    val vecs = Seq(
      (0L, Array(1.0f, 0.1f, 0.0f)),
      (1L, Array(0.99f, 0.12f, 0.01f)), // near-parallel to 0
      (2L, Array(-0.5f, 0.9f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(vecs, "vec_id", "embedding", tau = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe Set((0L, 1L))
  }

  it should "cluster near-dup pairs into connected components" in {
    // a 4-chain (needs multiple propagation rounds), a triangle, and an
    // isolated pair — min member id labels each component
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),     // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (20L, 21L))                        // pair
      .toDF("doc_i", "doc_j")
    val got = Dedup.clusterPairs(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L),
      (20L, 20L), (21L, 20L))
  }

  it should "converge a long chain in O(log diameter) rounds via pointer jumping" in {
    // a 31-node path graph (diameter 30): plain min-label propagation
    // needs ~30 rounds; the pointer-jumping pass collapses it in ~6.
    // maxIters=10 would fail loudly under O(diameter) propagation.
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("doc_i", "doc_j")
    val got = Dedup.clusterPairs(chain, maxIters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe (0L to 30L).map(i => (i, 0L)).toSet
  }

  it should "fail loudly when maxIters truncates propagation" in {
    // diameter-4 chain at maxIters=2: labels are still moving when the
    // cap hits, so the default handler must throw rather than hand back
    // a possibly split / non-canonical clustering
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_i", "doc_j")
    val ex = intercept[IllegalStateException] {
      Dedup.clusterPairs(chain, maxIters = 2).collect()
    }
    ex.getMessage should include("maxIters")
    // observe-and-continue path: the handler sees the cap hit and the
    // truncated labels come back (a valid partition refinement or not —
    // caller's informed choice)
    var sawChanged = -1L
    val rows = Dedup.clusterPairs(chain, maxIters = 2,
      onCapHit = c => sawChanged = c).collect()
    sawChanged should be > 0L
    rows.length shouldBe 5
  }

  it should "bucket exhaustively at the dedup_embedding_lsh gate settings" in {
    // pins the gate's exhaustiveness claim (LSH pair set == exact pair
    // set at planes=5/tables=24, tau=0.5) to the data it was verified
    // on — a testdata regeneration that breaks the claim fails HERE, not
    // as a mysterious oracle hash-mismatch downstream
    val dir = "/root/testdata/sf0.01"
    // HARD failure, not a skip: this spec is the pin for a gate-oracle
    // exhaustiveness claim — silently skipping when the data moved is
    // exactly the blind spot it exists to close
    require(new java.io.File(s"$dir/embeddings.parquet").exists(),
      s"gate testdata missing at $dir — the exhaustiveness pin cannot run")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).toSet
    val exact = snap(Dedup.embeddingPairs(emb, "vec_id", "embedding", tau = 0.5))
    val lsh = snap(Dedup.embeddingPairsLsh(emb, "vec_id", "embedding",
      tau = 0.5, planes = 5, tables = 24))
    lsh shouldBe exact
  }

  it should "flag near-supersets by containment that Jaccard misses" in {
    // doc 2 wraps doc 1's full text in 4x the boilerplate: containment of
    // the smaller side is ~1.0 while Jaccard stays far below any useful
    // dedup threshold
    val core = (1 to 12).map(i => s"core$i").mkString(" ")
    val wrap = (1 to 48).map(i => s"pad$i").mkString(" ")
    val docs = Seq((1L, core), (2L, s"$core $wrap"), (3L, "entirely different text here okay"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", tau = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    cont.map(p => (p._1, p._2)).toSeq shouldBe Seq((1L, 2L))
    cont.head._3 should be >= 0.9
    Dedup.jaccardPairs(docs, "doc_id", "text", tau = 0.8).count() shouldBe 0
  }

  behavior of "TextFunctions"

  it should "count BPE-ish tokens (words, digit runs, punctuation marks)" in {
    val got = Seq(
      "don't stop!",        // don ' t stop !        = 5
      "a1b2",               // a 1 b 2               = 4
      "  spaced   out  ",   // spaced out            = 2
      "42",                 // 42                    = 1
      "",                   //                       = 0
      "ab",           // vertical tab = whitespace (explicit in the
                            // pattern — Java \s and RE2 \s disagree on it)
      "...").               // . . .                 = 3
      toDF("text")
      .select(TextFunctions.bpeTokenCount(col("text")).as("n"))
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(5L, 4L, 2L, 1L, 0L, 2L, 3L)
  }

  it should "count tokens and compute exact ratios" in {
    val out = Seq("the cat the cat runs").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("ws"))
      .select(
        TextFunctions.tokenCount(col("ws")).as("n"),
        TextFunctions.stopwordRatio(col("ws")).as("sr"),
        TextFunctions.distinctTokenRatio(col("ws")).as("dr"),
        TextFunctions.avgTokenLen(col("ws")).as("al"))
      .head
    out.getLong(0) shouldBe 5L
    out.getDouble(1) shouldBe 2.0 / 5.0
    out.getDouble(2) shouldBe 3.0 / 5.0
    out.getDouble(3) shouldBe 16.0 / 5.0
  }

  it should "tokenize Unicode whitespace (tab/NBSP/NEL/ideographic space) with tokensUnicode" in {
    val got = Seq(
      "hello\tworld\u00A0foo",   // tab + NBSP delimiters
      "a  b\u3000c\n\nd",   // runs collapse: 2 spaces, ideographic space, newlines
      // thin space / NEL / line-separator delimiters, trailing medium space
      "\u2009lead\u0085mid\u2028trail\u205F",
      "plain space only",   // agrees with tokens() on single-space text
      "\u00A0\u3000\t",   // all-whitespace => no tokens
      "")
      .toDF("text")
      .select(TextFunctions.tokensUnicode(col("text")).as("ws"))
      .collect().map(_.getSeq[String](0).toList).toList
    got shouldBe List(
      List("hello", "world", "foo"),
      List("a", "b", "c", "d"),
      List("lead", "mid", "trail"),
      List("plain", "space", "only"),
      Nil, Nil)
    // the single-space split UNDER-tokenizes the same fixtures -- the
    // documented reason the unicode variant exists
    val legacy = Seq("hello\tworld\u00A0foo").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("ws"))
      .head().getSeq[String](0)
    legacy shouldBe Seq("hello\tworld\u00A0foo")
  }

  it should "identify language by marker words with deterministic ties" in {
    val out = Seq("the cat and dog", "der hund und die katze", "xyzzy plugh")
      .toDF("text")
      .select(TextFunctions.langId(TextFunctions.tokens(col("text"))).as("lang"))
      .collect().map(_.getString(0)).toSeq
    out shouldBe Seq("en", "de", "und")
  }

  it should "redact emails, IPv4s and long digit runs with typed placeholders" in {
    val out = Seq(
      "mail bob.smith+x@corp.example.org now",
      "server 192.168.100.7 down",
      "card 4111 1111 1111 1111 charged",
      "short 12 34 numbers stay",          // too short for a digit run
      "version 1.2.3 stays").toDF("text") // not 4 dot-groups -> no IP
      .select(TextFunctions.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0)).toSeq
    out shouldBe Seq(
      "mail <EMAIL> now",
      "server <IP> down",
      "card <NUM> charged",
      "short 12 34 numbers stay",
      "version 1.2.3 stays")
  }

  it should "chunk token windows with overlap, clipping the final chunk" in {
    def chunks(text: String, c: Int, o: Int): Seq[String] =
      Seq(text).toDF("text")
        .select(TextFunctions.tokenChunks(
          TextFunctions.tokens(col("text")), c, o).as("ch"))
        .head().getSeq[String](0)
    // 10 tokens, chunk 4, overlap 1: starts 1, 4, 7 (10 > n - o = 9)
    chunks("t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", 4, 1) shouldBe Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10")
    // 9 tokens: the final chunk clips short
    chunks("t1 t2 t3 t4 t5 t6 t7 t8 t9", 4, 1) shouldBe Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9")
    // shorter than one chunk: the whole doc, once
    chunks("t1 t2", 4, 1) shouldBe Seq("t1 t2")
    // zero overlap tiles exactly
    chunks("t1 t2 t3 t4 t5", 4, 0) shouldBe Seq("t1 t2 t3 t4", "t5")
    an[IllegalArgumentException] should be thrownBy
      TextFunctions.tokenChunks(col("x"), 4, 4)
  }

  it should "pack sequences to the exact global cumsum positions, independent of grouping" in {
    val rnd = new scala.util.Random(41)
    // sparse, shuffled-insertion ids: grouping spans stay uneven
    val rows = (0 until 500).map(i => (i * 7L + rnd.nextInt(5),
      Seq.fill(1 + rnd.nextInt(30))("w").mkString(" ")))
      .distinctBy(_._1)
    val df = rows.toDF("doc_id", "text").repartition(7)
    val got = TextFunctions.packSequences(df, "doc_id", "text", budget = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // brute force: one sequential pass in id order
    var cum = 0L
    val expect = rows.sortBy(_._1).map { case (id, text) =>
      val n = text.split(" ").count(_.nonEmpty).toLong
      val start = cum; cum += n
      (id, n, start / 64, start % 64)
    }
    got.toSeq shouldBe expect
    // offsets stay inside the budget; bins are monotone in id order
    all(got.map(_._4)) should be < 64L
    got.map(_._3).toSeq shouldBe got.map(_._3).sorted.toSeq
    // grouping granularity never changes positions (1 group == default)
    val oneGroup = TextFunctions.packSequences(df, "doc_id", "text", budget = 64,
      targetGroups = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    oneGroup.toSeq shouldBe expect
  }

  behavior of "Similarity"

  it should "rank exact cosine top-k with id tie-breaks" in {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f)),  // nearly parallel to 0
      (2L, Array(0.0f, 1.0f)),   // orthogonal to 0
      (3L, Array(-1.0f, 0.0f))). // opposite to 0
      toDF("vec_id", "embedding")
    val top = Similarity.cosineTopK(
      vecs.where("vec_id = 0"), vecs, "vec_id", "embedding", k = 3)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(3)))
    top.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L) // by descending cosine
  }

  it should "mine hard negatives: similar-but-below-threshold, re-ranked" in {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.02f)),  // cos ~0.9998: a near-dup -> EXCLUDED
      (2L, Array(0.8f, 0.6f)),   // cos 0.8: hard negative rank 1
      (3L, Array(0.6f, 0.8f)),   // cos 0.6: hard negative rank 2
      (4L, Array(0.0f, 1.0f)))   // cos 0: rank 3
      .toDF("vec_id", "embedding")
    val out = Similarity.hardNegatives(
        vecs.where("vec_id = 0"), vecs, "vec_id", "embedding",
        k = 3, shortlist = 4, dupThreshold = 0.95)
      .orderBy("rnk").collect().map(r => (r.getLong(1), r.getLong(3)))
    out.map(_._1).toSeq shouldBe Seq(2L, 3L, 4L)
    out.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L)
    an[IllegalArgumentException] should be thrownBy
      Similarity.hardNegatives(vecs, vecs, "vec_id", "embedding",
        k = 5, shortlist = 3)
  }

  it should "retrieve the near-neighbor through SimHash LSH buckets" in {
    val base = (0 until 50).map { i =>
      val ang = i * 0.12
      (i.toLong, Array(math.cos(ang).toFloat, math.sin(ang).toFloat, 0.1f, 0.2f))
    }
    val vecs = (base :+ (99L, base.head._2.map(v => v * 0.999f))).toDF("vec_id", "embedding")
    val out = Similarity.lshCosineTopK(
      vecs.where("vec_id = 99"), vecs, "vec_id", "embedding", k = 1,
      planes = 4, tables = 4)
    // the almost-identical vector 0 must land in the same bucket and rank 1
    out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((99L, 0L))
  }

  it should "match exact top-k when IVF probes every cell (nprobe = nlist)" in {
    // structural exactness: each candidate lives in exactly one cell and
    // the query probes all of them, so every pair is scored — any data
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "cos_r6", "rnk").collect().map(_.mkString("|")).toSet
    val exact = snap(Similarity.cosineTopK(
      vecs.where("vec_id < 5"), vecs, "vec_id", "embedding", k = 7))
    val ivf = snap(Similarity.ivfTopK(
      vecs.where("vec_id < 5"), vecs, "vec_id", "embedding", k = 7,
      nlist = 6, nprobe = 6))
    ivf shouldBe exact
  }

  it should "recover recall with trained IVF centroids at nprobe << nlist" in {
    // clustered corpus where quantizer quality decides recall: 8 tight
    // clusters, id-ordered so the first-8-by-id sample quantizer lands
    // ALL its centroids in cluster 0 (worst case for the id sample);
    // trained spherical k-means must find the cluster structure and
    // push recall@10 >= 0.9 at nprobe = 2 of nlist = 8
    // corpus + measurement live in graft.similarity.RecallProbe so the
    // bench can emit the same numbers as a recorded per-round artifact
    // (a quantizer regression changes a number, not just this bit)
    val (trained, sampled) = graft.similarity.RecallProbe.measure(spark)
    withClue(s"trained=$trained sampled=$sampled: ") {
      trained should be >= 0.9
      sampled should be <= trained
    }
  }

  it should "never lose recall to the id-sample quantizer on the gate embeddings" in {
    // the gate embeddings are isotropic noise (mean pairwise cosine
    // ~0.002, top-10 neighbor cosines ~0.3): at nprobe = 2 of nlist = 8
    // NO quantizer reaches high recall there — cell membership of true
    // neighbors is near-random, so ~0.6 is the information-theoretic
    // regime, which is exactly why the clustered spec above carries the
    // >= 0.9 bar. Here we pin the weaker invariant that training never
    // DEGRADES recall vs the id sample on real gate data.
    val dir = "/root/testdata/sf0.01"
    require(new java.io.File(s"$dir/embeddings.parquet").exists(),
      s"gate testdata missing at $dir — the recall pin cannot run")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 20)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(q, emb, "vec_id", "embedding", k = 10))
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 5)
    val trained = pairs(Similarity.ivfTopKWith(q, emb, cents, "vec_id", "embedding", 10, 2))
    val sampled = pairs(Similarity.ivfTopK(q, emb, "vec_id", "embedding", 10,
      nlist = 8, nprobe = 2))
    def recall(got: Set[(Long, Long)]) = got.intersect(exact).size.toDouble / exact.size
    // on noise the two quantizers are statistically indistinguishable
    // (observed 0.610 vs 0.615 — one pair in 200); the pin is "training
    // does not collapse recall", with a small tolerance for that tie
    withClue(s"trained=${recall(trained)} sampled=${recall(sampled)}: ") {
      recall(trained) should be >= recall(sampled) - 0.05
      recall(trained) should be > 0.4
    }
  }

  it should "handle IVF degenerate sides: one centroid, empty candidates" in {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    // nlist=1: a single coarse cell must behave like brute force
    val one = Similarity.ivfTopK(vecs.where("vec_id = 0"), vecs,
      "vec_id", "embedding", k = 2, nlist = 1, nprobe = 1)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    one shouldBe Seq(1L, 2L)
    // empty candidate side: empty result with the contract schema
    val empty = Similarity.ivfTopK(vecs, vecs.limit(0), "vec_id", "embedding", k = 2)
    empty.columns.toSeq shouldBe Seq("qid", "cid", "cos_r6", "rnk")
    empty.count() shouldBe 0
  }

  it should "keep high recall with IVF probing a fraction of cells on clustered data" in {
    // clusters around distinct centers: a query's true neighbors share
    // its cell, so nprobe=2 of 8 cells must still find the true top-1
    val rnd = new scala.util.Random(13)
    def unit16(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Seq.fill(4)(unit16())
    val members = centers.zipWithIndex.flatMap { case (c, ci) =>
      (0 until 10).map { j =>
        ((ci * 100 + j).toLong, c.zipWithIndex.map { case (x, d) =>
          x + 0.03f * (((d * 17 + j * 7) % 5) - 2) })
      }
    }
    val vecs = members.toDF("vec_id", "embedding")
    val queries = vecs.where("vec_id % 100 = 0") // one per cluster
    val exactTop1 = Similarity.cosineTopK(queries, vecs, "vec_id", "embedding", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfTop1 = Similarity.ivfTopK(queries, vecs, "vec_id", "embedding", k = 1,
      nlist = 8, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    ivfTop1 shouldBe exactTop1
  }

  it should "retrieve exhaustively at the gate's over-provisioned settings" in {
    // pins the simsearch_lsh oracle claim to the data it was verified on:
    // at (3 planes, 32 tables) the deterministic bucketing retrieves
    // every true top-10 candidate on the gate embeddings, so LSH == exact
    // (rank for rank). If the driver regenerates the testdata and this
    // stops holding, THIS spec fails — not the downstream oracle gate.
    val dir = "/root/testdata/sf0.01"
    // HARD failure, not a skip: this spec is the pin for a gate-oracle
    // exhaustiveness claim — silently skipping when the data moved is
    // exactly the blind spot it exists to close
    require(new java.io.File(s"$dir/embeddings.parquet").exists(),
      s"gate testdata missing at $dir — the exhaustiveness pin cannot run")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 20)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "cid", "cos_r6", "rnk").collect().map(_.mkString("|")).toSet
    val exact = snap(Similarity.cosineTopK(q, emb, "vec_id", "embedding", k = 10))
    val lsh = snap(Similarity.lshCosineTopK(q, emb, "vec_id", "embedding", k = 10,
      planes = 3, tables = 32))
    exact.size shouldBe 200
    lsh shouldBe exact
  }
}
