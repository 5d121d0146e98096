package graft.text

import graft.SparkTestKit
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestKit.spark
  import spark.implicits._

  /** Driver-side reference BPE: greedy left-to-right merge application
    * over symbol lists — the classic formulation, independent of the
    * string-replace encoding the engine uses. */
  private def refApply(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (a + b) :: refApply(rest, l, r)
      case a :: rest => a :: refApply(rest, l, r)
      case Nil => Nil
    }

  private def refSegment(word: String, merges: Seq[Bpe.Merge]): List[String] =
    merges.foldLeft(word.map(_.toString).toList) { (s, m) =>
      refApply(s, m.left, m.right)
    }

  test("training learns the hand-computed merge sequence") {
    // "low low low lower lowest": pair counts round 1 -> (l,o)=5 top;
    // round 2 -> (lo,w)=5; round 3 -> (low,e)=2 ties (e,r)/(e,s)... —
    // (low,e) wins on left asc? counts: after 'low' merges:
    // words: low(3) lower(1) lowest(1) -> states " low ", " low e r ",
    // " low e s t ". pairs: (low,e)=2, (e,r)=1, (e,s)=1, (s,t)=1.
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val ms = Bpe.train(docs, "text", rounds = 4)
    assert(ms.map(m => (m.rank, m.left, m.right, m.count)) == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L),
      // round 4: states " low ", " lowe r ", " lowe s t " ->
      // (lowe,r)=1 (lowe,s)=1 (s,t)=1 — tie on count, (lowe,r) wins
      (4, "lowe", "r", 1L)))
  }

  test("default maxWords is bounded; explicit Int.MaxValue is the exact opt-in") {
    // the scale contract: the DEFAULT path caps the driver-side
    // histogram collect (round-9 ADVICE — 100 TB of web text has
    // unbounded distinct words); unbounded training is explicit
    assert(Bpe.DefaultMaxWords == 1000000)
    val docs = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    // below the cut, bounded default and explicit exact mode train the
    // same merges (histogram order is irrelevant to pair counting)
    val bounded = Bpe.train(docs, "text", rounds = 3)
    val exact = Bpe.train(docs, "text", rounds = 3, maxWords = Int.MaxValue)
    assert(bounded == exact)
    // the cut itself is the (count desc, word asc) top-k: maxWords = 1
    // keeps only "low" (freq 3), so training sees a 3-char vocabulary
    val ms = Bpe.train(docs, "text", rounds = 2, maxWords = 1)
    assert(ms.map(m => (m.left, m.right)) == Seq(("l", "o"), ("lo", "w")))
    assert(ms.head.count == 3L) // weight of "low" alone — lower/lowest cut
  }

  test("greedy left-to-right: overlapping candidates consume correctly") {
    // merge (a,a) over "aaaa" must give [aa, aa]; over "aaa" -> [aa, a]
    val docs = Seq((1L, "aa aa aaa aaaa")).toDF("doc_id", "text")
    val ms = Bpe.train(docs, "text", rounds = 1)
    assert(ms.head.left == "a" && ms.head.right == "a")
    // pair COUNTING is positional (every adjacent occurrence, the
    // classic get_stats): aa->1 (x2 words), aaa->2, aaaa->3 = 7; only
    // APPLICATION is greedy non-overlapping
    assert(ms.head.count == 7L)
    val seg = docs.select(Bpe.bpeTokens(col("text"), ms).as("s")).head.getSeq[String](0)
    assert(seg == Seq("aa", "aa", "aa", "a", "aa", "aa"))
  }

  test("engine segmentation equals the reference implementation on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ms = Bpe.train(docs, "text", rounds = 10)
    assert(ms.size == 10)
    // counts strictly non-increasing by rank (greedy argmax invariant)
    assert(ms.sliding(2).forall { case Seq(a, b) => a.count >= b.count; case _ => true })
    val words = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .distinct().limit(200)
    val got = words.select(col("w"), Bpe.segment(col("w"), ms).as("s")).collect()
    got.foreach { r =>
      val w = r.getString(0)
      assert(r.getSeq[String](1).toList == refSegment(w, ms),
        s"segmentation diverged from reference for '$w'")
    }
  }

  test("subwords reassemble the word exactly (lossless segmentation)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ms = Bpe.train(docs, "text", rounds = 6)
    val bad = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("w")).distinct()
      .where(concat_ws("", Bpe.segment(col("w"), ms)) =!= col("w"))
      .count()
    assert(bad == 0L)
  }

  test("fast driver trainer equals the distributed loop (semantics anchor)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = Bpe.train(docs, "text", rounds = 8)
    val dist = Bpe.trainDistributed(docs, "text", rounds = 8)
    assert(fast == dist)
  }

  test("native runtime serve equals the expression fold (randomized)") {
    // random corpora over a tiny alphabet force deep merge chains,
    // duplicate-pair re-learning, and heavy pair overlap — the cases
    // the heap-replay equivalence argument has to survive
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 8) {
      val alpha = "ab" + ("cde".take(rnd.nextInt(3)))
      val words = (1 to 40).map { _ =>
        (1 to (1 + rnd.nextInt(10))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val ms = Bpe.train(docs, "text", rounds = 1 + rnd.nextInt(12))
      val wdf = docs.select(explode(TextFunctions.tokens(col("text"))).as("w")).distinct()
      val diff = wdf
        .select(col("w"), Bpe.segment(col("w"), ms).as("native"),
          Bpe.segmentFold(col("w"), ms).as("fold"))
        .where(not(col("native") === col("fold")))
        .collect()
      assert(diff.isEmpty,
        s"trial $trial: native/fold diverged: ${diff.take(3).mkString(";")} merges=$ms")
    }
  }

  test("vocab-scale training and serve: 256 merges on a derived bigram corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val derived = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("ws"))
      .select(col("doc_id"), concat_ws(" ",
        expr("transform(slice(ws, 1, greatest(size(ws) - 1, 0)), (w, i) -> concat(w, '_', ws[i + 1]))"))
        .as("text"))
    val ms = Bpe.train(derived, "text", rounds = 256)
    assert(ms.size == 256, s"expected 256 merges, corpus saturated at ${ms.size}")
    // serve through the native runtime; spot-check against the driver
    // reference replay on every distinct derived word
    val words = derived
      .select(explode(TextFunctions.tokens(col("text"))).as("w")).distinct().collect()
      .map(_.getString(0))
    val rt = Bpe.runtime(ms)
    words.foreach { w =>
      assert(rt.segment(w).toList == refSegment(w, ms),
        s"vocab-scale segmentation diverged for '$w'")
    }
    // lossless reassembly at vocab scale
    words.foreach(w => assert(rt.segment(w).mkString("") == w))
  }

  test("merge table round-trips through its DataFrame form") {
    val docs = Seq((1L, "ab ab abc")).toDF("doc_id", "text")
    val ms = Bpe.train(docs, "text", rounds = 2)
    val back = Bpe.mergesFrom(Bpe.mergesDF(spark, ms))
    assert(back == ms)
  }

  test("packSequencesBy with the trained counter packs against real subword counts") {
    val docs = Seq(
      (0L, "low low low"), (1L, "lower"), (2L, "lowest lowest"),
      (3L, ""), (4L, "low lowest")).toDF("doc_id", "text")
    val ms = Bpe.train(docs, "text", rounds = 2) // -> (l,o), (lo,w)
    val packed = TextFunctions.packSequencesBy(
      docs, "doc_id", "text", budget = 6, t => Bpe.tokenCount(t, ms))
      .orderBy("doc_id").collect()
    // expected subword counts with merges (l,o)+(lo,w):
    // low->[low]=1 per word; lower->[low,e,r]=3; lowest->[low,e,s,t]=4
    val counts = packed.map(r => r.getLong(1)).toSeq
    assert(counts == Seq(3L, 3L, 8L, 0L, 5L))
    // offsets are the exact running cumsum in id order, bins split at 6
    val starts = counts.scanLeft(0L)(_ + _).init
    packed.zip(starts).foreach { case (r, s) =>
      assert(r.getLong(2) == s / 6 && r.getLong(3) == s % 6,
        s"doc ${r.getLong(0)}: bin/offset mismatch")
    }
  }
}
