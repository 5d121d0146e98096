package graft.text

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class PhraseSearchSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "quick brown fox and quick brown fox again"),
    (2L, "fox brown quick"), // reversed: no phrase match
    (3L, "  quick   brown  fox  "), // whitespace-noisy, still matches
    (4L, ""),
    (5L, "quick brown")).toDF("doc_id", "text")

  behavior of "PhraseSearch.phraseHits"

  it should "count occurrences and report the first 0-based token offset" in {
    val out = PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("quick brown fox"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    out shouldBe Set(
      (0L, "quick brown fox", 1L, 1L),
      (1L, "quick brown fox", 2L, 0L),
      (3L, "quick brown fox", 1L, 0L))
  }

  it should "search mixed-length phrases in one call (per-k scan branches)" in {
    val out = PhraseSearch.phraseHits(docs, "doc_id", "text",
        Seq("lazy dog", "quick brown fox", "the"))
      .collect().map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    out((0L, "lazy dog")) shouldBe ((1L, 7L))
    out((0L, "the")) shouldBe ((2L, 0L))
    out((1L, "quick brown fox")) shouldBe ((2L, 0L))
    out.keySet.map(_._1) should not contain 2L
    out.keySet.map(_._1) should not contain 4L
  }

  it should "normalize needle whitespace with the corpus tokenizer" in {
    val a = PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("  quick   brown fox "))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    val b = PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("quick brown fox"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    a shouldBe b
  }

  it should "collapse duplicate needles and reject empty ones" in {
    PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("lazy dog", "lazy dog"))
      .count() shouldBe 1L
    an[IllegalArgumentException] should be thrownBy
      PhraseSearch.phraseHits(docs, "doc_id", "text", Seq("   "))
    an[IllegalArgumentException] should be thrownBy
      PhraseSearch.phraseHits(docs, "doc_id", "text", Nil)
  }

  it should "flag phrase hits on a stream once per (content, phrase) and match batch" in {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    def ts(s: String) = Timestamp.valueOf(s"2026-01-01 $s")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val in = mem.toDF().toDF("id", "text", "ts")
    val out = PhraseSearch.flagged(in, "text", "ts",
      Seq("quick brown fox", "lazy dog"))
    out.isStreaming shouldBe true
    out.columns.toSeq shouldBe Seq("id", "text", "ts", "phrase")
    val q = out.writeStream.format("memory").queryName("phrase_flag_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (1L, "the quick brown fox and the lazy dog", ts("10:00:00")),
        (2L, "nothing to see", ts("10:00:01")),
        (3L, "quick brown fox quick brown fox", ts("10:00:02"))) // 2 hits, 1 flag
      q.processAllAvailable()
      spark.table("phrase_flag_test").select("id", "phrase").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet shouldBe Set(
        (1L, "quick brown fox"), (1L, "lazy dog"), (3L, "quick brown fox"))
      // same content re-ingested within the horizon: no second flag
      mem.addData((4L, "quick brown fox quick brown fox", ts("10:01:00")))
      q.processAllAvailable()
      spark.table("phrase_flag_test").count() shouldBe 3L
    } finally q.stop()
    // batch parity on the same rows (content-distinct flags)
    val batch = Seq(
      (1L, "the quick brown fox and the lazy dog", ts("10:00:00")),
      (2L, "nothing to see", ts("10:00:01")),
      (3L, "quick brown fox quick brown fox", ts("10:00:02")),
      (4L, "quick brown fox quick brown fox", ts("10:01:00"))).toDF("id", "text", "ts")
    PhraseSearch.flagged(batch, "text", "ts", Seq("quick brown fox", "lazy dog"))
      .select("phrase").collect().map(_.getString(0)).sorted.toSeq shouldBe
      Seq("lazy dog", "quick brown fox", "quick brown fox")
  }

  it should "match a phrase longer than most docs only where it fits" in {
    val out = PhraseSearch.phraseHits(docs, "doc_id", "text",
        Seq("the quick brown fox jumps over the lazy dog"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    out.toSeq shouldBe Seq((0L, 1L, 0L))
  }

  it should "refuse inputs carrying reserved working/output names" in {
    import spark.implicits._
    val withPhrase = Seq((1L, "a b c", 1L)).toDF("doc_id", "text", "ts")
      .withColumn("phrase", org.apache.spark.sql.functions.lit("x"))
    an[IllegalArgumentException] should be thrownBy
      PhraseSearch.flagged(withPhrase, "text", "ts", Seq("a b"))
    val withH = Seq((1L, "a b c", 1L)).toDF("doc_id", "text", "__h")
    an[IllegalArgumentException] should be thrownBy
      PhraseSearch.flagged(withH, "text", "__h", Seq("a b"))
  }
}
