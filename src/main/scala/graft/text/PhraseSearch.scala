package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{RunDigests, WordShingles}

/**
 * Exact multi-phrase search over a corpus: for every (document, phrase)
 * pair where the document contains the phrase's exact CONSECUTIVE token
 * sequence, emit `(doc, phrase, hits, first_pos)` — occurrence count
 * and the 0-based token offset of the first occurrence. The
 * positional-query primitive next to the bag-of-words
 * [[Bm25]] ranker: BM25 scores term overlap anywhere in the document;
 * this answers "which documents contain this exact quote / template
 * string / benchmark prompt, where, and how often" — the lookup behind
 * quote-level decontamination audits and boilerplate localization.
 *
 * Shape (the [[graft.dedup.Dedup.substringPairs]] run-digest machinery
 * pointed at a CONSTANT needle set instead of a corpus self-join):
 *
 *  1. phrases tokenize DRIVER-SIDE with the corpus tokenizer
 *     ([[graft.functions.WordShingles.tokenize]]) and group by token
 *     count k; each phrase reduces to its single k-token run digest.
 *  2. per distinct k (a handful — driver-bounded by the phrase list),
 *     the corpus computes `run_digests(text, k)` in one codegen'd
 *     tokenize→window→md5 loop and joins the BROADCAST digest→phrase
 *     map: non-matching windows — virtually all of them — die map-side
 *     inside the scan stage; only true hits reach the one aggregation
 *     shuffle, whose key count is bounded by matches, not corpus size.
 *  3. branches for different k union (each scans independently; Spark
 *     shares nothing across k values, so prefer phrase sets with few
 *     distinct lengths when the corpus is large).
 *
 * Exact modulo md5 window-digest collisions — the documented contract
 * of the whole run-digest family, replayed identically by an md5
 * oracle. 100 TB: map-only scan per distinct k + a hits-sized shuffle;
 * no corpus-sized state, no index build, no driver collection beyond
 * the phrase list itself.
 */
object PhraseSearch {

  /** Token count and 16-byte run digest of a phrase, via the exact
    * corpus tokenizer + digest code path (driver-side evaluation of the
    * same kernels the executors run). */
  private def phraseKey(phrase: String): (Int, Array[Byte]) = {
    val k = WordShingles.tokenize(UTF8String.fromString(phrase)).size
    require(k >= 1, s"phrase tokenizes to no tokens: '$phrase'")
    val d = RunDigests.compute(UTF8String.fromString(phrase), k)
    (k, d.getBinary(0))
  }

  /**
   * All (doc, phrase) containments with counts and first positions.
   * Duplicate phrases collapse; phrases differing only in surrounding /
   * repeated whitespace are the SAME phrase (corpus tokenizer rules).
   * Output: (doc, phrase, hits: long, first_pos: long).
   */
  def phraseHits(
      df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    require(!Seq(idCol, textCol).contains("phrase"),
      "`phrase` is this operator's output name — rename the input column first")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = phrases.distinct.map(p => { val (k, d) = phraseKey(p); (p, k, d) })
    val branches = keyed.groupBy(_._2).toSeq.sortBy(_._1).map { case (k, ps) =>
      // needle side: tiny (|phrases| rows), broadcast by construction
      val needles = ps.map { case (p, _, d) => (d, p) }.toDF("h", "phrase")
      df.select(col(idCol).as("doc"),
          posexplode(RunDigests.runDigests(col(textCol), k)))
        .withColumnsRenamed(Map("pos" -> "p", "col" -> "h"))
        .join(broadcast(needles), "h") // map-side: misses never shuffle
        .select(col("doc"), col("phrase"), col("p"))
    }
    branches.reduce(_ unionAll _)
      .groupBy("doc", "phrase")
      .agg(count(lit(1)).as("hits"), min(col("p")).cast("long").as("first_pos"))
  }

  /**
   * Streaming phrase monitor — [[phraseHits]]'s quarantine-feed twin
   * (the [[graft.streaming.StreamingDecontam]] shape): flag incoming
   * documents containing any needle phrase AT INGEST TIME, one row per
   * (distinct content, phrase) within the watermark horizon, original
   * columns + `phrase`. Counts/offsets stay a batch concern
   * ([[phraseHits]]) — the ingest path wants the flag, not statistics.
   *
   * Scale: the per-k digest probes are map-side broadcast joins (no
   * shuffle of stream data; needle digests are bytes, not MBs); state
   * exists ONLY for the watermark-bounded (content digest, phrase)
   * dedup — only flagged documents, the rare case, ever enter state.
   * The same call works on a batch frame (plain dropDuplicates),
   * keeping batch/stream parity testable with one oracle.
   */
  def flagged(df: DataFrame, textCol: String, tsCol: String,
      phrases: Seq[String], watermark: String = "10 minutes"): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    // reserved working/output names (the Cdc/SkewJoin contract rule):
    // an input already carrying them would fail with an ambiguous-
    // column error deep in the plan instead of a clear message
    Seq("phrase", "__h", "__phrase_digest").foreach { r =>
      require(!df.columns.contains(r),
        s"input must not contain reserved column `$r` (rename it first)")
    }
    val digest = "__phrase_digest"
    val keyed = phrases.distinct.map(p => { val (k, d) = phraseKey(p); (p, k, d) })
    val spark = df.sparkSession
    import spark.implicits._
    val branches = keyed.groupBy(_._2).toSeq.sortBy(_._1).map { case (k, ps) =>
      val needles = ps.map { case (p, _, d) => (d, p) }.toDF("__h", "phrase")
      df.withColumn(digest, unhex(md5(col(textCol).cast("binary"))))
        .withColumn("__h", explode(RunDigests.runDigests(col(textCol), k)))
        .join(broadcast(needles), "__h")
        .drop("__h")
    }
    val hits = branches.reduce(_ unionAll _)
    if (df.isStreaming)
      hits.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark(digest, "phrase")
        .drop(digest)
    else hits.dropDuplicates(digest, "phrase").drop(digest)
  }
}
