package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-trained byte-pair encoding (Sennrich et al. 2016): learn a
 * merge table from the corpus' word-frequency distribution, then
 * segment words into subword units by replaying the merges. This makes
 * the token-budget operators ([[TextFunctions.packSequences]],
 * [[TextFunctions.tokenChunks]]) production-true: they can count REAL
 * learned subwords instead of the [[TextFunctions.bpeTokenCount]]
 * pre-tokenization proxy.
 *
 * Engine-replayable by construction — the representation is chosen so
 * an external SQL engine replays training AND segmentation exactly:
 *
 *  - a word's segmentation state is a STRING: its symbols joined by
 *    single spaces (`"hello"` → `"h e l l o"`). Symbols never contain
 *    spaces (words come from whitespace tokenization), so the encoding
 *    is unambiguous and "the trailing symbol is exactly `l`" is the
 *    string test `state = l OR ends_with(state, ' ' || l)`.
 *  - pair COUNTING is positional — every adjacent occurrence counts
 *    (`"a a a"` holds two (a, a) pairs), weighted by word frequency:
 *    the classic `get_stats`.
 *  - merge APPLICATION is the classic greedy left-to-right
 *    non-overlapping scan, expressed as a left fold over the symbols
 *    with a string accumulator: if the accumulator's trailing symbol is
 *    `l` and the next symbol is `r`, append `r` WITHOUT a separator
 *    (forming `l+r`), else append with one. The fold is
 *    `aggregate(...)` in Spark and `list_reduce(...)` in DuckDB —
 *    identical left-to-right semantics, and the merged symbol can never
 *    re-merge within the round because `l+r` is strictly longer than
 *    `l` (`"a a a a"` under (a, a) → `"aa aa"`, `"a a a"` → `"aa a"`).
 *  - the initial character split is
 *    `trim(regexp_replace(word, "(.)", "$1 "))` — the same regex both
 *    engines accept (BMP code points; astral characters would split
 *    differently between UTF-16 Spark and UTF-8 engines, a documented
 *    non-goal for the ASCII-delimited gate corpus).
 *  - pair selection is exact integer arithmetic, ties broken by
 *    (left asc, right asc) binary string order — deterministic in any
 *    engine.
 *
 * Scale shape (100 TB): the corpus collapses ONCE to the distinct-word
 * frequency table (one map-side-combined aggregation; |distinct words|
 * rows, not corpus rows). Each merge round is then ONE aggregation over
 * that table (explode adjacent pairs, sum word counts map-side) with
 * only the argmax pair — a single row — collected to the driver
 * ([[graft.ml.Logistic.train]]'s one-agg-per-round discipline), plus a
 * map-only fold to advance the state; `localCheckpoint` per round keeps
 * the plan flat across rounds. Serving ([[segment]] / [[bpeTokens]]) is
 * a pure column expression — a chain of `rounds` literal folds,
 * map-only, zero shuffle, zero driver state beyond the merge table
 * itself (which is `rounds` rows by construction and persists as
 * parquet through [[mergesDF]] / [[mergesFrom]]).
 *
 * Reference: vasnake SpatialJoinTransformer has no tokenizer — this
 * extends the training-data-pipeline surface; no reference behavior is
 * cited.
 */
object Bpe {

  /** Default [[train]] histogram bound: the driver-side collect is
    * capped at one million (word, count) rows regardless of corpus
    * size. Pass `maxWords = Int.MaxValue` explicitly for the unbounded
    * exact mode (oracle-replayable training over the full vocabulary). */
  val DefaultMaxWords: Int = 1000000

  /** One learned merge: at `rank` (1-based), the corpus' most frequent
    * adjacent symbol pair was (`left`, `right`) with `count` weighted
    * positional occurrences; the merged symbol is `left + right`. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** `"h e l l o"` — the space-joined character state (see class doc). */
  def charState(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** Adjacent symbol pairs of a state string as (l, r) structs —
    * EVERY positional occurrence (classic get_stats counting). */
  private def statePairs(state: Column): Column = {
    val syms = split(state, " ")
    val n = size(syms)
    when(n >= 2, zip_with(
      slice(syms, lit(1), n - 1), slice(syms, lit(2), n - 1),
      (a: Column, b: Column) => struct(a.as("l"), b.as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Greedy left-to-right merge application as a fold: trailing-symbol
    * test + separator-free append on match. Single-symbol states pass
    * through (the fold degenerates to the first element). */
  private def applyMerge(state: Column, l: String, r: String): Column =
    aggregate(split(state, " "), lit(""), (acc, x) =>
      when(acc === "", x)
        .when((acc === l || acc.endsWith(s" $l")) && x === r, concat(acc, x))
        .otherwise(concat(acc, lit(" "), x)))

  /**
   * Learn `rounds` merges from `df`'s `textCol` (whitespace
   * tokenization, [[TextFunctions.tokens]]). Returns at most `rounds`
   * merges — fewer if the corpus runs out of adjacent pairs entirely.
   *
   * Execution shape (the SentencePiece split): Spark collapses the
   * corpus ONCE to the distinct-word frequency histogram (map-side
   * combined; |vocab| rows, corpus-size-independent), the greedy merge
   * loop then runs driver-side over that histogram — one Spark job
   * total instead of one per round, which is what makes vocab-scale
   * `rounds` (256+, see the `text_bpe_vocab` gate) affordable. The
   * driver loop replays [[trainDistributed]]'s per-round semantics
   * EXACTLY (positional pair counting weighted by word frequency,
   * argmax tie-broken (left asc, right asc) in code-point order =
   * Spark's binary UTF8String order, greedy left-to-right application)
   * — spec-pinned equal on the gate corpus.
   *
   * `maxWords` bounds the driver-side histogram for open-vocabulary
   * corpora (100 TB of web text has unbounded distinct "words"): the
   * top `maxWords` by (count desc, word asc) — a deterministic cut, the
   * standard frequency-pruned BPE training corpus. The DEFAULT is
   * bounded ([[DefaultMaxWords]] = 1,000,000 — a TakeOrderedAndProject
   * cut, so the driver collect is capped at one million (word, count)
   * rows no matter the corpus size); the unbounded exact mode that an
   * external oracle replays word-for-word requires an EXPLICIT
   * `maxWords = Int.MaxValue` opt-in, keeping the scale-unsafe path a
   * deliberate choice rather than the default. Below the cut the two
   * modes train identical merge tables (pair counts sum over the whole
   * histogram; its order is irrelevant).
   */
  def train(df: DataFrame, textCol: String, rounds: Int,
            maxWords: Int = DefaultMaxWords): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    var hist = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    // fetch ONE sentinel row past the cap: its presence proves the cap
    // actually truncated the histogram, which is logged loudly — a
    // silently different merge table on a >maxWords corpus is result
    // drift the caller should see (round-10 ADVICE)
    if (maxWords != Int.MaxValue)
      hist = hist.orderBy(col("wc").desc, col("w").asc).limit(maxWords + 1)
    var rows = hist.collect()
    if (maxWords != Int.MaxValue && rows.length > maxWords) {
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"Bpe.train: corpus has more than $maxWords distinct words — " +
          s"training on the top $maxWords by (count desc, word asc); " +
          "pass maxWords = Int.MaxValue for the unbounded exact mode")
      rows = rows.take(maxWords)
    }
    val words = new Array[(String, Long)](rows.length)
    var i = 0
    while (i < rows.length) {
      words(i) = (rows(i).getString(0), rows(i).getLong(1)); i += 1
    }
    trainOnHistogram(words, rounds)
  }

  /** Driver-side greedy merge loop over a (word, count) histogram —
    * the exact in-memory twin of one [[trainDistributed]] round per
    * iteration. Public so a pre-aggregated histogram (e.g. persisted
    * corpus stats) can train directly. */
  def trainOnHistogram(hist: Array[(String, Long)], rounds: Int): Seq[Merge] = {
    import graft.functions.BpeRuntime
    val states = new Array[Array[String]](hist.length)
    val lens = new Array[Int](hist.length)
    var i = 0
    while (i < hist.length) {
      states(i) = BpeRuntime.charSplit(hist(i)._1)
      lens(i) = states(i).length
      i += 1
    }
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // positional pair counting, weighted by word frequency
      val pc = new java.util.HashMap[(String, String), Long]()
      var w = 0
      while (w < states.length) {
        val st = states(w); val n = lens(w); val c = hist(w)._2
        var j = 0
        while (j < n - 1) {
          pc.merge((st(j), st(j + 1)), c, java.lang.Long.sum(_, _))
          j += 1
        }
        w += 1
      }
      if (pc.isEmpty) exhausted = true
      else {
        // argmax by (count desc, left asc, right asc) in code-point
        // (= binary UTF-8) order, matching Spark's string orderBy
        var bl: String = null; var br: String = null; var bc = Long.MinValue
        val it = pc.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val (l, rt) = e.getKey; val c = e.getValue
          if (c > bc || (c == bc && {
                val cl = cpCompare(l, bl)
                cl < 0 || (cl == 0 && cpCompare(rt, br) < 0)
              })) { bl = l; br = rt; bc = c }
        }
        merges += Merge(r, bl, br, bc)
        var k = 0
        while (k < states.length) {
          lens(k) = BpeRuntime.applyPass(states(k), lens(k), bl, br)
          k += 1
        }
        r += 1
      }
    }
    merges.result()
  }

  /** Code-point comparison = UTF-8 byte order = Spark's binary
    * UTF8String ordering (Java's `String.compareTo` diverges for
    * supplementary characters — UTF-16 code-unit order). */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /**
   * The original all-Spark training loop — one aggregation job per
   * round over the distinct-word table. Kept as the distributed
   * fallback for histograms too large to collect even after a
   * `maxWords` cut, and as the engine-replayable semantics anchor that
   * [[train]]'s driver loop is spec-pinned against.
   */
  def trainDistributed(df: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // corpus -> distinct-word frequency table, ONCE
    var words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(charState(col("w")).as("st"), col("wc"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = words
        .select(col("wc"), explode(statePairs(col("st"))).as("p"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("wc")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, c) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += Merge(r, l, rt, c)
        val prev = words
        words = words
          .select(applyMerge(col("st"), l, rt).as("st"), col("wc"))
          .localCheckpoint()
        prev.unpersist(blocking = false)
        r += 1
      }
    }
    words.unpersist(blocking = false)
    merges.result()
  }

  /** The merge table as a DataFrame — the persistable artifact:
    * (merge_rank, lft, rgt, pair_cnt), one row per learned merge. */
  def mergesDF(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.count))
      .toDF("merge_rank", "lft", "rgt", "pair_cnt")
  }

  /** Reassemble merges from a [[mergesDF]]-shaped frame (e.g. reloaded
    * from parquet) — rank order restored by sorting. */
  def mergesFrom(df: DataFrame): Seq[Merge] =
    df.select(col("merge_rank").cast("int"), col("lft"), col("rgt"),
        col("pair_cnt").cast("long"))
      .collect().sortBy(_.getInt(0))
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  /** The serving runtime for a merge table — ONE reference object
    * regardless of vocabulary size (see [[graft.functions.BpeRuntime]]
    * for the exact-replay argument). */
  def runtime(merges: Seq[Merge]): graft.functions.BpeRuntime =
    new graft.functions.BpeRuntime(
      merges.map(_.left).toArray, merges.map(_.right).toArray)

  /** Segment one word into its learned subwords — a single codegen'd
    * expression holding the merge table as data; the plan shape is
    * vocabulary-size-independent (a 50k-merge table serves through the
    * same two-node tree as an 8-merge one). */
  def segment(word: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeSegmentWord.segment(word, runtime(merges))

  /** The original expression-fold serve — `merges.size` `aggregate`
    * folds deep; exact but vocabulary-bounded (codegen method-size
    * limits at production vocab). Kept as the semantics anchor the
    * native runtime is spec-pinned against. */
  def segmentFold(word: Column, merges: Seq[Merge]): Column =
    split(merges.foldLeft(charState(word)) { (st, m) =>
      applyMerge(st, m.left, m.right)
    }, " ")

  /** All subword tokens of a text: whitespace pre-tokenization, then
    * per-word merge replay, flattened in order — tokenize + segment +
    * flatten in one codegen'd pass with a Zipf-friendly per-word memo. */
  def bpeTokens(text: Column, merges: Seq[Merge]): Column =
    graft.functions.BpeTokensOf.tokens(text, runtime(merges))

  /** Trained-subword token count — the drop-in replacement for
    * [[TextFunctions.bpeTokenCount]]'s pre-tokenization proxy in the
    * token-budget operators. */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    size(bpeTokens(text, merges)).cast("long")
}
