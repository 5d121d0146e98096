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
   */
  def train(df: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
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

  /** Segment one word into its learned subwords: replay the merge chain
    * (rank order) over the character state — a pure map-side expression,
    * `merges.size` folds deep. */
  def segment(word: Column, merges: Seq[Merge]): Column =
    split(merges.foldLeft(charState(word)) { (st, m) =>
      applyMerge(st, m.left, m.right)
    }, " ")

  /** All subword tokens of a text: whitespace pre-tokenization, then
    * per-word merge replay, flattened in order. */
  def bpeTokens(text: Column, merges: Seq[Merge]): Column =
    flatten(transform(TextFunctions.tokens(text), w => segment(w, merges)))

  /** Trained-subword token count — the drop-in replacement for
    * [[TextFunctions.bpeTokenCount]]'s pre-tokenization proxy in the
    * token-budget operators. */
  def tokenCount(text: Column, merges: Seq[Merge]): Column =
    size(bpeTokens(text, merges)).cast("long")
}
