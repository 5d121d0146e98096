package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis column functions for large-scale training-data pipelines:
 * tokenization, quality scoring, language-ID heuristic, shingling and
 * document fingerprinting.
 *
 * Everything here is composed from `org.apache.spark.sql.functions` only
 * (higher-order array functions + hashes) — whole-stage-codegen friendly, no
 * UDFs, no driver-side work; scales linearly with a narrow map-only plan.
 *
 * Determinism contract: each function is reproducible bit-for-bit by an
 * ANSI-SQL oracle (DuckDB): tokenization is a literal single-space split,
 * ratios are one IEEE division of exact integer counts, and hashes are md5
 * (identical hex in every engine).
 */
object TextFunctions {

  /** Whitespace tokens: split on a single space, empties dropped.
    * Oracle: `list_filter(string_split(text, ' '), x -> x != '')`. */
  def tokens(text: Column): Column = filter(split(text, " ", -1), _ =!= "")

  /** The Unicode whitespace set as ONE explicit character class — the
    * same discipline as [[BpePattern]]: Java's `\s` and RE2's `\s`
    * disagree (vertical tab), and neither covers NBSP / NEL / the
    * typographic U+2000 block / ideographic space, so shorthands would
    * silently diverge between this and an RE2-based oracle engine. The
    * class spells the `\p{White_Space}` code points literally; both
    * regex engines receive byte-identical bytes. */
  val UnicodeSpaceClass: String =
    "[ \t\n\u000B\f\r\u0085\u00A0\u1680\u2000-\u200A\u2028\u2029\u202F\u205F\u3000]"

  /** Unicode-aware tokens: split on runs of ANY Unicode whitespace,
    * empties dropped. [[tokens]] (a literal single-space split) stays
    * the default for single-space corpora where the oracle contract
    * wants the cheapest possible split; real corpora delimited by
    * tab / newline / NBSP / ideographic space under-tokenize there —
    * this variant is the opt-in for them.
    * Oracle: `list_filter(regexp_split_to_array(text, '<class>+'), x -> x != '')`
    * with the identical class. */
  def tokensUnicode(text: Column): Column =
    filter(split(text, UnicodeSpaceClass + "+", -1), _ =!= "")

  def tokenCount(toks: Column): Column = size(toks).cast("long")

  /** Aggressive normalization for DEDUP KEYING — the C4/CCNet first
    * step before exact/near dedup, so case and punctuation variants of
    * the same content collapse to one key: lowercase, every char outside
    * `[a-z0-9 ]` replaced by a space (explicit class — no `\W` shorthand
    * whose Unicode behavior engines disagree on), whitespace runs
    * collapsed, ends trimmed.
    *
    * Replayability contract: EXACT for ASCII input —
    * `trim(regexp_replace(regexp_replace(lower(t), '[^a-z0-9 ]', ' ',
    * 'g'), ' +', ' ', 'g'))` byte-for-byte in any regex engine. For
    * non-ASCII input the `lower()` step is full-Unicode and
    * ENGINE-DEPENDENT before the ASCII class ever applies (e.g. 'İ' →
    * 'i' + combining dot in some engines, 'K' (Kelvin) → 'k' in some) —
    * two engines can disagree on whether those mappings introduce an
    * `[a-z]` character that survives. Dedup keys for non-ASCII corpora
    * are therefore engine-consistent only within one engine; strip or
    * transliterate non-ASCII first if cross-engine key equality
    * matters. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** The BPE pre-tokenization pattern, whitespace spelled as EXPLICIT
    * characters: Java's `\s` includes vertical tab (U+000B) but RE2's
    * does not, so a `\s` shorthand would silently diverge between this
    * and an RE2-based oracle engine on VT-bearing text. No lookarounds,
    * so both engines parse the alternation identically. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\u000B\f\r]"

  /** BPE-ish token count: alphabetic runs, digit runs, and individual
    * punctuation marks counted separately — the pre-tokenization split
    * every BPE-family tokenizer applies before merges, so it tracks real
    * subword-token counts far closer than whitespace counting (which
    * sees "don't!" as one token; this sees 4: don, ', t, !). Pure
    * codegen'd regexp built-in. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0))).cast("long")

  /** Average token length: exact integer sum, then one IEEE division. */
  def avgTokenLen(toks: Column): Column =
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))

  /** Count of tokens contained in `words`. */
  def wordSetCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words))).cast("long")

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Stopword share of tokens — a classic quality signal. */
  def stopwordRatio(toks: Column, words: Seq[String] = Stopwords): Column =
    when(size(toks) > 0,
      wordSetCount(toks, words).cast("double") / size(toks).cast("double"))

  /** Distinct-token share — low values indicate repetitive/spammy text. */
  def distinctTokenRatio(toks: Column): Column =
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))

  /** Language marker words; heuristic n-gram-free language ID. Priority
    * order (ties resolve to the earlier entry) is part of the contract. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "los", "y", "es"),
    "de" -> Seq("der", "die", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Heuristic language ID: argmax of marker-word hit counts with the
    * LangMarkers priority order on ties; null-safe ("und" = undetermined
    * when no marker hits at all). Native codegen'd kernel
    * ([[graft.functions.LangScores]] — one token pass with hash
    * probes); the composed CASE-chain formulation it replaced
    * re-evaluated ~languages² interpreted full-array filters per row
    * (spec pins formulation equality, the oracle is unchanged). */
  def langId(toks: Column): Column =
    // coalesce preserves the composed formulation's null contract
    // (null token array → "und", not null)
    coalesce(graft.functions.LangScores.langId(toks), lit("und"))

  /** The composed built-in formulation of [[langId]] — kept as the
    * equivalence witness for the native kernel (LangIdParitySpec
    * randomizes over it) and for custom marker experiments. */
  def langIdComposed(toks: Column): Column = {
    val scores = LangMarkers.map { case (lang, ws) => lang -> wordSetCount(toks, ws) }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0
    // CASE chain: first language whose score >= every other score
    val cases = scores.zipWithIndex.map { case ((lang, s), i) =>
      val others = scores.zipWithIndex.collect { case ((_, o), j) if j != i => o }
      (others.map(o => s >= o).reduce(_ && _), lit(lang))
    }
    val chain = cases.foldRight(lit("und")) { case ((cond, v), acc) => when(cond, v).otherwise(acc) }
    when(anyHit, chain).otherwise(lit("und"))
  }

  /** Distinct word n-gram shingles, space-joined; empty array when the
    * document has fewer than n tokens. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Corpus vocabulary statistics: per token, document frequency (#docs
    * containing it) and total occurrence count — (token, doc_freq,
    * total_freq). The classic input for stopword discovery, df-based
    * shingle caps ([[graft.dedup.Dedup.jaccardPairs]]'s `maxDocFreq`),
    * and TF-IDF weighting. One explode + one aggregation; exact distinct
    * counts (count(distinct doc) expands per token — at extreme scale
    * swap in approx_count_distinct, at the price of losing the
    * bit-exact oracle). */
  def vocabulary(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("__doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(countDistinct(col("__doc")).as("doc_freq"),
        count(lit(1)).as("total_freq"))

  /**
   * Corpus-level hot-phrase mining — boilerplate DISCOVERY (the C4 /
   * RefinedWeb preprocessing step that finds "enable javascript"-class
   * furniture before stripping it): per stratum (site, source, crawl
   * snapshot), the `k` n-grams contained in the most documents, with
   * their document frequency. Ranking is (df desc, phrase asc) — fully
   * deterministic under mass ties.
   *
   * Shape, built for the 100 TB corpus: per-document DISTINCT n-grams
   * from the codegen'd [[graft.functions.WordShingles]] kernel (df
   * counts each document once however often it repeats a phrase), ONE
   * map-side-combined (stratum, phrase) count aggregation, a `minDf`
   * pre-filter so the top-k aggregation only sees phrases that could
   * matter, then the O(k)-state
   * [[graft.curation.Sampling.quotaTopK]] bounded top-k — no window
   * sort over the phrase table, shuffle bounded by distinct phrases
   * and output by strata·k.
   *
   * Output: (stratum, rank 1..k, phrase, df).
   */
  def hotPhrases(df: org.apache.spark.sql.DataFrame,
      stratumCol: String, textCol: String,
      n: Int, k: Int, minDf: Long = 2L): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    require(!Seq("rank", "phrase", "df").contains(stratumCol),
      s"stratum column `$stratumCol` collides with an output column")
    val counts = df
      .select(col(stratumCol),
        explode(graft.functions.WordShingles.wordShingles(col(textCol), n)).as("phrase"))
      .groupBy(col(stratumCol), col("phrase"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    graft.curation.Sampling.quotaTopK(counts, Seq(stratumCol), "df", "phrase", k)
  }

  /**
   * Incremental novelty scoring — "how much does this document add
   * that the corpus didn't already have?": each distinct word n-gram
   * shingle credits exactly ONE document, the lowest-id one that
   * contains it (ids are ingestion order), and a document's novelty is
   * the credited share of its own shingles. The up-sampling /
   * down-sampling signal between exact dedup (novelty 0 duplicates-
   * after-the-first) and plain quality scores: boilerplate-heavy pages
   * score low even when no single near-duplicate exists, reference
   * pages that introduce new phrasing score high.
   *
   * Integer contract: novelty_micro = (n_novel · 1e6) div n_shingles —
   * truncating division on non-negative longs, bit-replayable.
   * Documents with fewer than `n` tokens have no shingles and are
   * EXCLUDED (a share of zero shingles is undefined — the
   * [[graft.ml.Eval.rocAuc]] exclusion convention).
   *
   * Scale shape: per-document DISTINCT shingles from the codegen'd
   * [[graft.functions.WordShingles]] kernel, ONE shuffle keyed by
   * shingle (min-id agg + the credit join on the same key — the
   * inverted-index discipline of [[graft.dedup.Dedup]]), then a
   * map-side-combined per-document count. Shuffle ∝ distinct
   * (document, shingle) rows, never pairwise; hot shingles are
   * AQE-skew-splittable equi-join keys.
   *
   * Output: (idCol, n_shingles, n_novel, novelty_micro).
   */
  def noveltyScores(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int = 3): org.apache.spark.sql.DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    // NO spreadCompute here: an r14 A/B measured the spread WORSE for
    // this operator (one shingle pass per consumer either way; the extra
    // exchange + AQE stages cost more than the parallel shingling saves
    // at this fan-out — contrast Dedup.shingled, whose md5-per-window
    // work is an order heavier)
    val sh = df.select(col(idCol).cast("long").as("__id"),
        explode(graft.functions.WordShingles.wordShingles(col(textCol), n))
          .as("__sh"))
    val first = sh.groupBy(col("__sh")).agg(min(col("__id")).as("__first"))
    sh.join(first, "__sh")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__first") === col("__id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("__id").as(idCol), col("n_shingles"), col("n_novel"),
        expr("(n_novel * 1000000L) div n_shingles").as("novelty_micro"))
  }

  /**
   * Intra-document repetition profile — the Gopher-family repetition
   * quality filter (Rae et al. 2021 §A1.1, "repetitious documents are
   * low quality"): per document, what fraction of its n-gram positions
   * is covered by the single most frequent n-gram (`top_frac`, machine-
   * generated boilerplate pins this near 1) and what fraction sits in
   * ANY n-gram occurring more than once (`dup_frac`, loops and copy-
   * paste inflate it). Output: (doc, n_tokens, top_frac, dup_frac) for
   * EVERY input document — too-short docs (fewer than topN/dupN tokens)
   * get 0.0, a quality filter must pass them through, not drop them.
   *
   * Shape: each gram size is one codegen'd tokenize→gram loop
   * ([[graft.functions.WordShingles.wordGrams]]) exploded into a tagged
   * union → one (doc, n, gram) shuffle with map-side combine (gram
   * counts collapse before the exchange), then two output-sized per-doc
   * reductions. Linear in corpus tokens; no per-doc state beyond the
   * aggregation buffers. Fractions are one IEEE division of exact
   * integer counts rounded to 6 places — bit-replayable by the DuckDB
   * oracle.
   */
  def repetitionProfile(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      topN: Int = 2, dupN: Int = 5): org.apache.spark.sql.DataFrame = {
    require(topN >= 1 && dupN >= 1, s"gram sizes must be >= 1, got ($topN, $dupN)")
    require(topN != dupN,
      s"topN and dupN must differ (got $topN): the tagged union would double-count one gram size")
    def gramRows(n: Int) = df
      .select(col(idCol).as("doc"), lit(n).as("n"),
        explode(graft.functions.WordShingles.wordGrams(col(textCol), n)).as("g"))
    val t = df.select(col(idCol).as("doc"), tokens(col(textCol)).as("ws"))
    val perN = gramRows(topN).unionByName(gramRows(dupN))
      .groupBy(col("doc"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc"), col("n"))
      .agg(max(col("c")).as("mx"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0))).as("dup"),
        sum(col("c")).as("tot"))
    val frac = perN.groupBy(col("doc"))
      .agg(
        round(max(when(col("n") === topN, col("mx") / col("tot"))), 6).as("top_frac"),
        round(max(when(col("n") === dupN, col("dup") / col("tot"))), 6).as("dup_frac"))
    t.select(col("doc"), size(col("ws")).cast("long").as("n_tokens"))
      .join(frac, Seq("doc"), "left")
      .select(col("doc"), col("n_tokens"),
        coalesce(col("top_frac"), lit(0.0)).as("top_frac"),
        coalesce(col("dup_frac"), lit(0.0)).as("dup_frac"))
  }

  /** PII-ish patterns for corpus redaction, RE2-safe by the same
    * discipline as [[BpePattern]]: explicit character classes, no
    * shorthand (`\d`/`\w` definitions drift between engines under
    * Unicode flags), no lookarounds — both regex engines receive
    * byte-identical patterns. Coverage is the classic curation set:
    * email addresses, IPv4 literals, and long digit runs
    * (card/account/phone-shaped: 13+ chars of digits, spaces, dashes
    * between digit endpoints). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val Ipv4Pattern = "[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?"
  val LongDigitRunPattern = "[0-9][0-9 -]{11,}[0-9]"

  /** Redact PII-shaped spans with typed placeholders — the standard
    * pre-training scrub. Order is part of the contract (emails first:
    * they contain dot-runs an IP pattern could bite into; digit runs
    * last). Pure codegen'd regexp_replace chain, map-only. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      LongDigitRunPattern, "<NUM>")

  /** Sliding token-window chunks for context-window packing:
    * (chunk_index ascending from 0, chunk text, token count). Starts
    * advance by `chunk - overlap` tokens; the final chunk clips at the
    * document end (a start is emitted while it is <= n - overlap, so
    * every token is covered and no chunk is pure overlap); documents
    * shorter than one chunk yield themselves whole. Map-only explode —
    * the shape every "split the corpus into N-token training windows
    * with overlap" pipeline stage needs; O(tokens) per doc.
    *
    * Apply over a tokens array column; explode the result with
    * `posexplode` for (index, chunk) rows. */
  def tokenChunks(toks: Column, chunk: Int, overlap: Int): Column = {
    require(chunk >= 1, s"chunk must be >= 1, got $chunk")
    require(overlap >= 0 && overlap < chunk,
      s"overlap must be in [0, chunk), got $overlap (chunk $chunk)")
    val step = chunk - overlap
    transform(
      sequence(lit(1), greatest(size(toks) - overlap, lit(1)), lit(step)),
      s => concat_ws(" ", slice(toks, s, lit(chunk))))
  }

  /** TF-IDF top-m terms per document: (idCol, token, tfidf_r6, rnk) with
    * `tfidf_r6 = round(tf · ln(N / df), 6)` — tf the token's in-document
    * count, df its document frequency from the [[vocabulary]] aggregate
    * shape, N the number of documents with at least one token. Rank
    * orders by (tfidf_r6 desc, token) — ties break on the ROUNDED value,
    * so the order (and the rounded scores) replay exactly in an external
    * SQL engine; ln is the only transcendental in the library's oracle
    * surface and the 6-decimal rounding absorbs its sub-ulp
    * engine-to-engine variation.
    *
    * Scale shape: one explode + two map-side-combined aggregations (tf
    * keyed on (doc, token); df re-aggregates the already-collapsed tf
    * rows by token), a token-keyed equi-join back (AQE broadcast/skew
    * rules apply), and a per-doc [[graft.functions.BoundedTopKSet]] —
    * O(m) state per document at every stage, so shuffle volume after
    * scoring is O(docs · m) regardless of vocabulary size. N rides as a
    * broadcast single-row aggregate, never a driver-side collect. */
  def tfidfTopM(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, m: Int): org.apache.spark.sql.DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    import graft.functions.BoundedTopKSet
    val tok = df.select(col(idCol).as("__doc"), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col("__doc"), col("token")).agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("__df"))
    val n = tf.select(countDistinct(col("__doc")).as("__n"))
    val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
      .select(col("__doc"), col("token"),
        round(col("__tf").cast("double")
          * log(col("__n").cast("double") / col("__df").cast("double")), 6).as("tfidf_r6"))
    // k-smallest of (-tfidf, token) = (tfidf desc, token asc) top-m; the
    // negated sort key stays internal (ln(N/df) >= 0, so only -0.0 ever
    // arises from negating a zero — never emitted)
    scored.groupBy(col("__doc"))
      .agg(BoundedTopKSet.topKSet(
        struct((lit(0.0) - col("tfidf_r6")).as("o"), col("token"), col("tfidf_r6")), m).as("__top"))
      .select(col("__doc").as(idCol), posexplode(col("__top")))
      .select(col(idCol), col("col.token").as("token"),
        col("col.tfidf_r6").as("tfidf_r6"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Sentence segmentation, RE2-replayable: terminator runs ([.!?]+)
    * followed by spaces end a sentence (the terminator stays with its
    * sentence); no lookbehind — engines without it (RE2) replay the
    * replace-then-split chain byte-for-byte. Trailing/empty segments
    * drop. Deliberately heuristic (no abbreviation lexicon): the
    * bulk-corpus chunking convention, not a linguistic segmenter. */
  def sentences(text: Column): Column =
    filter(split(regexp_replace(text, "([.!?]+)[ ]+", "$1\n"), "\n", -1),
      s => trim(s) =!= "")

  /** All whitespace-delimited http(s) URLs in a text, in order —
    * token-boundary extraction (a token starting `http://`/`https://`
    * IS the URL, trailing punctuation included), which is exactly
    * replayable in any engine (a LIKE prefix over a split, no regex
    * dialect involved) and the convention bulk web-corpus link
    * statistics use. Map-only, zero shuffle. */
  def urls(text: Column): Column =
    filter(split(text, " ", -1),
      t => t.startsWith("http://") || t.startsWith("https://"))

  /** The host of a URL, lowercased, leading `www.` stripped — the
    * domain-level key for source-quality scoring, blocklists and
    * per-domain sampling quotas. Port/path/query drop; RE2-safe
    * explicit classes (the [[redactPii]] discipline). Non-URL input →
    * empty string (regexp_extract's no-match contract). */
  def urlDomain(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^https?://([^/:?#]+)", 1)),
      "^www\\.", "")

  /** HTML → text extraction for crawl ingestion, as a chain of
    * codegen'd built-ins (map-only, no UDF, no parser library):
    * script/style blocks drop whole (non-greedy, case-insensitive),
    * remaining tags become spaces, the six ubiquitous entities decode
    * (`&amp;` LAST, so `&amp;lt;` single-decodes to `&lt;` — the
    * standard double-decode hazard), whitespace collapses and trims.
    * Every regex is RE2-safe with explicit classes (the [[redactPii]]
    * discipline), so an external engine replays the pipeline
    * byte-for-byte. Null → null.
    *
    * Deliberately NOT a conformant HTML5 parser: no entity table
    * beyond the six, no CDATA/comment handling, and an unclosed
    * `<script>` keeps its text (only its tag is stripped) — the
    * trade for a fully codegen'd, engine-replayable, single-pass
    * transform a 100 TB ingest can afford on every document. */
  def stripHtml(html: Column): Column = {
    val noBlocks = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (k, v)) => replace(c, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Hashing-trick feature vectorizer (Weinberger et al. 2009): each
    * document's word n-gram OCCURRENCES hash into a fixed `dim`-bucket
    * space — `(doc, bucket, cnt)` sparse rows, the input shape the
    * [[graft.ml.Logistic]] trainer and any linear scorer consume. The
    * vocabulary-free sibling of [[tfidfTopM]]: no df pass, no token
    * dictionary to build/broadcast/version — feature identity IS the
    * hash, so train-time and serve-time features agree by construction
    * even as the corpus grows.
    *
    * Buckets via `md5_lower64(gram) pmod dim` with a POWER-OF-TWO dim
    * ([[graft.functions.Md5Lower64]]): RNG-free, partition-invariant,
    * replayed exactly by an external engine's
    * `md5_number_lower(g) % dim` — the [[graft.curation.Sampling
    * .importanceWeights]] bucket contract, whose gram stream this
    * shares. Scale: one explode + one map-side-combined aggregation
    * keyed (doc, bucket) — per-doc state is min(tokens, dim) buckets,
    * and the shuffle carries slim count rows, never grams. */
  def hashedFeatures(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      dim: Int = 4096, ns: Seq[Int] = Seq(1, 2)): org.apache.spark.sql.DataFrame = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"dim must be a power of two >= 2, got $dim")
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct.size == ns.size,
      s"gram sizes must be distinct positive ints, got ${ns.mkString(",")}")
    import graft.functions.{Md5Lower64, WordShingles}
    val gs = ns.map(n => WordShingles.wordGrams(col(textCol), n))
    val cat = if (gs.size == 1) gs.head else concat(gs: _*)
    df.select(col(idCol).as("doc"), explode(cat).as("__g"))
      .groupBy(col("doc"),
        pmod(Md5Lower64.md5Lower64(col("__g")), lit(dim.toLong)).as("bucket"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** Greedy sequence packing — the training-sequence layout step:
    * documents concatenate in `idCol` order and the stream is cut every
    * `budget` tokens; each document reports the bin holding its FIRST
    * token and its offset inside that bin —
    * (idCol, n_tokens, bin_id, bin_offset). A document may straddle a
    * cut (GPT-style packing concatenates across boundaries); callers
    * wanting no-straddle semantics can filter/re-pack on bin_offset.
    *
    * Scale shape — a global ordered cumulative sum without a global
    * window: ids bucket into ORDER-CONTIGUOUS groups by value range
    * (floor(id / span), span from one min/max stats pass targeting
    * `targetGroups` groups); per group a local cumsum window runs where
    * the group's rows land (bounded by ids-per-span — uniform for the
    * dense synthetic/snapshot ids this targets); group TOTALS (one row
    * per group, <= targetGroups rows) take a single tiny window for
    * prefix offsets and broadcast-join back. Exact global positions,
    * O(rows) work, no corpus-sized single-task sort — the two-level
    * scan/prefix pattern every parallel cumsum uses.
    *
    * Determinism: positions derive only from (id order, token counts) —
    * partitioning/grouping never changes the result, only the balance. */
  def packSequences(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, budget: Int,
      targetGroups: Int = 4096): org.apache.spark.sql.DataFrame =
    packSequencesBy(df, idCol, textCol, budget,
      t => tokenCount(tokens(t)), targetGroups)

  /** [[packSequences]] with a caller-supplied token counter — e.g.
    * [[Bpe.tokenCount]] with a trained merge table, so bins fill
    * against REAL subword counts rather than the whitespace proxy. The
    * counter must be a map-side expression (it is evaluated once per
    * row inside the stats/pack scans). */
  def packSequencesBy(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, budget: Int,
      countOf: Column => Column,
      targetGroups: Int = 4096): org.apache.spark.sql.DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(targetGroups >= 1, s"targetGroups must be >= 1, got $targetGroups")
    import org.apache.spark.sql.expressions.Window
    val t = df.select(col(idCol).cast("long").as("__id"),
      countOf(col(textCol)).cast("long").as("n_tokens"))
    // order-contiguous group span from one column-pruned stats pass
    val stats = t.agg(min(col("__id")), max(col("__id")), count(lit(1))).head()
    if (stats.getLong(2) == 0L)
      return df.sparkSession.emptyDataFrame
        .select(lit(0L).as(idCol), lit(0L).as("n_tokens"),
          lit(0L).as("bin_id"), lit(0L).as("bin_offset")).limit(0)
    val span = math.max(1L,
      (stats.getLong(1) - stats.getLong(0) + 1) / math.max(targetGroups, 1))
    val g = t.withColumn("__g", floor((col("__id") - stats.getLong(0)) / span).cast("long"))
    // local cumsum per group (rows co-located by the window's own shuffle)
    val wLocal = Window.partitionBy(col("__g")).orderBy(col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = g.withColumn("__cum", sum(col("n_tokens")).over(wLocal))
    // prefix offsets over GROUP TOTALS: <= targetGroups rows through one
    // tiny window (non-foldable constant partition key keeps WindowExec
    // off its global no-partition path, as in q_topk_orders)
    val wPrefix = Window.partitionBy(pmod(col("__g"), lit(1)).cast("long")).orderBy(col("__g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = g.groupBy(col("__g")).agg(sum(col("n_tokens")).as("__gsum"))
      .withColumn("__off", coalesce(sum(col("__gsum")).over(wPrefix), lit(0L)))
      .select(col("__g"), col("__off"))
    local.join(broadcast(offsets), "__g")
      .withColumn("__start", col("__off") + col("__cum") - col("n_tokens"))
      .select(col("__id").as(idCol), col("n_tokens"),
        floor(col("__start") / budget).cast("long").as("bin_id"),
        pmod(col("__start"), lit(budget.toLong)).as("bin_offset"))
  }

  /** Exact-content fingerprint: md5 hex of the full text. */
  def md5Fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Near-dup-robust fingerprint: the minimum md5 over the document's word
    * n-gram shingles (winnowing with window = whole doc). Documents sharing
    * any low-hash shingle region collide — a 1-hash MinHash. */
  def minShingleFingerprint(toks: Column, n: Int = 3): Column = {
    val sh = shingles(toks, n)
    when(size(sh) > 0, array_min(transform(sh, s => md5(s.cast("binary")))))
  }
}
