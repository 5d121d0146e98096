package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bigram language-model quality scoring — the CCNet-style "perplexity
 * filter" (Wenzek et al. 2020: score web documents under a language
 * model trained on a trusted reference corpus; low average log-prob =
 * boilerplate, lorem-ipsum, keyword-stuffing, wrong language). KenLM is
 * a native library, so the model here is the classic add-one-smoothed
 * bigram LM, trained AS a Spark job and applied AS a broadcast-joinable
 * table — no driver-side model object, no UDF.
 *
 * Model contract (all counts exact, all real arithmetic in a FIXED
 * operation order so an external SQL engine replays scores
 * bit-for-bit):
 *  - vocabulary = tokens with train-corpus count >= `minCount`, plus
 *    the reserved `<unk>` symbol; every other token (including scoring-
 *    time tokens never seen in training) maps to `<unk>` BEFORE bigram
 *    extraction. `minCount` is the scale knob: it bounds the model
 *    tables by trimming the long tail, deterministically (a literal
 *    occurrence of `<unk>` in text merges with the symbol — documented
 *    reserved word, same convention as every *nix tokenizer).
 *  - V = |vocabulary| + 1 (the +1 is `<unk>`, always reserved even when
 *    nothing mapped to it — keeps V independent of which tail tokens
 *    happened to exist).
 *  - c12(w1,w2) = count of adjacent mapped-token pairs WITHIN training
 *    documents (no cross-document adjacency); c1(w1) = Σ_w2 c12 (w1 as
 *    a context — per-document final tokens are not contexts).
 *  - P(w2|w1) = (c12 + 1) / (c1 + V), Laplace over the V-sized event
 *    space; unseen (w1,w2) and unseen w1 fall out of the same formula
 *    via c12 = 0 / c1 = 0 (left joins + coalesce), so P = 1/V floors
 *    fully-novel contexts.
 *  - per-position term = round(ln P · 1e6) as a LONG (micro-nats); the
 *    per-document score sums LONGS — integer summation is exact and
 *    order-free, so the distributed aggregation order cannot perturb
 *    the result (the sub-ulp engine-to-engine ln() variation is
 *    absorbed by the rounding, the same 6-decimal contract as
 *    [[TextFunctions.tfidfTopM]]).
 *  - document score bi_logp_r6 = (micro_sum averaged over n_bigrams in
 *    PURE INTEGER arithmetic, half away from zero:
 *    sign·((2·|sum| + n) div (2·n))) / 1e6 — average ln-probability per
 *    bigram position (−ppl in nats without the exp). The average is an
 *    integer micro-nat before the single final division, so the
 *    half-way rounding cases that make engines disagree on binary
 *    doubles cannot arise (a float round(x, 6) at an exact .5 micro
 *    boundary flipped one row in 5000 between Spark and DuckDB — the
 *    integer form has no such boundary). Documents with fewer than 2
 *    tokens have no positions and score 0.0 with n_bigrams = 0 (a
 *    quality filter must pass them through explicitly, not drop them —
 *    the [[TextFunctions.repetitionProfile]] convention).
 *
 * Scale shape: training is two map-side-combined aggregations (unigram
 * counts; bigram counts over mapped pairs) plus a re-aggregation of the
 * already-collapsed bigram rows for contexts — shuffle volume is
 * O(distinct tokens + distinct bigrams), never corpus-sized rows.
 * Scoring explodes (doc, pos, token), maps through the vocabulary
 * (token-keyed equi-join; AQE broadcasts the trimmed vocab when small),
 * reassembles per-document mapped arrays (one doc-keyed shuffle),
 * explodes bigram pairs and equi-joins the two model tables, then one
 * doc-keyed sum of longs. Every join is key-equi (broadcast/skew rules
 * apply); there is no cartesian anywhere and no driver-side collect —
 * V rides as a broadcast single-row aggregate.
 */
object NgramLm {

  /** Reserved out-of-vocabulary symbol. */
  val Unk = "<unk>"

  /** A trained bigram LM as three lazy DataFrames (no action has run):
    * `vocab` (token) — the kept vocabulary, `bigrams` (w1, w2, c12),
    * `contexts` (w1, c1). `vocabSizeRow` is the single-row (v) frame
    * carrying V = |vocab| + 1. */
  final case class BigramLm(vocab: DataFrame, bigrams: DataFrame,
      contexts: DataFrame, vocabSizeRow: DataFrame)

  /** Train an add-one bigram LM on `ref`'s `textCol` (whitespace
    * tokenization, [[TextFunctions.tokens]]). `minCount` trims the
    * vocabulary tail into `<unk>`; 1 keeps every token. */
  def train(ref: DataFrame, textCol: String, minCount: Long = 1L): BigramLm = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val tok = ref.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount).select(col("token"))
    val vRow = vocab.agg((count(lit(1)) + 1L).as("v"))
    val pairs = mappedBigramRows(ref.select(monotonically_increasing_id().as("__doc"),
      col(textCol).as("__text")), "__doc", "__text", vocab)
    val bigrams = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val contexts = bigrams.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    BigramLm(vocab, bigrams, contexts, vRow)
  }

  /** Score every document of `df` under `lm`:
    * (idCol, n_bigrams, bi_logp_r6). */
  def score(df: DataFrame, idCol: String, textCol: String, lm: BigramLm): DataFrame = {
    val pairs = mappedBigramRows(df, idCol, textCol, lm.vocab)
    val terms = pairs
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(lm.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(lm.vocabSizeRow))
      .select(col("__doc"),
        // micro-nats: exact-integer term, order-free distributed sum
        round(log((coalesce(col("c12"), lit(0L)) + 1L).cast("double")
          / (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")) * 1e6)
          .cast("long").as("__t"))
    val scored = terms.groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__t")).as("__s"))
      // integer micro-nat average, half away from zero — no binary-
      // double rounding boundary for an external engine to disagree on
      .withColumn("__m", when(col("__s") >= 0,
          expr("(__s * 2 + n_bigrams) DIV (n_bigrams * 2)"))
        .otherwise(-expr("((-__s) * 2 + n_bigrams) DIV (n_bigrams * 2)")))
      .select(col("__doc"), col("n_bigrams"),
        (col("__m").cast("double") / 1e6).as("bi_logp_r6"))
    // ids are assumed unique per document (the library-wide contract);
    // a left join then yields exactly one row per input document
    df.select(col(idCol).as("__doc"))
      .join(scored, Seq("__doc"), "left")
      .select(col("__doc").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("bi_logp_r6"), lit(0.0)).as("bi_logp_r6"))
  }

  /** (docId, w1, w2) adjacent mapped-token pairs per document: explode
    * positions, map through `vocab` (miss → `<unk>`), reassemble the
    * per-document array in position order, zip adjacent. Documents with
    * fewer than 2 tokens contribute no rows (explode of an empty
    * array). */
  private def mappedBigramRows(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val tok = df.select(col(idCol).as("__doc"),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "token")))
    val mapped = tok.join(vocab.select(col("token"), lit(true).as("__keep")),
        Seq("token"), "left")
      .select(col("__doc"), col("__pos"),
        when(col("__keep"), col("token")).otherwise(lit(Unk)).as("__w"))
    val arr = mapped.groupBy(col("__doc"))
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
        s => s.getField("__w")).as("__ws"))
    val n = size(col("__ws"))
    arr.select(col("__doc"),
        explode(when(n >= 2, zip_with(
          slice(col("__ws"), lit(1), n - 1), slice(col("__ws"), lit(2), n - 1),
          (a: Column, b: Column) => struct(a.as("w1"), b.as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("__bg"))
      .select(col("__doc"), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
  }
}
