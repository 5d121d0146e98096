package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM subword tokenizer (the SentencePiece-unigram SERVING
 * semantics over a frequency-seeded vocabulary) — the second trained
 * tokenizer family beside [[Bpe]]: where BPE composes greedy merges,
 * unigram segmentation picks the GLOBALLY best split of each word
 * under per-piece log probabilities via Viterbi dynamic programming.
 *
 * Training (`train`): corpus → distinct-word frequency table (ONE
 * map-side-combined aggregation — vocabulary-bounded, never
 * corpus-bounded) → candidate-piece counts (every substring up to
 * `maxPieceLen` chars of every distinct word, weighted by word
 * frequency; one more bounded aggregation) → seed vocabulary = ALL
 * single characters (coverage guarantee) plus the top `vocabSize`
 * multi-character pieces by (count desc, piece asc) — a LIMIT-side
 * selection, only selected rows reach the driver (the argmax-only
 * collect discipline). Piece log-probabilities are micro-nat LONGS,
 * `lp = round(1e6 · ln(count / total))` with `total` an exact integer
 * sum — the [[NgramLm]] determinism contract. This is the
 * frequency-initialized unigram model; SentencePiece's EM refinement
 * and vocabulary pruning are intentionally out of scope (they need
 * per-round re-segmentation counts — the structure is in place, the
 * statistics change, the serving semantics below do not).
 *
 * Serving: integer Viterbi over a COMBINED encoding — each DP cell
 * packs `(score_micro, n_pieces)` into one long as
 * `score · 1024 − n_pieces` (piece counts < 1024 ≪ the 1024 gap
 * between adjacent integer scores), so "maximize score, break ties on
 * FEWER pieces" is a plain `greatest` over longs and the whole DP
 * replays in any SQL engine with exact integer arithmetic. Unknown
 * single characters score `unkMicro` (coverage without an UNK piece);
 * unknown multi-character pieces are forbidden (−1e12 micro-nats).
 * Map-only expressions; the model rides as literal map/constants.
 */
object Unigram {

  /** Forbidden-piece combined penalty base: multi-char pieces outside
    * the vocabulary can never win a max. */
  val ForbiddenMicro: Long = -1000000000000L

  /** Out-of-range DP guard — identical literal on the oracle side. */
  val NegInf: Long = Long.MinValue / 2

  final case class Model(pieces: Map[String, Long], maxPieceLen: Int,
      unkMicro: Long) {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
  }

  /** All substrings of `w` up to `maxLen` chars, every occurrence. */
  private def allPieces(w: Column, maxLen: Int): Column =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(i, least(length(w), i + lit(maxLen - 1))), j =>
        w.substr(i, j - i + lit(1)))))

  /**
   * Train a frequency-seeded unigram model: `vocabSize` bounds the
   * MULTI-character piece count (all seen single characters are always
   * included). Runs two bounded aggregations eagerly (trainer
   * discipline).
   */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, unkMicro: Long = -18000000L): Model = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val cands = words
      .select(col("wc"), explode(allPieces(col("w"), maxPieceLen)).as("p"))
      .groupBy(col("p")).agg(sum(col("wc")).as("c"))
    val singles = cands.where(length(col("p")) === 1)
    val multis = cands.where(length(col("p")) > 1)
      .orderBy(col("c").desc, col("p").asc).limit(vocabSize)
    val selected = singles.unionAll(multis).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    if (selected.isEmpty) return Model(Map.empty, maxPieceLen, unkMicro)
    val tot = selected.map(_._2).sum // exact integer total, order-free
    val pieces = selected.map { case (p, c) =>
      p -> math.round(math.log(c.toDouble / tot.toDouble) * 1e6)
    }.toMap
    Model(pieces, maxPieceLen, unkMicro)
  }

  /** Combined-encoding DP array over one word's character positions:
    * element i+1 = best `score·1024 − n_pieces` for the prefix of
    * length i. Pure composed expression; the model rides as a literal
    * map. */
  private def dpCombined(word: Column, m: Model): Column = {
    val lpMap = typedlit(m.pieces)
    def addValue(piece: Column): Column =
      coalesce(element_at(lpMap, piece),
        when(length(piece) === 1, lit(m.unkMicro)).otherwise(lit(ForbiddenMicro))) *
        lit(1024L) - lit(1L)
    aggregate(
      sequence(lit(1), length(word)),
      array(lit(0L)),
      (acc, i) => {
        val terms = (1 to m.maxPieceLen).map { k =>
          when(i >= lit(k),
            element_at(acc, (i - lit(k) + lit(1)).cast("int"))
              + addValue(word.substr(i - lit(k) + lit(1), lit(k))))
            .otherwise(lit(NegInf))
        }
        val best = if (terms.size == 1) terms.head else greatest(terms: _*)
        concat(acc, array(best))
      })
  }

  /**
   * One Viterbi-EM refinement round (the SentencePiece hard-EM
   * approximation, flag-style opt-in — [[train]]'s frequency seed is
   * unchanged by default): re-segment every distinct corpus word under
   * the CURRENT model (best path, smallest-k backtrack — see
   * [[graft.functions.UnigramRuntime.segment]]), count each VOCABULARY
   * piece's occurrences on those paths weighted by word frequency
   * (unknown-character path steps count nothing — the vocabulary is
   * fixed, not grown), drop pieces the corpus never uses, and
   * re-normalize log-probs over the new exact integer total:
   * `lp = round(1e6 · ln(c / total))`. Call again for further rounds.
   *
   * Scale shape: one map-side-combined word histogram (vocabulary-
   * bounded, never corpus-bounded), a flatMap explode of per-distinct-
   * word pieces (≤ word length each), one bounded re-aggregation;
   * only the (piece, count) rows — vocabulary-sized — reach the
   * driver. The model rides the closure as one serializable runtime
   * reference, not a plan literal.
   */
  def emRefine(df: DataFrame, textCol: String, m: Model): Model =
    emRefineWords(wordHistogram(df, textCol), m)

  /** The corpus's distinct-word frequency table — the shared input of
    * every EM-round statistic (one map-side-combined aggregation,
    * vocabulary-of-words-bounded, never corpus-bounded). */
  private def wordHistogram(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))

  /** [[emRefine]] over a prebuilt word histogram — lets [[emTrain]]
    * run R rounds with ONE corpus pass (the histogram is cached) plus
    * R word-bounded passes. */
  private def emRefineWords(words: DataFrame, m: Model): Model = {
    if (m.pieces.isEmpty) return m
    val rt = runtime(m)
    val spark = words.sparkSession
    import spark.implicits._
    val counts = words
      .as[(String, Long)]
      .flatMap { case (w, wc) =>
        rt.segment(w).iterator
          .filter(p => rt.pieces.containsKey(p)).map(p => (p, wc))
      }
      .toDF("p", "wc")
      .groupBy(col("p")).agg(sum(col("wc")).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) return Model(Map.empty, m.maxPieceLen, m.unkMicro)
    val tot = counts.map(_._2).sum
    Model(
      counts.map { case (p, c) =>
        p -> math.round(math.log(c.toDouble / tot.toDouble) * 1e6)
      }.toMap,
      m.maxPieceLen, m.unkMicro)
  }

  /** Exact total corpus Viterbi log-likelihood under `m`, in
    * micro-nats: Σ over corpus word occurrences of the word's best-path
    * score — computed as Σ wc · score_micro(w) over the DISTINCT-word
    * histogram (one bounded aggregation over the existing serving
    * machinery; the sum is exact long arithmetic, so the trajectory is
    * bit-replayable). Empty corpus scores 0. */
  def corpusScore(df: DataFrame, textCol: String, m: Model): Long =
    corpusScoreWords(wordHistogram(df, textCol), m)

  private def corpusScoreWords(words: DataFrame, m: Model): Long =
    words
      .select(coalesce(sum(col("wc") *
        wordScore(col("w"), m).getField("score_micro")), lit(0L)).as("ll"))
      .head.getLong(0)

  /** An EM run's outcome: the refined model plus the corpus
    * log-likelihood TRAJECTORY in micro-nats — `llMicro(0)` is the
    * seed model's score, `llMicro(t)` the score after round t
    * (length = rounds + 1). Hard (Viterbi) EM is monotone
    * non-decreasing in real arithmetic: re-segmentation under the new
    * model only improves the score the multinomial MLE already
    * improved. In micro-nat integer arithmetic each piece's log-prob
    * carries ≤0.5 µnat rounding, so adjacent trajectory entries match
    * the real-arithmetic guarantee up to ~1 µnat per corpus piece
    * occurrence (`UnigramSpec` pins exact non-decrease on the fixture
    * corpus). The [[graft.ml.ModelStore.saveUnigram]] artifact carries
    * the trajectory — the `Logistic.Model.losses` discipline. */
  final case class EmResult(model: Model, llMicro: Array[Long])

  /**
   * Run `rounds` Viterbi-EM refinement rounds from `seed`, recording
   * the corpus log-likelihood before and after every round. Scale
   * shape: ONE corpus-bounded pass builds the distinct-word histogram
   * (cached — at 100 TB the histogram is vocabulary-of-words-sized,
   * orders of magnitude below the corpus), then each round is two
   * word-bounded jobs (re-segmentation counts + trajectory score) over
   * the cache.
   */
  def emTrain(df: DataFrame, textCol: String, seed: Model, rounds: Int): EmResult = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val words = wordHistogram(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val traj = Array.newBuilder[Long]
      var m = seed
      traj += corpusScoreWords(words, m)
      var r = 0
      while (r < rounds) {
        m = emRefineWords(words, m)
        traj += corpusScoreWords(words, m)
        r += 1
      }
      EmResult(m, traj.result())
    } finally words.unpersist(blocking = false)
  }

  /** The serving runtime for a model — ONE reference object regardless
    * of vocabulary size (see [[graft.functions.UnigramRuntime]]): the
    * plan stops carrying the piece table as a map literal and the
    * Viterbi runs compiled instead of through interpreted
    * higher-order folds. */
  def runtime(m: Model): graft.functions.UnigramRuntime = {
    val map = new java.util.HashMap[String, java.lang.Long](m.pieces.size * 2)
    m.pieces.foreach { case (p, lp) => map.put(p, lp) }
    new graft.functions.UnigramRuntime(map, m.maxPieceLen, m.unkMicro)
  }

  /** Best segmentation of one word as `(score_micro, n_pieces)` —
    * score in micro-nats, count on the max-score path (ties already
    * resolved toward fewer pieces by the combined encoding). Empty
    * word → (0, 0). Served natively (model as data). */
  def wordScore(word: Column, m: Model): Column =
    graft.functions.UnigramWordScore.score(word, runtime(m))

  /** The original composed-expression Viterbi — model as a `typedlit`
    * map inside an interpreted fold; exact but vocabulary-bounded in
    * PLAN size. Kept as the semantics anchor the native runtime is
    * spec-pinned against. */
  def wordScoreFold(word: Column, m: Model): Column = {
    val c = element_at(dpCombined(word, m), (length(word) + lit(1)).cast("int"))
    val np = pmod(-c, lit(1024L))
    when(length(word) === 0, struct(lit(0L).as("score_micro"), lit(0L).as("n_pieces")))
      .otherwise(struct(
        ((c + np) / lit(1024L)).cast("long").as("score_micro"),
        np.as("n_pieces")))
  }

  /** Trained-subword token count of a text under the unigram model —
    * the [[Bpe.tokenCount]] twin for token-budget operators (null text
    * counts 0, matching the fold's coalesce contract). */
  def tokenCount(text: Column, m: Model): Column =
    coalesce(graft.functions.UnigramCountOf.count(text, runtime(m)), lit(0L))

  /** The model as a persistable frame: (piece, lp_micro) rows plus the
    * maxPieceLen/unkMicro constants on every row (derivable-from-rows
    * rule: no sidecar). */
  def piecesDF(spark: org.apache.spark.sql.SparkSession, m: Model): DataFrame = {
    import spark.implicits._
    m.pieces.toSeq.sortBy(_._1)
      .map { case (p, lp) => (p, lp, m.maxPieceLen.toLong, m.unkMicro) }
      .toDF("piece", "lp_micro", "max_piece_len", "unk_micro")
  }

  /** Reassemble a model from a [[piecesDF]]-shaped frame. */
  def piecesFrom(df: DataFrame): Model = {
    val rows = df.select(col("piece"), col("lp_micro").cast("long"),
      col("max_piece_len").cast("long"), col("unk_micro").cast("long")).collect()
    require(rows.nonEmpty, "empty unigram model artifact")
    Model(rows.map(r => r.getString(0) -> r.getLong(1)).toMap,
      rows.head.getLong(2).toInt, rows.head.getLong(3))
  }
}
