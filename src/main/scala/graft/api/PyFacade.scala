package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Similarity
import graft.text.TextFunctions

/**
 * py4j-friendly facade over the pipeline operators: flat signatures only
 * (no `Option`, no default arguments, no `Column` parameters — none of
 * which cross the py4j boundary), one method per operator, all taking and
 * returning `DataFrame`. The PySpark module `graft/pipeline.py` binds to
 * exactly this surface; Scala callers should use the richer per-package
 * APIs directly.
 *
 * Convention: a non-positive value for an optional numeric knob selects
 * the operator's default/disabled behavior (documented per method).
 */
object PyFacade {

  // --- dedup ------------------------------------------------------------

  def exactCanon(df: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.exactCanon(df, idCol, textCol)

  /** maxDocFreq <= 0 disables the skew cap (exact results). */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double, n: Int, maxDocFreq: Int): DataFrame =
    Dedup.jaccardPairs(df, idCol, textCol, tau, n,
      if (maxDocFreq <= 0) None else Some(maxDocFreq))

  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double, n: Int, numHashes: Int, bandRows: Int): DataFrame =
    Dedup.minhashPairs(df, idCol, textCol, tau, n, numHashes, bandRows)

  /** Cross-corpus incremental dedup: new-vs-old near-dup pairs only. */
  def minhashPairsAcross(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, tau: Double, n: Int, numHashes: Int, bandRows: Int): DataFrame =
    Dedup.minhashPairsAcross(left, right, idCol, textCol, tau, n, numHashes, bandRows)

  /** Near-superset pairs by max-containment; maxDocFreq <= 0 disables
    * the skew cap. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      tau: Double, n: Int, maxDocFreq: Int): DataFrame =
    Dedup.containmentPairs(df, idCol, textCol, tau, n,
      if (maxDocFreq <= 0) None else Some(maxDocFreq))

  /** Longest shared verbatim token span per pair (>= minSpan tokens);
    * maxDocFreq <= 0 disables the boilerplate-run cap. */
  def substringPairs(df: DataFrame, idCol: String, textCol: String,
      minSpan: Int, k: Int, maxDocFreq: Int): DataFrame =
    Dedup.substringPairs(df, idCol, textCol, minSpan, k,
      if (maxDocFreq <= 0) None else Some(maxDocFreq))

  /** Winnowed substring dedup: (doc_i, doc_j, span_lb), detection
    * guaranteed for spans >= w+k-1, span_lb tight to 2(w-1);
    * maxDocFreq <= 0 disables the boilerplate-run cap. */
  def winnowedSubstringPairs(df: DataFrame, idCol: String, textCol: String,
      minSpanLb: Int, k: Int, w: Int, maxDocFreq: Int): DataFrame =
    Dedup.winnowedSubstringPairs(df, idCol, textCol, minSpanLb, k, w,
      if (maxDocFreq <= 0) None else Some(maxDocFreq))

  /** useMd5 = true picks the oracle-replayable md5 fingerprint hasher. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, useMd5: Boolean): DataFrame =
    Dedup.simhashPairs(df, idCol, textCol, maxHamming,
      if (useMd5) graft.functions.Md5Simhash.md5Simhash else graft.functions.TextSimhash.textSimhash)

  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame =
    Dedup.embeddingPairs(df, idCol, vecCol, tau)

  def embeddingPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      tau: Double, planes: Int, tables: Int): DataFrame =
    Dedup.embeddingPairsLsh(df, idCol, vecCol, tau, planes, tables)

  /** Connected components over a pair list; fails loudly if `maxIters`
    * truncates propagation (same default as the Scala API). */
  def clusterPairs(pairs: DataFrame, iCol: String, jCol: String, maxIters: Int): DataFrame =
    Dedup.clusterPairs(pairs, iCol, jCol, maxIters)

  /** As-of join (latest right row at-or-before each left row's time per
    * key); keys as a comma-separated list. */
  def asofJoin(left: DataFrame, right: DataFrame, keysCsv: String,
      leftTsCol: String, rightTsCol: String, joinType: String): DataFrame =
    asofJoin(left, right, keysCsv, leftTsCol, rightTsCol, joinType, "backward")

  /** Direction-selecting overload: backward | forward | nearest. */
  def asofJoin(left: DataFrame, right: DataFrame, keysCsv: String,
      leftTsCol: String, rightTsCol: String, joinType: String,
      direction: String): DataFrame =
    graft.join.AsOfJoin.asof(left, right,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, leftTsCol, rightTsCol,
      joinType, direction)

  /** Tolerance-bounded as-of: matches older than `tolerance` (numeric
    * ts-distance units: micros for timestamps, days for dates) drop
    * (inner) or null out (left). */
  def asofJoinWithin(left: DataFrame, right: DataFrame, keysCsv: String,
      leftTsCol: String, rightTsCol: String, tolerance: Long,
      joinType: String, direction: String): DataFrame =
    graft.join.AsOfJoin.asofWithin(left, right,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, leftTsCol, rightTsCol,
      tolerance, joinType, direction)

  /** Hot-key-safe as-of join: every key additionally split by
    * floor(ts / bucketWidth) buckets (ts read as double — epoch seconds
    * for timestamps), so no task holds a whole key's timeline. */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keysCsv: String,
      leftTsCol: String, rightTsCol: String, bucketWidth: Double,
      joinType: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    graft.join.AsOfJoin.asofBucketed(left, right,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, leftTsCol, rightTsCol,
      t => floor(t.cast("double") / bucketWidth).cast("long"), joinType)
  }

  /** Range (interval) join: (point, interval) pairs with lo <= v <= hi;
    * bucketWidth <= 0 derives the width from interval statistics. NOTE:
    * the derived-width path runs an EAGER Spark job at call time (one
    * slim stats aggregate over the interval bounds, see
    * [[graft.join.RangeJoin.autoWidth]]) — the only eager call in this
    * otherwise lazy DataFrame-building API; the join itself re-evaluates
    * the intervals plan lazily as usual. Pass an explicit width to stay
    * fully lazy. */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, bucketWidth: Double,
      joinType: String): DataFrame = {
    val w = if (bucketWidth > 0) bucketWidth
      else graft.join.RangeJoin.autoWidth(intervals, col(loCol), col(hiCol))
    graft.join.RangeJoin.pointInInterval(points, intervals,
      col(pointCol), col(loCol), col(hiCol), w, joinType = joinType)
  }

  /** Interval×interval overlap join (inclusive ends); joinType
    * `inner` | `left` (left: misses keep null right columns). */
  def overlapJoin(left: DataFrame, right: DataFrame,
      leftLoCol: String, leftHiCol: String, rightLoCol: String,
      rightHiCol: String, bucketWidth: Double, joinType: String): DataFrame = {
    require(Seq("inner", "left").contains(joinType),
      s"joinType must be 'inner' or 'left', got '$joinType'")
    if (joinType == "inner")
      graft.join.RangeJoin.overlapJoin(left, right, col(leftLoCol),
        col(leftHiCol), col(rightLoCol), col(rightHiCol), bucketWidth)
    else
      graft.join.RangeJoin.overlapJoinLeft(left, right, col(leftLoCol),
        col(leftHiCol), col(rightLoCol), col(rightHiCol), bucketWidth)
  }

  // --- similarity search ------------------------------------------------

  def cosineTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    Similarity.cosineTopK(queries, candidates, idCol, vecCol, k)

  def lshCosineTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int, tables: Int): DataFrame =
    Similarity.lshCosineTopK(queries, candidates, idCol, vecCol, k, planes, tables)

  def ivfTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int, nprobe: Int): DataFrame =
    Similarity.ivfTopK(queries, candidates, idCol, vecCol, k, nlist, nprobe)

  def ivfTopKWith(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    Similarity.ivfTopKWith(queries, candidates, centroids, idCol, vecCol, k, nprobe)

  /** Hard-negative mining: top-k similar-but-below-threshold per query. */
  def hardNegatives(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      dupThreshold: Double): DataFrame =
    Similarity.hardNegatives(queries, candidates, idCol, vecCol, k,
      shortlist, dupThreshold)

  def trainCentroids(candidates: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int): DataFrame =
    Similarity.trainCentroids(candidates, idCol, vecCol, nlist, iters)

  /** Product-quantization ANN end-to-end: train per-subspace codebooks
    * on the candidates, ADC-scan, exact-re-rank the shortlist.
    * `shortlist <= 0` means unbounded (structurally exact). */
  def pqTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int, ksub: Int, iters: Int, shortlist: Int): DataFrame = {
    val cb = graft.similarity.ProductQuantizer.train(candidates, idCol, vecCol, m, ksub, iters)
    graft.similarity.ProductQuantizer.topK(queries, candidates, idCol, vecCol, k,
      cb, if (shortlist <= 0) Int.MaxValue else shortlist)
  }

  /** IVF-restricted PQ top-k (the composed FAISS IVFx,PQy shape):
    * trains the coarse quantizer and codebooks on the candidates, then
    * probes nprobe cells per query; shortlist<=0 re-ranks everything. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int, m: Int, ksub: Int, iters: Int,
      nprobe: Int, shortlist: Int): DataFrame = {
    val cents = graft.similarity.Similarity.trainCentroids(
      candidates, idCol, vecCol, nlist, iters)
    val cb = graft.similarity.ProductQuantizer.train(
      candidates, idCol, vecCol, m, ksub, iters)
    graft.similarity.IvfPq.topK(queries, candidates, cents, idCol, vecCol, k,
      cb, nprobe, if (shortlist <= 0) Int.MaxValue else shortlist)
  }

  // --- text analysis ----------------------------------------------------

  /** One-pass per-document text profile: token counts (whitespace and
    * BPE-ish), length, quality ratios, language id, md5 fingerprint —
    * the column-function surface flattened into a single DataFrame op
    * (python callers cannot compose `Column` functions directly). */
  def textProfile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    profileWith(df, idCol, textCol, TextFunctions.tokens)

  /** [[textProfile]] with Unicode-aware tokenization
    * ([[TextFunctions.tokensUnicode]]): splits on runs of any Unicode
    * whitespace (tab / newline / NBSP / the U+2000 block / ideographic
    * space), the opt-in for corpora that are not single-space
    * delimited. */
  def textProfileUnicode(df: DataFrame, idCol: String, textCol: String): DataFrame =
    profileWith(df, idCol, textCol, TextFunctions.tokensUnicode)

  /** Corpus vocabulary: (token, doc_freq, total_freq). */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextFunctions.vocabulary(df, idCol, textCol)

  /** TF-IDF top-m terms per document: (idCol, token, tfidf_r6, rnk). */
  def tfidfTopM(df: DataFrame, idCol: String, textCol: String, m: Int): DataFrame =
    TextFunctions.tfidfTopM(df, idCol, textCol, m)

  /** Dedup-keying normalization of `textCol` into `outCol`: lowercase,
    * non-alphanumerics to spaces, runs collapsed, trimmed. */
  def normalizeText(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, TextFunctions.normalizeText(col(textCol)))

  /** Group-wise exact quantiles over a value histogram:
    * (groupCols..., n, min_<v>, max_<v>, p<q>...). */
  def groupQuantiles(df: DataFrame, groupColsCsv: String, valueCol: String,
      qs: java.util.List[Integer]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.stats.GroupStats.quantiles(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      valueCol, qs.asScala.toSeq.map(_.intValue))
  }

  /** Hot-phrase mining (boilerplate discovery): top-k most
    * document-frequent n-grams per stratum —
    * (stratumCol, rank, phrase, df). */
  def hotPhrases(df: DataFrame, stratumCol: String, textCol: String,
      n: Int, k: Int, minDf: Long): DataFrame =
    TextFunctions.hotPhrases(df, stratumCol, textCol, n, k, minDf)

  /** BM25 top-k retrieval of corpus docs per query:
    * (qIdCol, idCol, bm25_r6, rnk). */
  def bm25TopK(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, qTextCol: String, idCol: String, textCol: String,
      k: Int, k1: Double, b: Double): DataFrame =
    graft.text.Bm25.topK(queries, corpus, qIdCol, qTextCol, idCol, textCol, k, k1, b)

  /** Bigram-LM quality score (CCNet-style perplexity filter): train an
    * add-one bigram LM on `ref` (vocabulary tail below `minCount` maps
    * to `<unk>`), score every `df` document —
    * (idCol, n_bigrams, bi_logp_r6). */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, minCount: Long): DataFrame =
    graft.text.NgramLm.score(df, idCol, textCol,
      graft.text.NgramLm.train(ref, refTextCol, minCount))

  /** Repetition profile (Gopher-family quality filter):
    * (doc, n_tokens, top_frac, dup_frac). */
  def repetitionProfile(df: DataFrame, idCol: String, textCol: String,
      topN: Int, dupN: Int): DataFrame =
    TextFunctions.repetitionProfile(df, idCol, textCol, topN, dupN)

  /** Per-language corpus report with histogram-rank quantiles:
    * (lang_pred, n_docs, total_tokens, max_tokens, p50_tokens,
    * p90_tokens). */
  /** HLL-sketch corpus statistics per stratum: (strata..., n_docs,
    * approx_distinct_content, total_tokens, approx_distinct_tokens). */
  def corpusSketch(df: DataFrame, strataCsv: String, textCol: String,
      rsd: Double): DataFrame =
    graft.text.CorpusSketch.sketch(df,
      strataCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, textCol, rsd)

  def corpusProfile(df: DataFrame, textCol: String): DataFrame =
    graft.text.CorpusProfile.profile(df, textCol)

  /** Train a logistic quality model on the standard 4-feature text
    * profile (stop ratio, distinct ratio, capped length/1000, avg token
    * len) against a 0/1 label column, then score every row:
    * (idCol, labelCol, q_score). Training is `iters` map-side-combined
    * gradient aggregations; only the 5-element gradient reaches the
    * driver per round. */
  def trainQualityScore(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, iters: Int, lr: Double, l2: Double): DataFrame = {
    import org.apache.spark.sql.functions._
    val feats = qualityFeatures(df, idCol, textCol, Seq(labelCol))
    val model = graft.ml.Logistic.train(feats, "__f", labelCol, iters, lr, l2)
    feats.select(col(idCol), col(labelCol), model.scoreCol(col("__f")).as("q_score"))
  }

  /** The standard 4-feature text profile as an `__f` array column (stop
    * ratio, distinct ratio, capped length/1000, avg token len) — shared
    * by the fresh-train and from-artifact quality-score paths so the two
    * can never drift. */
  private def qualityFeatures(df: DataFrame, idCol: String, textCol: String,
      carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(col(idCol) +: carry.map(col) :+
        TextFunctions.tokens(col(textCol)).as("__ws"): _*)
      .select(col(idCol) +: carry.map(col) :+ array(
        coalesce(TextFunctions.stopwordRatio(col("__ws")), lit(0.0d)),
        coalesce(TextFunctions.distinctTokenRatio(col("__ws")), lit(0.0d)),
        coalesce(when(size(col("__ws")) > 0,
          least(size(col("__ws")).cast("double") / lit(1000.0d), lit(1.0d))), lit(0.0d)),
        coalesce(TextFunctions.avgTokenLen(col("__ws")), lit(0.0d))).as("__f"): _*)
  }

  // --- corpus-trained BPE (graft.text.Bpe) ------------------------------

  /** Learn a BPE merge table from the corpus:
    * (merge_rank, lft, rgt, pair_cnt) — persist it as parquet and feed
    * it back to the serving calls below. */
  /** [[bpeTrain]] with the driver-histogram cap for open-vocabulary
    * corpora: top `maxWords` distinct words by (count desc, word asc). */
  def bpeTrainCapped(df: DataFrame, textCol: String, rounds: Int,
      maxWords: Int): DataFrame =
    graft.text.Bpe.mergesDF(df.sparkSession,
      graft.text.Bpe.train(df, textCol, rounds, maxWords))

  def bpeTrain(df: DataFrame, textCol: String, rounds: Int): DataFrame =
    graft.text.Bpe.mergesDF(df.sparkSession,
      graft.text.Bpe.train(df, textCol, rounds))

  /** Trained-subword tokens per document: (idCol, subwords array). */
  def bpeSegment(df: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val ms = graft.text.Bpe.mergesFrom(merges)
    df.select(col(idCol), graft.text.Bpe.bpeTokens(col(textCol), ms).as("subwords"))
  }

  /** Trained-subword counts per document: (idCol, n_bpe). */
  def bpeCounts(df: DataFrame, idCol: String, textCol: String,
      merges: DataFrame): DataFrame = {
    val ms = graft.text.Bpe.mergesFrom(merges)
    df.select(col(idCol), graft.text.Bpe.tokenCount(col(textCol), ms).as("n_bpe"))
  }

  /** [[packSequences]] billing REAL trained subwords against the budget
    * (the production token-budget shape). */
  def packSequencesBpe(df: DataFrame, idCol: String, textCol: String,
      budget: Int, merges: DataFrame, targetGroups: Int): DataFrame = {
    val ms = graft.text.Bpe.mergesFrom(merges)
    TextFunctions.packSequencesBy(df, idCol, textCol, budget,
      t => graft.text.Bpe.tokenCount(t, ms), targetGroups)
  }

  // --- trained-state persistence (graft.ml.ModelStore) ------------------

  /** Train IVF centroids and persist the parquet artifact at `path`;
    * returns the centroid frame that was saved. */
  def trainAndSaveCentroids(candidates: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, path: String): DataFrame = {
    val cents = Similarity.trainCentroids(candidates, idCol, vecCol, nlist, iters)
    graft.ml.ModelStore.saveCentroids(cents, path)
    cents
  }

  /** Reload a centroid artifact (feed to [[ivfTopKWith]]). `anchor` is
    * any DataFrame of the target session — py4j callers pass a frame,
    * not a session. */
  def loadCentroids(anchor: DataFrame, path: String): DataFrame =
    graft.ml.ModelStore.loadCentroids(anchor.sparkSession, path)

  /** Train PQ codebooks and persist them at `path`. */
  def trainAndSavePq(candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, path: String): Unit =
    graft.ml.ModelStore.savePq(candidates.sparkSession,
      graft.similarity.ProductQuantizer.train(candidates, idCol, vecCol, m, ksub, iters),
      path)

  /** PQ ANN served from a RELOADED codebook artifact — the
    * train-once-score-for-months path. `shortlist <= 0` = unbounded. */
  def pqTopKFromArtifact(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, path: String, shortlist: Int): DataFrame =
    graft.similarity.ProductQuantizer.topK(queries, candidates, idCol, vecCol, k,
      graft.ml.ModelStore.loadPq(queries.sparkSession, path),
      if (shortlist <= 0) Int.MaxValue else shortlist)

  /** Train a BPE merge table and persist it at `path` (maxWords <= 0
    * keeps every distinct word). */
  def trainAndSaveBpe(df: DataFrame, textCol: String, rounds: Int,
      maxWords: Int, path: String): Unit =
    graft.ml.ModelStore.saveBpe(df.sparkSession,
      graft.text.Bpe.train(df, textCol, rounds,
        if (maxWords <= 0) Int.MaxValue else maxWords), path)

  /** Trained-subword counts served from a RELOADED merge-table
    * artifact (the native runtime serve). */
  def bpeCountsFromArtifact(df: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame = {
    val ms = graft.ml.ModelStore.loadBpe(df.sparkSession, path)
    df.select(col(idCol), graft.text.Bpe.tokenCount(col(textCol), ms).as("n_bpe"))
  }

  /** Export a parquet BPE artifact as a GPT-2/HuggingFace merges.txt
    * (rank-ordered "left right" lines) — the tokenizer-interop form. */
  def exportBpeMergesTxt(df: DataFrame, parquetPath: String, txtPath: String): Unit =
    graft.ml.ModelStore.exportBpeMerges(df.sparkSession,
      graft.ml.ModelStore.loadBpe(df.sparkSession, parquetPath), txtPath)

  /** Trained-subword counts served from an IMPORTED merges.txt (rank
    * order alone drives segmentation — must equal the parquet serve). */
  def bpeCountsFromMergesTxt(df: DataFrame, idCol: String, textCol: String,
      txtPath: String): DataFrame = {
    val ms = graft.ml.ModelStore.importBpeMerges(df.sparkSession, txtPath)
    df.select(col(idCol), graft.text.Bpe.tokenCount(col(textCol), ms).as("n_bpe"))
  }

  /** Train int8 scalar-quantization params and persist them at `path`. */
  def trainAndSaveInt8(candidates: DataFrame, vecCol: String, path: String): Unit =
    graft.ml.ModelStore.saveInt8(candidates.sparkSession,
      graft.similarity.ScalarQuantizer.train(candidates, vecCol), path)

  /** Int8-shortlisted exact-rerank top-k from a RELOADED parameter
    * artifact. `shortlist <= 0` = unbounded (structurally exact). */
  def int8TopKFromArtifact(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, path: String, shortlist: Int): DataFrame =
    graft.similarity.ScalarQuantizer.topK(queries, candidates, idCol, vecCol, k,
      graft.ml.ModelStore.loadInt8(queries.sparkSession, path),
      if (shortlist <= 0) Int.MaxValue else shortlist)

  /** Train binary (1-bit sign) quantization thresholds and persist
    * them at `path`. */
  def trainAndSaveBinary(candidates: DataFrame, vecCol: String, path: String): Unit =
    graft.ml.ModelStore.saveBinary(candidates.sparkSession,
      graft.similarity.BinaryQuantizer.train(candidates, vecCol), path)

  /** Binary-Hamming-shortlisted exact-rerank top-k from a RELOADED
    * threshold artifact. `shortlist <= 0` = unbounded (structurally
    * exact). */
  def binaryTopKFromArtifact(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, path: String, shortlist: Int): DataFrame =
    graft.similarity.BinaryQuantizer.topK(queries, candidates, idCol, vecCol, k,
      graft.ml.ModelStore.loadBinary(queries.sparkSession, path),
      if (shortlist <= 0) Int.MaxValue else shortlist)

  /** Train an add-one bigram LM on `ref` and persist its count tables. */
  def trainAndSaveBigramLm(ref: DataFrame, refTextCol: String, minCount: Long,
      path: String): Unit =
    graft.ml.ModelStore.saveBigramLm(
      graft.text.NgramLm.train(ref, refTextCol, minCount), path)

  /** Bigram-LM scoring from a RELOADED artifact — identical output to
    * [[bigramLmScore]] trained fresh on the same reference corpus. */
  def bigramLmScoreFromArtifact(df: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame =
    graft.text.NgramLm.score(df, idCol, textCol,
      graft.ml.ModelStore.loadBigramLm(df.sparkSession, path))

  /** Train a logistic quality model on the standard 4-feature profile
    * and persist weights + bias + loss trajectory at `path`. */
  def trainAndSaveQualityModel(df: DataFrame, idCol: String, textCol: String,
      labelCol: String, iters: Int, lr: Double, l2: Double, path: String): Unit = {
    val feats = qualityFeatures(df, idCol, textCol, Seq(labelCol))
    graft.ml.ModelStore.saveLogistic(df.sparkSession,
      graft.ml.Logistic.train(feats, "__f", labelCol, iters, lr, l2), path)
  }

  /** Quality scoring from a RELOADED weight artifact:
    * (idCol, q_score). */
  def qualityScoreFromArtifact(df: DataFrame, idCol: String, textCol: String,
      path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val model = graft.ml.ModelStore.loadLogistic(df.sparkSession, path)
    qualityFeatures(df, idCol, textCol, Nil)
      .select(col(idCol), model.scoreCol(col("__f")).as("q_score"))
  }

  /** Benchmark decontamination: contaminated corpus docs as
    * (doc, hits, max_span); anti-join on the id for the clean corpus. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int,
      broadcastBench: Boolean): DataFrame =
    graft.dedup.Dedup.decontaminate(corpus, idCol, textCol, bench, benchTextCol,
      k, broadcastBench)

  /** Bloom-prefiltered decontamination: distinct contaminated doc ids;
    * the corpus probes a broadcast bloom map-side, exact-verified. */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int,
      expectedItems: Long, fpp: Double): DataFrame =
    graft.dedup.Dedup.decontaminateBloom(corpus, idCol, textCol, bench,
      benchTextCol, k, expectedItems, fpp)

  /** N-gram overlap-fraction decontamination report:
    * (doc, n_grams, n_hit, frac, contaminated). */
  def decontamOverlap(corpus: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int, theta: Double,
      broadcastBench: Boolean): DataFrame =
    graft.dedup.Dedup.decontamOverlap(corpus, idCol, textCol, bench,
      benchTextCol, n, theta, broadcastBench)

  /** Segment-level (C4-style line) dedup:
    * (doc, text_clean, n_kept, n_dropped). */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      seg: Int): DataFrame =
    graft.dedup.Dedup.segmentDedup(df, idCol, textCol, seg)

  /** SemDeDup-style semantic dedup over an embedding column:
    * (doc, cluster, is_dup). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      k: Int, tau: Double): DataFrame =
    graft.dedup.Dedup.semanticDedup(df, idCol, vecCol, k, tau)

  /** Blocking-based record linkage: within-block Levenshtein pairs
    * (id_i, id_j, dist); blockKeyExpr is a SQL expression over the
    * input's columns; maxBlock <= 0 disables the skew cap. */
  def linkBlockedPairs(df: DataFrame, idCol: String, nameCol: String,
      blockKeyExpr: String, maxDist: Int, maxBlock: Int): DataFrame =
    graft.link.RecordLinkage.blockedPairs(df, idCol, nameCol,
      org.apache.spark.sql.functions.expr(blockKeyExpr), maxDist,
      if (maxBlock <= 0) None else Some(maxBlock))

  /** Approximate (GK) group quantiles: group cols + n + ap<q> columns. */
  def groupApproxQuantiles(df: DataFrame, groupColsCsv: String, valueCol: String,
      qsCsv: String, accuracy: Int): DataFrame =
    graft.stats.GroupStats.approxQuantiles(df,
      groupColsCsv.split(",").map(_.trim).toSeq, valueCol,
      qsCsv.split(",").map(_.trim.toInt).toSeq, accuracy)

  /** Temperature sampling: stratum shares ∝ count^alpha. */
  def temperatureSample(df: DataFrame, keyCol: String, stratumCol: String,
      alpha: Double): DataFrame =
    graft.curation.Sampling.temperatureSample(df, keyCol, stratumCol, alpha)

  /** Persistable MinHash corpus index (doc, sh, sig). */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int): DataFrame =
    graft.dedup.Dedup.buildMinhashIndex(df, idCol, textCol, n, numHashes)

  /** Save/load a MinHash index artifact. */
  def saveMinhashIndex(index: DataFrame, path: String): Unit =
    graft.ml.ModelStore.saveMinhashIndex(index, path)
  def loadMinhashIndex(anchor: DataFrame, path: String): DataFrame =
    graft.ml.ModelStore.loadMinhashIndex(anchor.sparkSession, path)

  /** Delta-append a batch's index rows to a SAVED index at `path`
    * (parameters derived from the saved head row; cost and I/O are
    * proportional to the delta, never the corpus). */
  def appendMinhashIndex(delta: DataFrame, path: String,
      idCol: String, textCol: String): Unit =
    graft.ml.ModelStore.appendMinhashIndex(delta.sparkSession, path,
      delta, idCol, textCol)

  /** Collapse the exact-duplicate rows unchanged re-ingests append
    * (periodic maintenance; full-row distinct). */
  def compactMinhashIndex(index: DataFrame): DataFrame =
    graft.dedup.Dedup.compactMinhashIndex(index)

  /** Incremental near-dup probe of a batch against a prebuilt index:
    * (doc_i, doc_j, jac). */
  def minhashPairsVsIndex(left: DataFrame, idCol: String, textCol: String,
      index: DataFrame, tau: Double, bandRows: Int): DataFrame =
    graft.dedup.Dedup.minhashPairsVsIndex(left, idCol, textCol, index, tau, bandRows)

  /** Keep-policy exact dedup: best-scored copy wins its group. */
  def exactCanonBy(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String, descending: Boolean): DataFrame =
    graft.dedup.Dedup.exactCanonBy(df, idCol, textCol, scoreCol, descending)

  /** Unigram tokenizer training → the persistable (piece, lp_micro,
    * max_piece_len, unk_micro) frame. */
  def unigramTrain(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int): DataFrame =
    graft.text.Unigram.piecesDF(df.sparkSession,
      graft.text.Unigram.train(df, textCol, vocabSize, maxPieceLen))

  /** One Viterbi-EM refinement round over a pieces frame: re-segment
    * the corpus under it, recount path pieces, re-normalize — returns
    * the refined persistable frame. */
  def unigramEmRefine(df: DataFrame, textCol: String,
      pieces: DataFrame): DataFrame =
    graft.text.Unigram.piecesDF(df.sparkSession,
      graft.text.Unigram.emRefine(df, textCol,
        graft.text.Unigram.piecesFrom(pieces)))

  /** Multi-round Viterbi-EM from a pieces frame, with the corpus
    * log-likelihood trajectory: returns the [[graft.ml.ModelStore
    * .saveUnigram]] artifact shape — (kind, idx, piece, value) rows
    * carrying the refined model AND the micro-nat LL per round
    * (kind `ll`, idx 0 = seed score), so the python side reads the
    * convergence evidence from the same frame it persists. */
  def unigramEmTrain(df: DataFrame, textCol: String, pieces: DataFrame,
      rounds: Int): DataFrame = {
    val r = graft.text.Unigram.emTrain(df, textCol,
      graft.text.Unigram.piecesFrom(pieces), rounds)
    val m = r.model
    val rows =
      m.pieces.toSeq.sortBy(_._1).zipWithIndex
        .map { case ((p, lp), i) => ("piece", i, p, lp) } ++
      Seq(("meta", 0, "max_piece_len", m.maxPieceLen.toLong),
          ("meta", 1, "unk_micro", m.unkMicro)) ++
      r.llMicro.toSeq.zipWithIndex.map { case (ll, t) => ("ll", t, "", ll) }
    df.sparkSession.createDataFrame(rows)
      .toDF("kind", "idx", "piece", "value")
  }

  /** Viterbi word scores under a pieces frame:
    * (word, score_micro, n_pieces). */
  def unigramWordScores(df: DataFrame, wordCol: String,
      pieces: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val m = graft.text.Unigram.piecesFrom(pieces)
    df.select(col(wordCol).as("word"),
        graft.text.Unigram.wordScore(col(wordCol), m).as("__s"))
      .select(col("word"), col("__s.score_micro").as("score_micro"),
        col("__s.n_pieces").as("n_pieces"))
  }

  /** Per-document trained-subword counts under a pieces frame. */
  def unigramTokenCount(df: DataFrame, idCol: String, textCol: String,
      pieces: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val m = graft.text.Unigram.piecesFrom(pieces)
    df.select(col(idCol),
      graft.text.Unigram.tokenCount(col(textCol), m).as("n_unigram"))
  }

  /** Corpus drift: per-bucket report (bucket, c_a, c_b, lr_micro). */
  def driftReport(a: DataFrame, aTextCol: String, b: DataFrame, bTextCol: String,
      buckets: Int, nsCsv: String): DataFrame =
    graft.text.CorpusDrift.report(a, aTextCol, b, bTextCol, buckets,
      nsCsv.split(",").map(_.trim.toInt).toSeq)

  /** Corpus drift one-row summary: (n_grams_a, n_grams_b, kl_ab_micro,
    * tvd_num, tvd_r6). */
  def driftSummary(a: DataFrame, aTextCol: String, b: DataFrame, bTextCol: String,
      buckets: Int, nsCsv: String): DataFrame =
    graft.text.CorpusDrift.summary(a, aTextCol, b, bTextCol, buckets,
      nsCsv.split(",").map(_.trim.toInt).toSeq)

  /** Z-order layout rewrite: same rows, clustered partitioning. */
  def zorderBy(df: DataFrame, colsCsv: String, partitions: Int,
      bits: Int): DataFrame =
    graft.layout.ZOrder.zorderBy(df,
      colsCsv.split(",").map(_.trim).toSeq, partitions, bits)

  /** DSIR importance weights: (doc, n_feats, logratio_micro). */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int, nsCsv: String): DataFrame =
    graft.curation.Sampling.importanceWeights(raw, idCol, textCol,
      target, targetTextCol, buckets, nsCsv.split(",").map(_.trim.toInt).toSeq)

  /** Quota sampling: k best rows per stratum by a numeric score —
    * stratum cols + (rank, id, score). */
  def quotaTopK(df: DataFrame, stratumCols: java.util.List[String],
      scoreCol: String, idCol: String, k: Int, descending: Boolean): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.curation.Sampling.quotaTopK(df, stratumCols.asScala.toSeq, scoreCol,
      idCol, k, descending)
  }

  /** Deterministic hash-rate sampling; thresholds map stratum → 4 hex
    * chars (keep-rate = parseInt(threshold,16)/65536). */
  def hashSample(df: DataFrame, keyCol: String, stratumCol: String,
      thresholds: java.util.Map[String, String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.curation.Sampling.hashSample(df, keyCol, stratumCol, thresholds.asScala.toMap)
  }

  /** Mixture sampling: downsample strata to target mixture weights
    * (binding stratum keeps 100%, no upsampling); deterministic
    * content-hash selection. NOTE: runs one strata-sized counting job
    * at call time. */
  def mixtureSample(df: DataFrame, keyCol: String, stratumCol: String,
      weights: java.util.Map[String, java.lang.Double]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.curation.Sampling.mixtureSample(df, keyCol, stratumCol,
      weights.asScala.view.mapValues(_.doubleValue).toMap)
  }

  /** Deterministic train/val/test split by content hash: appends
    * `outCol` with one of `labels`; ORDERED parallel lists because the
    * cumulative boundaries depend on split order. */
  def splitByHash(df: DataFrame, keyCol: String,
      labels: java.util.List[String], weights: java.util.List[java.lang.Double],
      outCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.curation.Sampling.splitByHash(df, keyCol,
      labels.asScala.toSeq.zip(weights.asScala.toSeq.map(_.doubleValue)), outCol)
  }

  /** Leakage-safe split: connected components of the near-dup `pairs`
    * graph move as one unit (split label hashes the component
    * representative; singletons hash their own id). */
  def groupSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      labels: java.util.List[String], weights: java.util.List[java.lang.Double],
      outCol: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.curation.Sampling.groupSplit(df, idCol, pairs,
      labels.asScala.toSeq.zip(weights.asScala.toSeq.map(_.doubleValue)), outCol)
  }

  /** Greedy sequence packing: (idCol, n_tokens, bin_id, bin_offset) —
    * docs concatenate in id order, cut every `budget` tokens. NOTE:
    * runs one eager min/max/count stats job at call time. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Int, targetGroups: Int): DataFrame =
    TextFunctions.packSequences(df, idCol, textCol, budget, targetGroups)

  /** PII redaction (emails / IPv4s / long digit runs → typed
    * placeholders) into `outCol`. */
  def redactPii(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, TextFunctions.redactPii(col(textCol)))

  /** Sliding token-window chunks: (idCol, chunk_index, chunk, n_tokens). */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      chunk: Int, overlap: Int): DataFrame =
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), posexplode(TextFunctions.tokenChunks(col("__ws"), chunk, overlap)))
      .select(col(idCol), col("pos").cast("long").as("chunk_index"),
        col("col").as("chunk"),
        TextFunctions.tokenCount(TextFunctions.tokens(col("col"))).as("n_tokens"))

  private def profileWith(df: DataFrame, idCol: String, textCol: String,
      tokenize: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol), col(textCol).as("__t"),
        tokenize(col(textCol)).as("__ws"))
      .select(col(idCol),
        TextFunctions.tokenCount(col("__ws")).as("n_tokens"),
        TextFunctions.bpeTokenCount(col("__t")).as("bpe_tokens"),
        length(col("__t")).cast("long").as("len_chars"),
        TextFunctions.avgTokenLen(col("__ws")).as("avg_token_len"),
        TextFunctions.stopwordRatio(col("__ws")).as("stopword_ratio"),
        TextFunctions.distinctTokenRatio(col("__ws")).as("distinct_ratio"),
        TextFunctions.langId(col("__ws")).as("lang"),
        TextFunctions.md5Fingerprint(col("__t")).as("fingerprint"))

  /** End-to-end curation: profile (tokens, quality ratios, language) →
    * filter (predicted language, minimum length, degeneracy floor) →
    * exact dedup keeping only canonical rows — one Catalyst plan. The
    * composition the pipeline operators exist for; `pipeline_curate` in
    * the correctness gate pins this exact method against a DuckDB
    * oracle. Output: (idCol, textCol, n_tokens, stop_ratio,
    * distinct_ratio, lang_pred), canonical rows only. */
  def curate(df: DataFrame, idCol: String, textCol: String,
      lang: String, minTokens: Int, minDistinctRatio: Double): DataFrame = {
    // a scan-shaped single-partition input would run the whole
    // profile+dedup chain on one core (probe-caught at x16) — spread
    // first, like every fan-out operator (JoinLayout discipline)
    val profiled = graft.join.JoinLayout.spreadIfDegenerate(df)
      .select(col(idCol), col(textCol), TextFunctions.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), col(textCol),
        size(col("__ws")).cast("long").as("n_tokens"),
        TextFunctions.stopwordRatio(col("__ws")).as("stop_ratio"),
        TextFunctions.distinctTokenRatio(col("__ws")).as("distinct_ratio"),
        TextFunctions.langId(col("__ws")).as("lang_pred"))
    val kept = profiled.where(col("lang_pred") === lang &&
      col("n_tokens") >= minTokens && col("distinct_ratio") >= minDistinctRatio)
    // canonical-only dedup: one map-side-combined min-id aggregation per
    // digest (Dedup.canonIds — the skew-safe shape, see DedupSkewSpec),
    // then a semi-join keeps exactly the surviving rows
    kept.join(Dedup.canonIds(kept, idCol, textCol), Seq(idCol), "left_semi")
  }

  /** Prefix-filtered exact Jaccard pairs — jaccardPairs output via
    * SSJoin/PPJoin prefix filtering (lossless, no maxDocFreq cap). */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
      tau: Double, n: Int): DataFrame =
    Dedup.jaccardPairsPrefix(df, idCol, textCol, tau, n)

  /** Exact positional phrase search: (doc, phrase, hits, first_pos). */
  def phraseHits(df: DataFrame, idCol: String, textCol: String,
      phrases: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.text.PhraseSearch.phraseHits(df, idCol, textCol, phrases.asScala.toSeq)
  }

  /** Streaming-capable phrase monitor: one row per (distinct content,
    * phrase) flag, original columns + phrase. */
  def phraseFlagged(df: DataFrame, textCol: String, tsCol: String,
      phrases: java.util.List[String], watermark: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.text.PhraseSearch.flagged(df, textCol, tsCol,
      phrases.asScala.toSeq, watermark)
  }

  /** Sentence segmentation, exploded: (idCol, sent_idx, sentence). */
  def sentences(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(TextFunctions.sentences(col(textCol))))
      .select(col(idCol), col("pos").cast("long").as("sent_idx"),
        col("col").as("sentence"))

  /** Hot-value profile: (value, cnt, rnk) top-k of a column. */
  def topValues(df: DataFrame, valueCol: String, k: Int): DataFrame =
    graft.stats.GroupStats.topValues(df, valueCol, k)

  /** Streaming SCD2 (custom flatMapGroupsWithState state): closed
    * episodes online, open episodes on idle timeout; batch input emits
    * closed episodes only. */
  def scd2Stream(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, watermark: String, idleTimeoutMicros: Long): DataFrame =
    graft.curation.ChangeHistory.scd2Stream(df, keyCol, tsCol, valueCol,
      watermark, idleTimeoutMicros)

  /** SCD2 change history: value episodes with valid_from/valid_to. */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
      valueColsCsv: String): DataFrame =
    graft.curation.ChangeHistory.scd2(df, keyCol, tsCol,
      valueColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  /** Two-proportion A/B test report (one row, micro-unit z). */
  def abTwoProportions(df: DataFrame, unitCol: String, variantCol: String,
      successCol: String): DataFrame =
    graft.stats.ABTest.twoProportions(df, unitCol, variantCol, successCol)

  /** Trailing-window per-event count feature (leakage-free frame). */
  def trailingCount(events: DataFrame, keyCol: String, tsCol: String,
      windowMicros: Long, outPrefix: String): DataFrame =
    graft.streaming.EventWindows.trailingCount(events, keyCol, tsCol,
      windowMicros, outPrefix)

  /** Windowed trending n-grams (batch or streaming frame). */
  def trendingGrams(df: DataFrame, tsCol: String, textCol: String, n: Int,
      windowDur: String, minDf: Long, watermark: String): DataFrame =
    graft.streaming.Trending.gramWindows(df, tsCol, textCol, n, windowDur,
      minDf, watermark)

  /** Per-group z-score standardization in exact micro-units. */
  def standardize(df: DataFrame, groupColsCsv: String, valueCol: String,
      outCol: String): DataFrame =
    graft.stats.GroupStats.standardize(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      valueCol, outCol)

  /** CDC merge-apply: snapshot + upsert/delete log -> next snapshot. */
  def cdcApply(snapshot: DataFrame, changes: DataFrame, keysCsv: String,
      tsCol: String, opCol: String): DataFrame =
    graft.curation.Cdc.applyLog(snapshot, changes,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, tsCol, opCol)

  /** Equal-frequency quantile binning; keys as a comma-separated list. */
  def quantileBins(df: DataFrame, groupColsCsv: String, valueCol: String,
      numBins: Int, outCol: String): DataFrame =
    graft.stats.GroupStats.quantileBins(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      valueCol, numBins, outCol)

  /** Cohort retention matrix: (cohort_period, period_offset, n_users). */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, anchorType: String, periodMicros: Long): DataFrame =
    graft.streaming.Retention.cohorts(events, userCol, tsCol, typeCol,
      anchorType, periodMicros)

  /** URL extraction: (id, url_idx, url, domain) rows per document. */
  def extractUrls(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), posexplode(graft.text.TextFunctions.urls(col(textCol))))
      .select(col(idCol), col("pos").cast("long").as("url_idx"),
        col("col").as("url"),
        graft.text.TextFunctions.urlDomain(col("col")).as("domain"))

  /** Salted hot-key equi-join; hotKeys may be null (salt everything). */
  def saltedJoin(left: DataFrame, right: DataFrame, keysCsv: String,
      saltFactor: Int, hotKeys: DataFrame, joinType: String): DataFrame =
    graft.join.SkewJoin.salted(left, right,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      saltFactor, Option(hotKeys), joinType)

  /** Bucketed layout write: external parquet table, one file/bucket. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keysCsv: String, numBuckets: Int): Unit =
    graft.layout.Bucketed.writeBucketed(df, table, path,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, numBuckets)

  /** Exchange-free equi-join of two co-bucketed tables. */
  def colocatedJoin(spark: org.apache.spark.sql.SparkSession, leftTable: String,
      rightTable: String, keysCsv: String, joinType: String): DataFrame =
    graft.layout.Bucketed.colocatedJoin(spark, leftTable, rightTable,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, joinType)

  /** Small-file compaction of a bucketed table: one file per bucket at
    * `newPath`, spec preserved, catalog swap on success. Returns
    * [filesBefore, filesAfter]. */
  def compactBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
      newPath: String): Array[Int] = {
    val s = graft.layout.Compact.compactBucketed(spark, table, newPath)
    Array(s.filesBefore, s.filesAfter)
  }

  /** Range-clustered bin-pack of a plain sorted parquet directory. */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, path: String,
      outPath: String, sortColsCsv: String, targetFiles: Int): Array[Int] = {
    val s = graft.layout.Compact.compactFiles(spark, path, outPath,
      sortColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, targetFiles)
    Array(s.filesBefore, s.filesAfter)
  }

  /** A catalog table's current storage location (capture it BEFORE a
    * compaction; the rewrite swaps the registration to the new path). */
  def tableLocation(spark: org.apache.spark.sql.SparkSession,
      table: String): String =
    graft.layout.Compact.tableLocation(spark, table).toString

  /** Delete a SUPERSEDED location (refuses live-table paths loudly).
    * Returns [filesRemoved, bytesRemoved]. */
  def vacuum(spark: org.apache.spark.sql.SparkSession,
      location: String): Array[Long] = {
    val v = graft.layout.Compact.vacuum(spark, location)
    Array(v.filesRemoved.toLong, v.bytesRemoved)
  }

  /** Weight-balanced contiguous shard assignment for training export. */
  def shardsAssign(df: DataFrame, idCol: String, weightCol: String,
      numShards: Int): DataFrame =
    graft.curation.Shards.assign(df, idCol, weightCol, numShards)

  /** Per-shard audit rollup of [[shardsAssign]]'s output. */
  def shardsManifest(assigned: DataFrame): DataFrame =
    graft.curation.Shards.manifest(assigned)

  /** One parquet file per shard at `path`. Returns
    * [shards, dataFiles, rows]. */
  def writeShards(assigned: DataFrame, path: String,
      numShards: Int): Array[Long] = {
    val s = graft.curation.Shards.writeShards(assigned, path, numShards)
    Array(s.shards.toLong, s.dataFiles.toLong, s.rows)
  }

  /** Point-in-time join: facts pick up the episode valid at fact ts. */
  def pointInTime(facts: DataFrame, history: DataFrame, keysCsv: String,
      factTsCol: String, validFromCol: String, validToCol: String,
      joinType: String): DataFrame =
    graft.curation.ChangeHistory.pointInTime(facts, history,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      factTsCol, validFromCol, validToCol, joinType)

  /** Funnel analysis: earliest greedy step chain per user. */
  def funnelEarliestChain(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: java.util.List[String], windowMicros: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.streaming.Funnel.earliestChain(events, userCol, tsCol, typeCol,
      steps.asScala.toSeq, windowMicros)
  }

  /** Row-level expectation rules (name -> SQL boolean marking BAD
    * rows), one aggregation pass. */
  def expectationsTableRules(df: DataFrame, names: java.util.List[String],
      badExprs: java.util.List[String]): DataFrame = {
    import scala.jdk.CollectionConverters._
    require(names.size == badExprs.size, "names/exprs must be equal-length")
    graft.stats.Expectations.tableRules(df,
      names.asScala.toSeq.zip(badExprs.asScala.toSeq.map(expr)))
  }

  /** Exactly-once key expectation. */
  def expectationsUniqueKey(df: DataFrame, keysCsv: String, rule: String): DataFrame =
    graft.stats.Expectations.uniqueKey(df,
      keysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, rule)

  /** FK orphan expectation (null child keys out of scope). */
  def expectationsReferential(child: DataFrame, childKeysCsv: String,
      parent: DataFrame, parentKeysCsv: String, rule: String): DataFrame =
    graft.stats.Expectations.referential(child,
      childKeysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      parent, parentKeysCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq, rule)

  /** Corpus snapshot diff: (id, status in added|removed|changed). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame =
    graft.curation.SnapshotDiff.diff(oldSnap, newSnap, idCol, textCol)

  /** Snapshot diff rollup: (status, n). */
  def snapshotDiffSummary(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame =
    graft.curation.SnapshotDiff.diffSummary(oldSnap, newSnap, idCol, textCol)

  /** Count-min sketch of token frequencies: (r, bucket, cnt). */
  def cmsBuild(df: DataFrame, textCol: String, depth: Int, width: Int): DataFrame =
    graft.text.CorpusSketch.cmsBuild(df, textCol, depth, width)

  /** CMS point estimates for probe terms: (term, est). */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame =
    graft.text.CorpusSketch.cmsEstimate(sketch, probes, termCol, depth, width)

  /** Hashing-trick features: (doc, bucket, cnt) sparse rows. */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      dim: Int, nsCsv: String): DataFrame =
    TextFunctions.hashedFeatures(df, idCol, textCol, dim,
      nsCsv.split(",").map(_.trim.toInt).toSeq)

  /** HTML → text extraction into `outCol`. */
  def stripHtml(df: DataFrame, htmlCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, TextFunctions.stripHtml(col(htmlCol)))

  /** [[curate]]'s AUDIT twin: every input row with its verdict —
    * `(idCol, kept, reason)`, reason the FIRST failing stage in
    * pipeline order (`lang`, `short`, `degenerate`, `duplicate`) or
    * `kept`. Same predicates, same canonical-id selection, so
    * `kept = true` rows are exactly [[curate]]'s survivors — the
    * explainability pass a curation run ships beside its output
    * (why did MY document disappear?). Same plan shapes: one profile
    * projection, the skew-safe canonIds aggregation, a left join back. */
  def curateAudit(df: DataFrame, idCol: String, textCol: String,
      lang: String, minTokens: Int, minDistinctRatio: Double): DataFrame = {
    // same degenerate-layout guard as curate (probe-caught: x16 wall
    // on one core under a single-file scan)
    val profiled = graft.join.JoinLayout.spreadIfDegenerate(df)
      .select(col(idCol), col(textCol), TextFunctions.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), col(textCol),
        size(col("__ws")).cast("long").as("__n"),
        TextFunctions.distinctTokenRatio(col("__ws")).as("__dr"),
        TextFunctions.langId(col("__ws")).as("__lang"))
    val kept = profiled.where(col("__lang") === lang &&
      col("__n") >= minTokens && col("__dr") >= minDistinctRatio)
    val canon = Dedup.canonIds(kept, idCol, textCol)
      .withColumn("__canon", lit(true))
    profiled.join(canon, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__canon"), lit(false)).as("kept"),
        when(col("__lang") =!= lang, "lang")
          .when(col("__n") < minTokens, "short")
          .when(col("__dr") < minDistinctRatio, "degenerate")
          .when(col("__canon").isNull, "duplicate")
          .otherwise("kept").as("reason"))
  }

  // --- multimodal -------------------------------------------------------

  private def codecOf(name: String): graft.multimodal.Multimodal.MediaCodec =
    name match {
      case "stub" => graft.multimodal.Multimodal.StubCodec
      case "imageio" => graft.multimodal.Multimodal.ImageIoCodec
      case "bmp" => graft.multimodal.Multimodal.BmpCodec
      case "wav" => graft.multimodal.Multimodal.WavCodec
      case "avi" => graft.multimodal.Multimodal.AviCodec
      case "mp4" => graft.multimodal.Multimodal.Mp4Codec
      case other => throw new IllegalArgumentException(
        s"unknown codec '$other' (expected 'stub', 'imageio', 'bmp', 'wav', 'avi' or 'mp4')")
    }

  def withDecodedMeta(df: DataFrame, contentCol: String): DataFrame =
    graft.multimodal.Multimodal.withDecodedMeta(df, contentCol)

  /** Codec-selecting overload: 'stub' (oracle-replayable fake headers)
    * or 'imageio' (real pure-JDK PNG/JPEG/WAV decode). */
  def withDecodedMeta(df: DataFrame, contentCol: String, codec: String): DataFrame =
    graft.multimodal.Multimodal.withDecodedMeta(df, contentCol, codecOf(codec))

  def resizeImages(df: DataFrame, contentCol: String, w: Int, h: Int): DataFrame =
    graft.multimodal.Multimodal.resizeImages(df, contentCol, w, h)

  def resizeImages(df: DataFrame, contentCol: String, w: Int, h: Int,
      codec: String): DataFrame =
    graft.multimodal.Multimodal.resizeImages(df, contentCol, w, h, codecOf(codec))

  /** Decimate audio assets by an integer factor ('wav' is the codec
    * that owns samples; others pass audio through). */
  def downsampleAudio(df: DataFrame, contentCol: String, factor: Int,
      codec: String): DataFrame =
    graft.multimodal.Multimodal.downsampleAudio(df, contentCol, factor, codecOf(codec))

  def sampleFrames(df: DataFrame, idCol: String, contentCol: String,
      frameBytes: Int, everyN: Int): DataFrame =
    graft.multimodal.Multimodal.sampleFrames(df, idCol, contentCol, frameBytes, everyN)

  /** Demux every `everyN`-th REAL container frame (codec-determined
    * boundaries — 'avi' is the demuxing codec); non-video payloads
    * emit no rows. */
  def demuxFrames(df: DataFrame, idCol: String, contentCol: String,
      everyN: Int, codec: String): DataFrame =
    graft.multimodal.Multimodal.demuxFrames(df, idCol, contentCol,
      everyN, codecOf(codec))

  def byteHistogram(df: DataFrame, contentCol: String, outCol: String): DataFrame =
    graft.multimodal.Multimodal.byteHistogram(df, contentCol, outCol)

  /** Per-window integer audio energy; non-audio payloads emit no rows. */
  def audioEnergy(df: DataFrame, idCol: String, contentCol: String,
      windowSamples: Int, codec: String): DataFrame =
    graft.multimodal.Multimodal.audioEnergy(df, idCol, contentCol,
      windowSamples, codecOf(codec))

  /** Per-tile integer channel means; non-image payloads emit no rows. */
  def imageTileStats(df: DataFrame, idCol: String, contentCol: String,
      tileW: Int, tileH: Int, codec: String): DataFrame =
    graft.multimodal.Multimodal.imageTileStats(df, idCol, contentCol,
      tileW, tileH, codecOf(codec))

  /** aHash perceptual image hash as two unsigned 32-bit halves;
    * non-image payloads emit no rows. */
  def imageHash(df: DataFrame, idCol: String, contentCol: String,
      side: Int, codec: String): DataFrame =
    graft.multimodal.Multimodal.imageHash(df, idCol, contentCol,
      side, codecOf(codec))

  /** Window-energy envelope fingerprint (first min(n, 62) window bits);
    * non-audio payloads emit no rows. */
  def audioFingerprint(df: DataFrame, idCol: String, contentCol: String,
      windowSamples: Int, codec: String): DataFrame =
    graft.multimodal.Multimodal.audioFingerprint(df, idCol, contentCol,
      windowSamples, codecOf(codec))

  /** Exact dedup on pre-computed key columns (perceptual hashes,
    * fingerprints, normalized tuples); null keys group null-safely. */
  def keyCanon(df: DataFrame, idCol: String, keyColsCsv: String): DataFrame =
    graft.dedup.Dedup.keyCanon(df, idCol,
      keyColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq)

  /** Semantic decontamination: corpus rows near-identical (rounded
    * cosine >= tau) to ANY broadcast benchmark embedding; hit-only. */
  def decontamSemantic(corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchIdCol: String, benchVecCol: String,
      tau: Double): DataFrame =
    graft.dedup.Dedup.decontamSemantic(corpus, idCol, vecCol,
      bench, benchIdCol, benchVecCol, tau)

  /** MAD-based robust outlier flags per group; valueCol must be
    * integral (micro-unit discipline). */
  def robustOutliers(df: DataFrame, groupColsCsv: String, valueCol: String,
      k: Int): DataFrame =
    graft.stats.GroupStats.robustOutliers(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      valueCol, k)

  /** Exponentially-decayed per-key activity sum over the last `steps`
    * events (power-of-two weights, integral values). */
  def decayedSum(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valueCol: String, steps: Int): DataFrame =
    graft.streaming.EventWindows.decayedSum(events, keyCol, tsCol,
      tieCol, valueCol, steps)

  /** Deterministic integer k-means cluster assignments (fixed-point
    * Lloyd, md5-seeded init, bit-identical across partitionings). */
  def intKMeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, scale: Long): DataFrame =
    graft.ml.IntKMeans.assign(df, idCol, vecCol, k, rounds, scale)

  /** Per-label leave-one-out 1-NN agreement (micro-unit accuracy). */
  def knnLabelAccuracy(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame =
    graft.ml.Eval.knnLabelAccuracy(df, idCol, vecCol, labelCol)

  /** Leave-one-out 1-NN label predictions: (idCol, actual, predicted). */
  def knnPredict(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame =
    graft.ml.Eval.knnPredict(df, idCol, vecCol, labelCol)

  /** Exact confusion-matrix counts over an (actual, predicted) frame. */
  def confusion(df: DataFrame, actualCol: String, predCol: String): DataFrame =
    graft.ml.Eval.confusion(df, actualCol, predCol)

  /** Per-class precision/recall/F1 in truncating micro-units. */
  def classificationReport(df: DataFrame, actualCol: String,
      predCol: String): DataFrame =
    graft.ml.Eval.classificationReport(df, actualCol, predCol)

  /** Cohen's kappa (chance-corrected agreement) in micro-units. */
  def cohenKappa(df: DataFrame, actualCol: String,
      predCol: String): DataFrame =
    graft.ml.Eval.cohenKappa(df, actualCol, predCol)

  /** Exact rank-statistic ROC-AUC with average-rank tie handling. */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    graft.ml.Eval.rocAuc(df, labelCol, scoreCol)

  /** Per-group Spearman rank correlation in micro-units. */
  def spearman(df: DataFrame, groupColsCsv: String, xCol: String,
      yCol: String): DataFrame =
    graft.stats.GroupStats.spearman(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      xCol, yCol)

  /** Per-group winsorization into the [pLo, pHi] quantile band. */
  def winsorize(df: DataFrame, groupColsCsv: String, valueCol: String,
      loQ: Int, hiQ: Int, outCol: String): DataFrame =
    graft.stats.GroupStats.winsorize(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      valueCol, loQ, hiQ, outCol)

  /** Incremental novelty: first-seen shingle credit per document. */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    graft.text.TextFunctions.noveltyScores(df, idCol, textCol, n)

  /** Behavioral-corpus export: one chronological event-type line per
    * (key, session). */
  def sessionLines(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, tieCol: String, gap: String): DataFrame =
    graft.streaming.EventWindows.sessionLines(events, keyCol, tsCol,
      typeCol, tieCol, gap)

  /** MMR diversified re-rank over the exact shortlist. */
  def mmrRerank(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, shortlist: Int, lambdaPpm: Long): DataFrame =
    graft.similarity.Similarity.mmrRerank(queries, candidates, idCol,
      vecCol, k, shortlist, lambdaPpm)

  /** Exact global rank without a global sort (histogram base +
    * per-tie-group windows). */
  def globalRank(df: DataFrame, valueCol: String, tieCol: String,
      outCol: String, descending: Boolean): DataFrame =
    graft.stats.GroupStats.globalRank(df, valueCol, tieCol, outCol, descending)

  /** Deterministic (md5-drawn) negative samples per user. */
  def negativeSamples(positives: DataFrame, items: DataFrame,
      userCol: String, itemCol: String, k: Int, oversample: Int): DataFrame =
    graft.curation.Sampling.negativeSamples(positives, items, userCol,
      itemCol, k, oversample)

  /** Per-group Gini coefficient (micro-units, exact rank identity). */
  def gini(df: DataFrame, groupColsCsv: String, valueCol: String,
      tieCol: String): DataFrame =
    graft.stats.GroupStats.gini(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      valueCol, tieCol)

  /** Per-group exact rank + micro percentile feature. */
  def groupPercentRank(df: DataFrame, groupColsCsv: String, valueCol: String,
      tieCol: String, descending: Boolean): DataFrame =
    graft.stats.GroupStats.groupPercentRank(df,
      groupColsCsv.split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      valueCol, tieCol, descending)

  /** Mixture epoch plan: per-source repeat factors for a token budget. */
  def epochPlan(df: DataFrame, sourceCol: String, tokenCol: String,
      weights: DataFrame, weightSourceCol: String, weightCol: String,
      targetTokens: Long): DataFrame =
    graft.curation.Sampling.epochPlan(df, sourceCol, tokenCol,
      weights, weightSourceCol, weightCol, targetTokens)

  // --- streaming-unified ------------------------------------------------

  /** Streaming-or-batch dedup keyed on NORMALIZED text. */
  def firstPerNormalized(df: DataFrame, textCol: String,
      tsCol: String, watermark: String): DataFrame =
    graft.streaming.StreamingDedup.firstPerNormalized(df, textCol, tsCol,
      watermark)

  def firstPerContent(df: DataFrame, textCol: String, tsCol: String): DataFrame =
    graft.streaming.StreamingDedup.firstPerContent(df, textCol, tsCol)

  /** Sliding-window counts/sums per event type (batch/stream unified);
    * width/slide/watermark as Spark interval strings. */
  def slidingWindows(events: DataFrame, width: String, slide: String,
      tsCol: String, typeCol: String, valueCol: String,
      watermark: String): DataFrame =
    graft.streaming.EventWindows.sliding(events, width, slide,
      tsCol, typeCol, valueCol, watermark)

  /** gap/watermark as Spark interval strings, e.g. "12 hours". */
  def eventSessions(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, gap: String, watermark: String): DataFrame =
    graft.streaming.EventWindows.sessions(events, tsCol, keyCol, valueCol, gap, watermark)

  /** Event-time interval join (batch/stream unified); bounds and
    * watermark as Spark interval strings. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTsCol: String, rightTsCol: String,
      upper: String, lower: String, watermark: String): DataFrame =
    graft.streaming.EventWindows.intervalJoin(
      left, right, keyCol, leftTsCol, rightTsCol, upper, lower, watermark)

  // --- graph / hybrid retrieval ----------------------------------------

  /** Fixed-point PageRank: (node, pr_unit) in scale⁻¹ units. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, dampingNum: Long, dampingDen: Long,
      scale: Long): DataFrame =
    graft.graph.PageRank.run(edges, srcCol, dstCol, iterations,
      dampingNum, dampingDen, scale)

  /** Personalized PageRank: teleport mass only to `seeds` rows. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      srcCol: String, dstCol: String, seedCol: String, iterations: Int,
      dampingNum: Long, dampingDen: Long, scale: Long): DataFrame =
    graft.graph.PageRank.personalized(edges, seeds, srcCol, dstCol,
      seedCol, iterations, dampingNum, dampingDen, scale)

  /** Weighted PageRank: contributions proportional to edge weight. */
  def weightedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int, dampingNum: Long,
      dampingDen: Long, scale: Long): DataFrame =
    graft.graph.PageRank.runWeighted(edges, srcCol, dstCol, weightCol,
      iterations, dampingNum, dampingDen, scale)

  /** Per-node triangle counts over an undirected pair list. */
  def triangleCounts(pairs: DataFrame, iCol: String, jCol: String): DataFrame =
    graft.graph.Triangles.perNode(pairs, iCol, jCol)

  /** Local clustering coefficient in unit⁻¹ fixed point. */
  def clusteringCoef(pairs: DataFrame, iCol: String, jCol: String,
      unit: Long): DataFrame =
    graft.graph.Triangles.clusteringCoef(pairs, iCol, jCol, unit)

  /** k-core survivors after `rounds` fixed simultaneous peels. */
  def kCore(pairs: DataFrame, iCol: String, jCol: String, k: Int,
      rounds: Int): DataFrame =
    graft.graph.KCore.kCore(pairs, iCol, jCol, k, rounds)

  /** Bipartite one-mode projection; maxDegree <= 0 disables the cap. */
  def coOccurrence(pairs: DataFrame, leftCol: String, rightCol: String,
      maxDegree: Int): DataFrame =
    graft.graph.Projection.coOccurrence(pairs, leftCol, rightCol,
      if (maxDegree <= 0) None else Some(maxDegree))

  /** Deterministic pseudo-random walks: (walk_id, start, step, node). */
  def graphWalks(edges: DataFrame, srcCol: String, dstCol: String,
      steps: Int, walksPerNode: Int): DataFrame =
    graft.graph.Walks.walks(edges, srcCol, dstCol, steps, walksPerNode)

  /** Walks rendered as step-ordered node-id lines: (walk_id, line). */
  def walkCorpusLines(walks: DataFrame): DataFrame =
    graft.graph.Walks.corpusLines(walks)

  /** Fixed-round label propagation from a seed set: (node, label). */
  def labelPropagate(edges: DataFrame, seeds: DataFrame,
      srcCol: String, dstCol: String, seedNodeCol: String,
      seedLabelCol: String, rounds: Int): DataFrame =
    graft.graph.LabelProp.propagate(edges, seeds, srcCol, dstCol,
      seedNodeCol, seedLabelCol, rounds)

  /** Reciprocal-rank fusion of ranked (qid, id, rank) lists. */
  def rrfFusion(lists: java.util.List[DataFrame], qidCol: String,
      idCol: String, rankCol: String, k: Int, rrfK: Long,
      unit: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    graft.similarity.Fusion.rrf(lists.asScala.toSeq, qidCol, idCol,
      rankCol, k, rrfK, unit)
  }

  /** Near-dup keep policy: best-scoring member per pair-list component;
    * (id, canon_id) for every input row. */
  def clusterCanonBy(docs: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame, iCol: String, jCol: String,
      descending: Boolean): DataFrame =
    Dedup.clusterCanonBy(docs, idCol, scoreCol, pairs, iCol, jCol, descending)
}
