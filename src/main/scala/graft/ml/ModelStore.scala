package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet persistence for every trained-state artifact in the engine —
 * the "train once, score for months" contract a production pipeline
 * needs that in-process model objects cannot provide. One save/load
 * pair per model family:
 *
 *  - IVF coarse-quantizer centroids ([[graft.similarity.Similarity.trainCentroids]])
 *  - PQ codebooks ([[graft.similarity.ProductQuantizer.Codebooks]])
 *  - bigram-LM count tables ([[graft.text.NgramLm.BigramLm]])
 *  - logistic quality-model weights ([[Logistic.Model]])
 *  - unigram-EM tokenizer models + their log-likelihood trajectory
 *    ([[graft.text.Unigram.EmResult]])
 *
 * Design rules, applied uniformly:
 *
 *  - **Parquet is the artifact format** — readable by any engine
 *    (including the DuckDB oracle), schema-carrying, and atomic via the
 *    usual `_SUCCESS`-marker directory commit. No JSON/pickle sidecars;
 *    every hyperparameter that load needs is DERIVED from the data
 *    (PQ's m/ksub/dsub from the row ranges, LM's V from the vocab
 *    count) so an artifact can never disagree with its own metadata.
 *  - **Driver-bounded tables coalesce to one file** (centroids,
 *    codebooks, weights — all ≤ ksub·dim values by construction);
 *    corpus-sized tables (the LM's vocab/bigrams/contexts) keep their
 *    natural partitioning — at 100 TB the bigram table is itself big
 *    data and must not funnel through one task.
 *  - **Round-trip exactness**: doubles pass through parquet bit-for-bit,
 *    so score-with-reloaded-state equals score-with-fresh-state on the
 *    same input — pinned by the `simsearch_ivf_saved` /
 *    `simsearch_pq_saved` / `text_lm_saved` gate rows (hash-compared to
 *    the same oracles as their fresh-state twins) and by
 *    ModelStoreSpec's bit-exact weight comparisons.
 *
 * Reference: vasnake SpatialJoinTransformer persists only its 12 string
 * params (ML Pipeline save/load); it has no trained state to store —
 * this file extends the surface, citing no reference behavior.
 */
object ModelStore {

  /** Save IVF centroids — expects the (cell, vector) frame
    * [[graft.similarity.Similarity.trainCentroids]] returns. nlist rows:
    * single-file artifact. */
  def saveCentroids(centroids: DataFrame, path: String): Unit =
    centroids.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load IVF centroids for [[graft.similarity.Similarity.ivfTopKWith]].
    * Cell order is restored by sorting — parquet row order within a file
    * is stable, but re-sorting makes the contract explicit. */
  def loadCentroids(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).orderBy("cell")

  /** Save PQ codebooks as (j, code, cent) rows — m·ksub rows, one file.
    * dim/m/ksub/dsub are all derivable from the rows, so there is no
    * metadata to desynchronize. */
  def savePq(spark: SparkSession, cb: graft.similarity.ProductQuantizer.Codebooks,
      path: String): Unit = {
    import spark.implicits._
    val rows = for {
      j <- 0 until cb.m
      c <- 0 until cb.ksub
    } yield (j, c, cb.cents(j)(c).toSeq)
    rows.toDF("j", "code", "cent").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load PQ codebooks: m = max(j)+1, ksub = max(code)+1, dsub = |cent|,
    * dim = m·dsub. A sparse artifact (missing (j, code) pair) fails
    * loudly rather than silently zero-filling. */
  def loadPq(spark: SparkSession, path: String): graft.similarity.ProductQuantizer.Codebooks = {
    val rows = spark.read.parquet(path)
      .select(col("j").cast("int"), col("code").cast("int"), col("cent").cast("array<double>"))
      .collect()
    require(rows.nonEmpty, s"empty PQ codebook artifact at $path")
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    val byKey = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
    require(byKey.size == m * ksub,
      s"sparse PQ codebook artifact at $path: ${byKey.size} of ${m * ksub} (j, code) cells")
    val cents = Array.tabulate(m)(j => Array.tabulate(ksub)(c => byKey((j, c))))
    val dim = m * cents.head.head.length
    graft.similarity.ProductQuantizer.Codebooks(dim, m, cents)
  }

  /** Save a trained bigram LM as three parquet tables under `path`
    * (`vocab/`, `bigrams/`, `contexts/`). `vocab` is vocab-bounded and
    * writes as one file; `bigrams`/`contexts` are CORPUS-derived
    * (distinct observed bigrams/contexts grow with the corpus, not the
    * vocab), so they write through an AQE REBALANCE instead — one file
    * at small scale, advisory-sized files at large, and the upstream
    * aggregation keeps its parallelism (a coalesce(1) here collapsed
    * the final count stage AND the write onto a single task — ADVICE
    * r14). */
  def saveBigramLm(lm: graft.text.NgramLm.BigramLm, path: String): Unit = {
    lm.vocab.coalesce(1).write.mode("overwrite").parquet(s"$path/vocab")
    lm.bigrams.hint("rebalance").write.mode("overwrite").parquet(s"$path/bigrams")
    lm.contexts.hint("rebalance").write.mode("overwrite").parquet(s"$path/contexts")
  }

  /** Load a bigram LM. `vocabSizeRow` (V = |vocab| + 1) is recomputed
    * lazily from the reloaded vocab — the one number that COULD have
    * been stored as metadata is derived instead, so it cannot drift. */
  def loadBigramLm(spark: SparkSession, path: String): graft.text.NgramLm.BigramLm = {
    val vocab = spark.read.parquet(s"$path/vocab")
    graft.text.NgramLm.BigramLm(
      vocab,
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"),
      vocab.agg((count(lit(1)) + 1L).as("v")))
  }

  /** Save a BPE merge table ([[graft.text.Bpe.mergesDF]] rows) —
    * `rounds` rows, single-file artifact; rank order restores on load. */
  def saveBpe(spark: SparkSession, merges: Seq[graft.text.Bpe.Merge],
      path: String): Unit =
    graft.text.Bpe.mergesDF(spark, merges)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a BPE merge table for the native serve
    * ([[graft.text.Bpe.segment]]/[[graft.text.Bpe.bpeTokens]]). */
  def loadBpe(spark: SparkSession, path: String): Seq[graft.text.Bpe.Merge] =
    graft.text.Bpe.mergesFrom(spark.read.parquet(path))

  /** Export a trained merge table in the GPT-2/HuggingFace merges.txt
    * layout — a `#version: 0.2` header, then one "left right" pair per
    * line in rank order — the TEXT artifact external tokenizer stacks
    * (e.g. `tokenizers`' BPE loaders) read directly, where
    * [[saveBpe]]'s parquet is the in-house form. Counts do not travel
    * (the format has no field for them; serving only needs pair
    * ranks). Tokens containing a space or newline cannot round-trip
    * through the line format and are rejected loudly. Model-sized:
    * written driver-side through `path`'s Hadoop filesystem
    * (local/HDFS/object stores alike). */
  def exportBpeMerges(spark: SparkSession, merges: Seq[graft.text.Bpe.Merge],
      path: String): Unit = {
    val ordered = merges.sortBy(_.rank)
    ordered.foreach { m =>
      require(!m.left.exists(c => c == ' ' || c == '\n' || c == '\r')
          && !m.right.exists(c => c == ' ' || c == '\n' || c == '\r'),
        s"merge rank ${m.rank} contains a space/newline — not representable in merges.txt")
    }
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(fs.create(p, true), "UTF-8"))
    try {
      w.write("#version: 0.2\n")
      ordered.foreach(m => w.write(m.left + " " + m.right + "\n"))
    } finally w.close()
  }

  /** Import a merges.txt artifact for the native serve: rank = line
    * order, 1-based like [[graft.text.Bpe.train]]'s (comment/blank
    * lines skipped), count = 0 (informational only —
    * [[graft.text.Bpe.runtime]] consumes pair ORDER alone, so an
    * imported table serves identically to the fresh one). */
  def importBpeMerges(spark: SparkSession, path: String): Seq[graft.text.Bpe.Merge] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p), "UTF-8"))
    try {
      val lines = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filterNot(l => l.isEmpty || l.startsWith("#")).toVector
      lines.zipWithIndex.map { case (l, i) =>
        val cut = l.indexOf(' ')
        require(cut > 0 && cut < l.length - 1 && l.indexOf(' ', cut + 1) < 0,
          s"merges.txt line ${i + 1} is not a single 'left right' pair: '$l'")
        graft.text.Bpe.Merge(i + 1, l.substring(0, cut), l.substring(cut + 1), 0L)
      }
    } finally in.close()
  }

  /** Save a MinHash corpus index
    * ([[graft.dedup.Dedup.buildMinhashIndex]]'s (doc, sh, sig) rows) —
    * corpus-sized, natural partitioning kept (the bigram-LM rule: the
    * artifact is itself big data). Both index parameters are derivable
    * from the rows; nothing else to store. */
  def saveMinhashIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  /** Load a MinHash corpus index for
    * [[graft.dedup.Dedup.minhashPairsVsIndex]]. */
  def loadMinhashIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Steady-state saved-index maintenance: derive the index parameters
    * from the saved head row, build index rows for `delta` ONLY, and
    * parquet-APPEND them at `path` — compute and I/O ∝ delta; the
    * corpus's existing files are never rewritten, re-read (beyond one
    * row), or re-hashed. A daily batch against a year-long index pays
    * for the day. Pair with periodic
    * [[graft.dedup.Dedup.compactMinhashIndex]] + [[saveMinhashIndex]]
    * to collapse unchanged re-ingests (that pass is ∝ corpus, run on a
    * maintenance cadence — the same amortization contract as
    * [[graft.layout.Compact]]). */
  def appendMinhashIndex(spark: SparkSession, path: String,
      delta: DataFrame, idCol: String, textCol: String): Unit =
    graft.dedup.Dedup.deltaIndexRows(loadMinhashIndex(spark, path),
        delta, idCol, textCol)
      .write.mode("append").parquet(path)

  /** Save int8 scalar-quantization params as (pos, lo, scale) rows —
    * dim rows, one file; dimension derives from the rows. */
  def saveInt8(spark: SparkSession,
      p: graft.similarity.ScalarQuantizer.Int8Params, path: String): Unit =
    graft.similarity.ScalarQuantizer.paramsDF(spark, p)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load int8 params for [[graft.similarity.ScalarQuantizer.topK]];
    * gaps/duplicates fail loudly. */
  def loadInt8(spark: SparkSession, path: String): graft.similarity.ScalarQuantizer.Int8Params =
    graft.similarity.ScalarQuantizer.paramsFrom(spark.read.parquet(path))

  /** Save binary (1-bit) quantization thresholds as a (pos, thr)
    * parquet frame — dim-sized, one file. */
  def saveBinary(spark: SparkSession,
      p: graft.similarity.BinaryQuantizer.BinaryParams, path: String): Unit =
    graft.similarity.BinaryQuantizer.paramsDF(spark, p)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Load binary params for [[graft.similarity.BinaryQuantizer.topK]];
    * gaps/duplicates fail loudly. */
  def loadBinary(spark: SparkSession, path: String): graft.similarity.BinaryQuantizer.BinaryParams =
    graft.similarity.BinaryQuantizer.paramsFrom(spark.read.parquet(path))

  /** Save a logistic model as (kind, idx, value) rows: kind `w` idx i =
    * weight i, kind `b` = bias, kind `loss` idx i = iteration-i mean
    * log-loss (the training trajectory travels with the artifact). */
  def saveLogistic(spark: SparkSession, model: Logistic.Model, path: String): Unit = {
    import spark.implicits._
    val rows =
      model.weights.toSeq.zipWithIndex.map { case (w, i) => ("w", i, w) } ++
        Seq(("b", 0, model.bias)) ++
        model.losses.toSeq.zipWithIndex.map { case (l, i) => ("loss", i, l) }
    rows.toDF("kind", "idx", "value").coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a logistic model — weights/bias/losses reassembled by kind and
    * index; doubles round-trip parquet bit-for-bit, so
    * `loaded.logitCol` is the SAME expression as the fresh model's. */
  def loadLogistic(spark: SparkSession, path: String): Logistic.Model = {
    val rows = spark.read.parquet(path)
      .select(col("kind"), col("idx").cast("int"), col("value").cast("double"))
      .collect()
    def series(kind: String): Array[Double] = {
      val xs = rows.filter(_.getString(0) == kind).map(r => r.getInt(1) -> r.getDouble(2))
      require(xs.map(_._1).sorted.toSeq == xs.indices.toSeq,
        s"non-contiguous '$kind' indices in logistic artifact at $path")
      xs.sortBy(_._1).map(_._2)
    }
    val bias = series("b")
    require(bias.length == 1, s"expected one bias row at $path, got ${bias.length}")
    Logistic.Model(series("w"), bias.head, series("loss"))
  }

  /** Save a unigram EM run as (kind, idx, piece, value) rows — the
    * [[saveLogistic]] discipline applied to the tokenizer: kind
    * `piece` idx i = the i-th piece (sorted) with its micro-nat
    * log-prob, kind `meta` = max_piece_len / unk_micro, kind `ll`
    * idx t = the corpus log-likelihood trajectory entry t (seed score
    * first — the training history travels WITH the artifact, so a
    * deployed tokenizer carries the evidence of its own convergence).
    * All values are micro-nat/int LONGS: the artifact round-trips
    * bit-for-bit. */
  def saveUnigram(spark: SparkSession, r: graft.text.Unigram.EmResult,
      path: String): Unit = {
    import spark.implicits._
    val m = r.model
    val rows =
      m.pieces.toSeq.sortBy(_._1).zipWithIndex
        .map { case ((p, lp), i) => ("piece", i, p, lp) } ++
      Seq(("meta", 0, "max_piece_len", m.maxPieceLen.toLong),
          ("meta", 1, "unk_micro", m.unkMicro)) ++
      r.llMicro.toSeq.zipWithIndex.map { case (ll, t) => ("ll", t, "", ll) }
    rows.toDF("kind", "idx", "piece", "value")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a unigram EM artifact — model and trajectory reassembled by
    * kind; contiguity and meta completeness fail loudly. */
  def loadUnigram(spark: SparkSession, path: String): graft.text.Unigram.EmResult = {
    val rows = spark.read.parquet(path)
      .select(col("kind"), col("idx").cast("int"), col("piece"),
        col("value").cast("long"))
      .collect()
    def byKind(kind: String) = {
      val xs = rows.filter(_.getString(0) == kind)
      require(xs.map(_.getInt(1)).sorted.toSeq == xs.indices.toSeq,
        s"non-contiguous '$kind' indices in unigram artifact at $path")
      xs.sortBy(_.getInt(1))
    }
    val meta = byKind("meta").map(r => r.getString(2) -> r.getLong(3)).toMap
    require(meta.contains("max_piece_len") && meta.contains("unk_micro"),
      s"incomplete meta rows in unigram artifact at $path")
    graft.text.Unigram.EmResult(
      graft.text.Unigram.Model(
        byKind("piece").map(r => r.getString(2) -> r.getLong(3)).toMap,
        meta("max_piece_len").toInt, meta("unk_micro")),
      byKind("ll").map(_.getLong(3)))
  }
}
