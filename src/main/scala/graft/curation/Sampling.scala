package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopKSet

/**
 * Deterministic corpus sampling for training-data mixing: quota
 * (stratified top-k) selection and content-hash rate sampling. Both are
 * reproducible bit-for-bit across runs and engines — a training corpus
 * must be re-buildable, so nothing here uses `rand()`.
 */
object Sampling {

  /**
   * Quota sampling: the k best rows per stratum (source, language,
   * domain…) by a numeric score, ties broken by ascending id — "take the
   * 10k highest-quality documents per domain" of every data-mixing
   * recipe. Output: stratum columns + (rank 1..k, id, score) with rank
   * assigned in selection order.
   *
   * Shape: ONE aggregation on the stratum key with
   * [[graft.functions.BoundedTopKSet]] holding at most k elements per
   * group at every stage — partial (map-side) buffers truncate to k
   * before the shuffle, so shuffle volume is O(strata · k) regardless of
   * stratum size. The window-function equivalent
   * (`row_number().over(partitionBy(stratum))`) ships EVERY row of a
   * stratum to one task and sorts it there — a 100 TB corpus with a
   * dominant domain straggles exactly like the pre-round-4 hot-digest
   * dedup; this shape cannot.
   *
   * Ordering contract: `descending` (default) selects the LARGEST
   * scores, implemented by negating the score inside the ordering struct
   * (the aggregate keeps minima), so the score must be numeric. Rows
   * whose score or id is NULL are excluded up front — struct ordering
   * would otherwise rank them and engines disagree on null order.
   */
  def quotaTopK(
      df: DataFrame, stratumCols: Seq[String], scoreCol: String, idCol: String,
      k: Int, descending: Boolean = true): DataFrame = {
    require(stratumCols.nonEmpty, "at least one stratum column required")
    require(k >= 1, s"k must be >= 1, got $k")
    val orderScore = if (descending) negate(col(scoreCol)) else col(scoreCol)
    val elem = struct(orderScore.as("s"), col(idCol).as("id"), col(scoreCol).as("score"))
    val strata = stratumCols.map(col)
    df.where(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(strata: _*)
      .agg(BoundedTopKSet.topKSet(elem, k).as("__top"))
      .select(strata :+ posexplode(col("__top")): _*)
      .select(strata ++ Seq((col("pos") + 1).as("rank"),
        col("col.id").as(idCol), col("col.score").as(scoreCol)): _*)
  }

  /**
   * Deterministic hash-rate sampling: keep a row iff the first 4 hex
   * chars of `md5(key)` sort strictly below the stratum's threshold —
   * keep-rate = parseInt(threshold,16)/65536, granularity 1/65536 ≈
   * 0.0015%. The standard way to mix domains at fixed rates ("keep 10%
   * of CommonCrawl, 100% of books") such that every re-run, every
   * engine, and every incremental batch selects the SAME rows: the
   * decision is a pure function of row content, no RNG, no state.
   *
   * The threshold stays a STRING compared lexicographically (md5 hex is
   * fixed-width lower-case, so lexicographic == numeric) — no
   * hex-to-int conversion whose width/signedness an oracle engine could
   * disagree on. Strata missing from `thresholds` are dropped (rate 0);
   * map-only, codegen'd, zero shuffle.
   */
  def hashSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      thresholds: Map[String, String]): DataFrame = {
    require(thresholds.nonEmpty, "at least one stratum threshold required")
    require(thresholds.values.forall(_.matches("[0-9a-f]{4}")),
      s"thresholds must be 4 lower-case hex chars, got ${thresholds.values.mkString(",")}")
    val thr: Column = thresholds.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, t)) => when(col(stratumCol) === stratum, lit(t)).otherwise(acc)
    }
    df.where(substring(md5(col(keyCol).cast("binary")), 1, 4) < thr)
  }

  /**
   * Mixture sampling: downsample strata so the OUTPUT composition matches
   * target weights — "make the training mix 60% web, 30% code, 10%
   * books" — keeping as much data as possible (the binding stratum, the
   * one whose target share exceeds its supply the most, keeps 100%; every
   * other stratum downsamples to proportion). No stratum is ever
   * UPsampled, rows are kept/dropped by the same content-hash rule as
   * [[hashSample]] (pure function of row content — reproducible across
   * runs, engines, and incremental batches), and strata absent from
   * `weights` are dropped.
   *
   * Derivation (all IEEE doubles in a FIXED operation order, so an
   * external SQL oracle replays the thresholds bit-for-bit):
   * with `c_s` the stratum's row count, `w_s` its weight, and
   * `W = Σ w` (key-sorted summation):
   *   ratio_s = (c_s · W) / w_s        — the total the mix could reach
   *                                      if s were the binding stratum
   *   T*      = min_s ratio_s          — the feasible mix total
   *   rate_s  = (T* · w_s) / (W · c_s) — per-stratum keep rate (= 1 for
   *                                      the binding stratum)
   *   keep    = h < floor(rate_s · 65536) over the 16-bit md5(key) prefix
   * (rate granularity 1/65536, like [[hashSample]]; floor(65536) means
   * keep-all, bypassing the prefix test).
   *
   * Scale shape: ONE map-side-combined count aggregation collects one row
   * per stratum (strata-sized, never data rows) to derive the thresholds
   * on the driver; the kept-row filter is then map-only with the
   * thresholds as literals — zero shuffle of data. NOTE: the counting
   * aggregation runs EAGERLY at call time (same contract as
   * `TextFunctions.packSequences`).
   */
  def mixtureSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "at least one stratum weight required")
    require(weights.values.forall(w => w > 0 && !w.isInfinite),
      s"weights must be positive finite, got ${weights.values.mkString(",")}")
    val sumW = weights.toSeq.sortBy(_._1).map(_._2).sum
    val counts = df
      .where(col(stratumCol).isInCollection(weights.keys.toSeq))
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .toMap
    if (counts.isEmpty) return df.limit(0)
    val tStar = counts.toSeq.map { case (s, c) => (c * sumW) / weights(s) }.min
    val thresholds = counts.map { case (s, c) =>
      s -> math.floor(((tStar * weights(s)) / (sumW * c)) * 65536.0).toLong
    }
    val thr: Column = thresholds.foldLeft(lit(null).cast("long")) {
      case (acc, (stratum, h)) => when(col(stratumCol) === stratum, lit(h)).otherwise(acc)
    }
    // explicit null guard: format_string renders a null arg as the text
    // "null" instead of propagating, and any hex prefix sorts below it —
    // without the guard every UNLISTED stratum would be kept
    df.where(thr.isNotNull && (thr >= lit(65536L) ||
      substring(md5(col(keyCol).cast("binary")), 1, 4) < format_string("%04x", thr)))
  }

  /**
   * Deterministic dataset splitting: assign every row a split label
   * (train / validation / test / …) from the 16-bit md5(key) prefix —
   * the reproducible alternative to `randomSplit`, whose assignment
   * depends on partitioning and seed plumbing. A row's split is a pure
   * function of its content: re-runs, other engines, and INCREMENTAL
   * batches agree, and near-identical pipelines never leak a row across
   * the train/test boundary by reshuffling.
   *
   * `splits` are ordered (label, weight) pairs; weights normalize to 1
   * and map to cumulative 16-bit boundaries (`round(65536·cum)`,
   * granularity 1/65536 like [[hashSample]]); the LAST split absorbs
   * the rounding remainder. Boundaries compare as 4-hex STRINGS
   * (lexicographic == numeric on fixed-width lower-case hex — the
   * [[hashSample]] oracle contract). Map-only, codegen'd, zero shuffle,
   * no RNG.
   *
   * NULL KEYS land in the LAST split, explicitly: a splitter must give
   * every row a label (partition semantics — unlike [[hashSample]],
   * which is a filter and drops null keys), and the last split is where
   * an external `CASE ... ELSE` replay puts them too. This means
   * null-content rows CONCENTRATE in the last label — if that label is
   * your test set and nulls are frequent, filter or impute keys before
   * splitting.
   */
  def splitByHash(
      df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.map(_._1).distinct.size == splits.size,
      "split labels must be distinct")
    require(splits.forall { case (_, w) => w > 0 && !w.isInfinite },
      s"weights must be positive finite, got ${splits.map(_._2).mkString(",")}")
    require(!df.columns.contains(outCol),
      s"output column `$outCol` already exists on the input")
    val bounds = splitBoundsHex(splits)
    val prefix = substring(md5(col(keyCol).cast("binary")), 1, 4)
    val label = bounds.zip(splits.init).foldRight(
      lit(splits.last._1): Column) { case ((b, (l, _)), acc) =>
      when(prefix < lit(b), lit(l)).otherwise(acc)
    }
    // null key -> null prefix -> every `prefix < bound` is null -> the
    // fold's final otherwise. Spelled out as its own branch so the
    // scaladoc'd null contract is visible in the plan, not an accident
    // of three-valued logic
    df.withColumn(outCol,
      when(col(keyCol).isNull, lit(splits.last._1)).otherwise(label))
  }

  /**
   * Leakage-safe (group-aware) train/test split — the eval-
   * contamination guard: a plain [[splitByHash]] on document ids sends
   * a near-duplicate pair to OPPOSITE sides with probability
   * 2·p·(1−p), so "held-out" test documents have near-copies in train
   * and eval scores inflate. Here every connected component of the
   * near-dup `pairs` graph (from any pair operator in
   * [[graft.dedup.Dedup]] — exact, MinHash, SimHash, Jaccard,
   * embedding) moves as ONE unit: components come from
   * [[graft.dedup.Dedup.clusterPairs]] (min-id canonical labels),
   * documents in no pair are their own singleton group, and the split
   * label hashes the GROUP representative id — stringified, so the
   * md5 bytes replay identically in an external engine — never the
   * document id. [[splitByHash]]'s boundary and null contracts apply
   * unchanged (a null id has a null group and lands in the LAST split).
   *
   * Scale shape: the component labels cost what the pair graph costs
   * (near-clique components converge in 2-3 pointer-jumping rounds —
   * the [[graft.dedup.Dedup.clusterPairs]] scaladoc); the label
   * join-back is one hash join on the id (labels ≤ paired docs,
   * usually a small fraction of the corpus — AQE broadcasts it when it
   * fits); the split itself is map-only. Nothing is quadratic in
   * corpus size.
   */
  def groupSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      splits: Seq[(String, Double)], outCol: String = "split",
      iCol: String = "doc_i", jCol: String = "doc_j"): DataFrame = {
    require(!df.columns.contains("__group"),
      "reserved name `__group` already exists on the input")
    require(!df.columns.contains(outCol),
      s"output column `$outCol` already exists on the input")
    val comp = graft.dedup.Dedup.clusterPairs(pairs, iCol, jCol)
      .select(col("doc_id").as("__gid"), col("cluster_id").as("__comp"))
    val withGroup = df.join(comp, df(idCol) === col("__gid"), "left")
      .withColumn("__group", coalesce(col("__comp"), df(idCol)).cast("string"))
      .drop("__gid", "__comp")
    splitByHash(withGroup, "__group", splits, outCol).drop("__group")
  }

  /** The cumulative 16-bit split boundaries of [[splitByHash]] as 4-hex
    * strings (one per split but the last) — public so an external
    * oracle derives the SAME literals from the same weights instead of
    * hardcoding values that could drift. */
  def splitBoundsHex(splits: Seq[(String, Double)]): Seq[String] = {
    val total = splits.map(_._2).sum
    splits.init.scanLeft(0.0) { case (acc, (_, w)) => acc + w }
      .tail.map(c => f"${math.round(65536.0 * (c / total)).min(65535L)}%04x")
  }

  /**
   * Temperature sampling — target stratum shares ∝ count^alpha (the
   * multilingual/multi-domain rebalance: alpha = 0.5 is the classic
   * "square-root sampling" that lifts small languages without drowning
   * large ones; alpha = 1 keeps natural proportions). The weights feed
   * the [[mixtureSample]] solve: the binding stratum (smallest
   * count/weight ratio) keeps 100%, everything larger downsamples via
   * the md5-prefix threshold filter — map-only, no RNG, reproducible.
   *
   * Replayability: alpha = 0.5 computes weights with `sqrt`, which IEEE
   * requires CORRECTLY rounded — an external engine derives identical
   * weights, thresholds and rows. Other alphas go through `math.pow`,
   * which engines only round to within 1 ulp; thresholds have 1/65536
   * granularity so a last-ulp disagreement flips a row only when a
   * scaled rate lands exactly on a grid boundary — possible, so only
   * the sqrt path is oracle-gated.
   *
   * Strata counting runs EAGERLY at call time (strata-sized collect,
   * the [[mixtureSample]] contract); null strata drop.
   */
  def temperatureSample(
      df: DataFrame, keyCol: String, stratumCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .toMap
    if (counts.isEmpty) return df.limit(0)
    val weights = counts.map { case (s, c) =>
      s -> (if (alpha == 0.5) math.sqrt(c) else math.pow(c, alpha))
    }
    // fixed IEEE operation order (stratum-sorted left fold) — the
    // mixtureSample discipline, replayed by an ordered list_reduce
    val sumW = weights.toSeq.sortBy(_._1).map(_._2).sum
    val tStar = counts.toSeq.map { case (s, c) => (c * sumW) / weights(s) }.min
    val thresholds = counts.map { case (s, c) =>
      s -> math.floor(((tStar * weights(s)) / (sumW * c)) * 65536.0).toLong
    }
    val thr: Column = thresholds.foldLeft(lit(null).cast("long")) {
      case (acc, (stratum, h)) => when(col(stratumCol) === stratum, lit(h)).otherwise(acc)
    }
    df.where(thr.isNotNull && (thr >= lit(65536L) ||
      substring(md5(col(keyCol).cast("binary")), 1, 4) < format_string("%04x", thr)))
  }

  /**
   * DSIR-style importance weights (hashed n-gram importance resampling):
   * score every raw-corpus document by how much more likely its hashed
   * n-gram features are under the TARGET distribution than under the raw
   * one — the data-selection step that picks "looks like the target
   * domain" pretraining data out of a web crawl. Output: one row per
   * raw document with at least one feature —
   * `(doc, n_feats, logratio_micro)` where `logratio_micro` is the
   * integer micro-nat sum over the document's gram OCCURRENCES of
   * `ln((cT_b + 1) · (totR + B) / ((totT + B) · (cR_b + 1)))` — the
   * add-one-smoothed bucket log-likelihood ratio. Select by filtering /
   * [[quotaTopK]]-ing on the score downstream.
   *
   * Buckets: `md5_number_lower(gram) mod B` via the codegen'd
   * [[graft.functions.Md5Lower64]]; B must be a POWER OF TWO so the
   * signed `pmod` equals the unsigned mod an external engine computes.
   * Micro-nat rounding of ONE ln per bucket makes the distributed sum
   * order-free and engine-reproducible (the [[graft.text.NgramLm]]
   * contract).
   *
   * Shape (100 TB): two map-side-combined bucket-count aggregations
   * (target grams, raw grams — each collapses to <= B rows before any
   * join), a B-row broadcast score table, then raw gram rows join the
   * broadcast MAP-SIDE and collapse per doc — the only corpus-sized
   * shuffle carries (doc, partial sums), never grams. No driver-side
   * state beyond the broadcast (totals ride 1-row crossJoins).
   */
  def importanceWeights(
      raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096, ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct.size == ns.size,
      s"gram sizes must be distinct positive ints, got ${ns.mkString(",")}")
    import graft.functions.{Md5Lower64, WordShingles}
    val B = buckets.toLong
    def grams(t: Column): Column = {
      val gs = ns.map(n => WordShingles.wordGrams(t, n))
      val cat = if (gs.size == 1) gs.head else concat(gs: _*)
      // null text → no features (concat propagates null; explode drops)
      cat
    }
    def bucket(g: Column): Column = pmod(Md5Lower64.md5Lower64(g), lit(B))
    val tgtG = target.select(explode(grams(col(targetTextCol))).as("__g"))
      .select(bucket(col("__g")).as("__b"))
    val rawG = raw.select(col(idCol).as("doc"),
        explode(grams(col(textCol))).as("__g"))
      .select(col("doc"), bucket(col("__g")).as("__b"))
    val tgtC = tgtG.groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
    val rawC = rawG.groupBy(col("__b")).agg(count(lit(1)).as("__cr"))
    val totT = tgtC.agg(coalesce(sum(col("__ct")), lit(0L)).as("__totT"))
    val totR = rawC.agg(coalesce(sum(col("__cr")), lit(0L)).as("__totR"))
    val table = rawC
      .join(tgtC, Seq("__b"), "left")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totR))
      .select(col("__b"),
        // one ln of a products-of-exact-integers ratio, micro-nat LONG
        round(log(((coalesce(col("__ct"), lit(0L)) + 1L) * (col("__totR") + B)).cast("double")
          / (((col("__totT") + B) * (col("__cr") + 1L)).cast("double"))) * 1e6)
          .cast("long").as("__mlog"))
    rawG.join(broadcast(table), Seq("__b"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).cast("long").as("n_feats"),
        sum(col("__mlog")).cast("long").as("logratio_micro"))
  }

  /**
   * Deterministic negative sampling — the contrastive/recommendation
   * training-pair generator: for every user in `positives`, up to `k`
   * items drawn pseudo-uniformly from the catalog that the user has NO
   * positive interaction with. No RNG anywhere (the
   * [[graft.graph.Walks]] convention lifted to sampling): draw j for a
   * user is `idx = (h32 · N) div 2³²` with
   * `h32 = md5_lower64(user ∥ ':' ∥ j) pmod 2³²` — a pure function of
   * (user, j), so re-runs, engines, and incremental batches draw THE
   * SAME negatives, and the scaled division (not a modulus) keeps the
   * map into [0, N) bias-free and engine-exact (N < 2³¹ keeps the
   * product in a long — enforced).
   *
   * Items map to draw indices through [[graft.stats.GroupStats
   * .globalRank]] on the md5 of the item id — a deterministic
   * pseudo-random permutation of the catalog computed WITHOUT a global
   * sort. Draws that hit a positive are discarded and the earliest
   * `k` surviving draws win (duplicate items keep their earliest draw),
   * so a user with many positives may receive fewer than k — raise
   * `oversample` rather than looping (documented contract; expected
   * shortfall is (positives/N)^oversample·k per user).
   *
   * Scale shape: users × k·oversample slim draw rows, one equi-join
   * against the ranked catalog, one anti-join against positives, one
   * bounded [[quotaTopK]] cut — nothing pairwise, nothing
   * data-sized-windowed. Output: (userCol, neg_rank 1.., itemCol).
   */
  def negativeSamples(positives: DataFrame, items: DataFrame,
      userCol: String, itemCol: String, k: Int,
      oversample: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(oversample >= 1, s"oversample must be >= 1, got $oversample")
    val catalog = items.select(col(itemCol)).where(col(itemCol).isNotNull)
      .distinct()
    val n = catalog.count()
    require(n >= 1, "item catalog is empty")
    require(n < (1L << 31),
      s"catalog size $n >= 2^31 would overflow the draw product — " +
        "shard the catalog")
    // md5 over the item id's STRING rendering (cast to string first —
    // a raw long-to-binary cast would hash big-endian bytes no external
    // engine's md5(VARCHAR) reproduces)
    val ranked = graft.stats.GroupStats.globalRank(
      catalog.select(
        md5(col(itemCol).cast("string").cast("binary")).as("__h"),
        col(itemCol)),
      "__h", itemCol, "__r")
      .select(col("__r"), col(itemCol))
    val draws = positives.select(col(userCol)).where(col(userCol).isNotNull)
      .distinct()
      .select(col(userCol),
        explode(sequence(lit(0), lit(k * oversample - 1))).as("__j"))
      .withColumn("__h32", pmod(graft.functions.Md5Lower64.md5Lower64(
        concat(col(userCol).cast("string"), lit(":"),
          col("__j").cast("string"))), lit(4294967296L)))
      .withColumn("__r", expr(s"(__h32 * ${n}L) div 4294967296L"))
      .drop("__h32")
    val neg = draws.join(ranked, "__r")
      .join(positives.select(col(userCol), col(itemCol)).distinct(),
        Seq(userCol, itemCol), "left_anti")
      .groupBy(col(userCol), col(itemCol)).agg(min(col("__j")).as("__j"))
    quotaTopK(neg, Seq(userCol), "__j", itemCol, k, descending = false)
      .select(col(userCol), col("rank").cast("long").as("neg_rank"),
        col(itemCol))
  }

  /**
   * Mixture epoch planning — the run-config artifact an LLM training
   * launch actually consumes: given the tokens each source HAS and the
   * mixture weight each source SHOULD contribute, how many epochs
   * (repeat factor) of each source fill a `targetTokens` budget?
   * target_s = (targetTokens · w_s) div Σw, epochs_micro =
   * (target_s · 1e6) div tokens_s — a source short on data gets
   * epochs > 1e6 (up-sampled / repeated), an over-represented one
   * < 1e6 (down-sampled). All truncating integer arithmetic on
   * non-negative longs; a source present in `weights` but absent from
   * the corpus (or with zero tokens) gets NULL epochs — it cannot be
   * up-sampled from nothing, and the plan makes that loud rather than
   * inventing a zero. Sources in the corpus but not in `weights` get
   * weight 0 (target 0, epochs 0) — explicitly excluded, still listed.
   *
   * Scale shape: ONE map-side-combined per-source token sum over the
   * corpus; `weights` is a mixture config (tens of rows) joined
   * broadcast-outer both ways; output is source-count-sized.
   *
   * Output: (source, tokens_have, weight_ppm, target_tokens,
   * epochs_micro).
   *
   * @param weights (source, weight) rows — any non-negative integer
   *                scale (ppm, percent, raw); only ratios matter.
   */
  def epochPlan(df: DataFrame, sourceCol: String, tokenCol: String,
      weights: DataFrame, weightSourceCol: String, weightCol: String,
      targetTokens: Long): DataFrame = {
    require(targetTokens >= 0, s"targetTokens must be >= 0, got $targetTokens")
    require(targetTokens <= Long.MaxValue / 1000000L,
      s"targetTokens $targetTokens * 1e6 would overflow long — plan in " +
        "thousand-token units (the ratios are scale-free)")
    val have = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol).cast("long")).as("tokens_have"))
    // exact-arithmetic bound: targetTokens·w and w·1e6 must both fit a
    // long (the cohenKappa fail-loudly convention — never wrap)
    val wBound = math.min(
      if (targetTokens > 0) Long.MaxValue / targetTokens else Long.MaxValue,
      Long.MaxValue / 1000000L)
    val w = weights.select(col(weightSourceCol).as("source"),
      when(col(weightCol).isNull || col(weightCol) < 0 ||
          col(weightCol) > wBound,
        raise_error(concat(lit("Sampling.epochPlan: weight for source "),
          coalesce(col(weightSourceCol).cast("string"), lit("NULL")),
          lit(s" must be in [0, $wBound] (non-null; larger would " +
            "overflow the exact plan arithmetic)"))))
        .otherwise(col(weightCol).cast("long")).as("__w"))
    // loud zero-total: a silent Σw = 0 would NULL every ratio (the
    // personalized-PageRank empty-seed convention)
    val wtot = w.agg(coalesce(sum(col("__w")), lit(0L)).as("__w0"))
      .select(when(col("__w0") === 0L, raise_error(lit(
          "Sampling.epochPlan: mixture weights sum to zero — at least " +
            "one source needs a positive weight")))
        .otherwise(col("__w0")).as("__wtot"))
    have.join(w, Seq("source"), "full_outer")
      .crossJoin(broadcast(wtot))
      .select(col("source"),
        coalesce(col("tokens_have"), lit(0L)).as("tokens_have"),
        expr("(coalesce(__w, 0L) * 1000000L) div __wtot").as("weight_ppm"),
        expr(s"(${targetTokens}L * coalesce(__w, 0L)) div __wtot")
          .as("target_tokens"))
      .select(col("source"), col("tokens_have"), col("weight_ppm"),
        col("target_tokens"),
        when(col("tokens_have") > 0,
          expr("(target_tokens * 1000000L) div tokens_have"))
          .as("epochs_micro"))
  }
}
