package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`):
 *
 *  - [[cosineTopK]]: exact brute-force cosine top-k — the baseline;
 *  - [[lshCosineTopK]]: random-hyperplane (SimHash) LSH-bucketed
 *    approximate top-k — the scale path: candidates come only from
 *    colliding buckets, turning the O(Q·N) cross product into a bucket
 *    join that is near-linear in N for clustered data.
 *
 * All math is `zip_with`/`aggregate` over doubles (a sequential left
 * fold — deterministic summation order), no UDFs. The query side is
 * broadcast; the candidate side streams — no shuffle of the big side in
 * the brute-force path, one hash-partition shuffle in the LSH path.
 */
object Similarity {

  /** Sequential-fold dot product of two double arrays — codegen'd native
    * expression (same summation order as the composed aggregate/zip_with
    * form, ~20x cheaper; see graft.functions.VectorDot). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorDot.vectorDot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to `scale` decimals for cross-engine
    * comparability (summation-order noise lives below 1e-12). */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    round(dot(a, b) / (l2norm(a) * l2norm(b)), scale)

  /** Shared tail of every top-k variant: exact rounded cosine from
    * pre-hoisted norms, then rank-per-query with the SAME ordering and
    * tie-break everywhere — the approximate variants' "equal to exact,
    * rank for rank" oracles depend on the three paths never diverging
    * here. Input columns: qid, cid, qv, cv, qn, cn. */
  private[similarity] def scoreAndRank(pairs: DataFrame, k: Int): DataFrame =
    rank(pairs
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos_r6")), k)

  /** Rank (qid, cid, cos_r6) rows per query: descending cosine, ties by
    * ascending candidate id, keep the top k.
    *
    * Shape: ONE aggregation with the bounded top-k aggregate
    * ([[graft.curation.Sampling.quotaTopK]] /
    * [[graft.functions.BoundedTopKSet]]) — partial buffers truncate to
    * k map-side, so the exchange ships ~Q·k partials instead of every
    * (qid, cid, score) row. The window formulation
    * (`row_number().over(partitionBy("qid"))`) shuffles all Q·N slim
    * rows — at 10^9 candidates that exchange IS the query cost; this
    * shape's exchange stays Q·k whatever N is. Ordering contract unchanged
    * (score desc, cid asc; the struct order `(-score, cid)` is the same
    * total order). Rows with a NULL score or id are excluded — the
    * window ranked them last, below any real score, so no top-k a
    * caller can request would ever include one. */
  private[similarity] def rank(scored: DataFrame, k: Int): DataFrame =
    graft.curation.Sampling.quotaTopK(scored, Seq("qid"), "cos_r6", "cid", k)
      .select(col("qid"), col("cid"), col("cos_r6"),
        col("rank").cast("long").as("rnk"))

  /**
   * Exact brute-force top-k: for every query row, the k nearest candidate
   * rows by cosine (descending), ties broken by candidate id ascending.
   * Output: (query id, candidate id, cos_r6, rank 1..k). Self-pairs
   * (same id) are excluded.
   *
   * The query side is `broadcast()` — candidates never shuffle; the
   * per-query cut is the bounded top-k aggregate, so the ranking
   * exchange ships ~Q·k partials (no term proportional to N). The Q·N
   * dot products remain — that is brute force's defining cost; the
   * LSH/IVF/PQ variants are the paths that cut the scan itself.
   */
  def cosineTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    // norms materialize per side BEFORE the join — computing them inside
    // the pair expression would redo a full fold per pair row
    val q = queries.select(
      col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
    // the scan's own partitioning carries the scoring parallelism at
    // real scale (a 100 TB table arrives in ≥cores splits, and
    // spreadCompute is a structural no-op — no ∝N candidate exchange);
    // an under-split input would otherwise serialize the whole Q·N dot
    // scan onto one task (r14, measured single 3-4 s tasks at bench SF)
    val c = graft.toolbox.Partitions.spreadCompute(
      candidates.select(
        col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv")))
      .withColumn("cn", l2norm(col("cv")))
    scoreAndRank(c.crossJoin(broadcast(q)), k)
  }

  /**
   * Hard-negative mining for contrastive training: per query, the k
   * most similar candidates whose cosine stays AT OR BELOW
   * `dupThreshold` — similar enough to be informative negatives,
   * dissimilar enough not to be latent positives/duplicates. The
   * standard two-stage practice, made explicit: an exact top-
   * `shortlist` retrieval ([[cosineTopK]]) feeds the threshold filter,
   * then a per-query re-rank keeps k. A near-duplicate crowding the
   * shortlist top is EXCLUDED, not re-labeled — pair it with
   * [[graft.dedup.Dedup.embeddingPairsLsh]] to also drop those from
   * the positive pool.
   *
   * Scale: inherits [[cosineTopK]]'s layout (queries broadcast,
   * candidates never shuffle, bounded shortlist cut); the filter and
   * re-rank add only per-query O(shortlist) work via the bounded
   * top-k aggregate (no window over score rows). For corpus-scale
   * query sets swap the retrieval stage for [[ivfTopKWith]]/
   * [[lshCosineTopK]] output and apply the same filter + re-rank.
   *
   * Output: `(qid, cid, cos_r6, rnk)` — rnk 1..k among sub-threshold
   * shortlist members (cos desc, cid asc).
   */
  def hardNegatives(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      shortlist: Int = 100, dupThreshold: Double = 0.95): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    graft.curation.Sampling.quotaTopK(
        cosineTopK(queries, candidates, idCol, vecCol, shortlist)
          .where(col("cos_r6") <= dupThreshold),
        Seq("qid"), "cos_r6", "cid", k)
      .select(col("qid"), col("cid"), col("cos_r6"),
        col("rank").cast("long").as("rnk"))
  }

  /**
   * MMR (maximal marginal relevance) diversified re-rank — the
   * serving-side diversity operator: from each query's exact
   * top-`shortlist`, greedily select k candidates maximizing
   * `λ·relevance − (1−λ)·max-similarity-to-already-selected`, so the
   * result covers the query's neighborhood instead of returning k
   * near-copies of the same cluster (RAG retrieval, eval-set
   * sampling, hard-negative variety).
   *
   * Integer contract: relevance and pairwise similarity are the
   * library's round-6 cosines lifted to micro-units
   * (`round(cos_r6 · 1e6)` — exactly replayable), λ is ppm, and the
   * objective `(λ·score_u − (1e6−λ)·maxsim_u) div 1e6` is truncating
   * 64-bit arithmetic (toward zero on negatives in both engines) — so
   * every greedy argmax compares INTEGERS and the selection order is
   * engine-exact. Ties: higher objective first, then smaller cid; the
   * first pick is the plain relevance argmax (empty selected set,
   * maxsim 0).
   *
   * Scale shape: the shortlist is the bounded [[cosineTopK]] cut
   * (exchange ~Q·shortlist); pairwise sims are computed ONLY within
   * each query's shortlist — Q·shortlist² slim rows, never N² — and
   * each of the k greedy rounds is one equi-join + one
   * map-side-combined max + one O(1)-state-per-query
   * [[graft.curation.Sampling.quotaTopK]] argmax. Rounds are a fixed
   * small k, snapshotted per round like
   * [[graft.graph.PageRank]]'s iteration discipline.
   *
   * Output: (qid, rnk 1..k, cid, mmr_u) — mmr_u is the objective the
   * pick won with, in micro-units.
   */
  def mmrRerank(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      lambdaPpm: Long = 700000L,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    require(lambdaPpm >= 0L && lambdaPpm <= 1000000L,
      s"lambdaPpm must be in [0, 1e6], got $lambdaPpm")
    val sl = materialize(
      cosineTopK(queries, candidates, idCol, vecCol, shortlist)
        .select(col("qid"), col("cid"),
          round(col("cos_r6") * 1e6).cast("long").as("score_u")))
    val cv = candidates.select(col(idCol).as("cid"),
      col(vecCol).cast("array<double>").as("cv"))
    val slv = sl.select(col("qid"), col("cid")).join(cv, "cid")
    val sims = materialize(
      slv.select(col("qid"), col("cid").as("ci"), col("cv").as("vi"))
        .join(slv.select(col("qid"), col("cid").as("cj"), col("cv").as("vj")),
          Seq("qid"))
        .where(col("ci") =!= col("cj"))
        .select(col("qid"), col("ci"), col("cj"),
          round(cosineRounded(col("vi"), col("vj")) * 1e6)
            .cast("long").as("sim_u")))
    // the argmax compares the RAW objective λ·score_u − (1−λ)·maxsim_u
    // (≤ 1e12, fits long) — dividing first would truncate distinct
    // objectives onto the same value and let the cid tie-break pick a
    // lower-relevance candidate; mmr_u (div 1e6) is display-only
    def pick1(obj: DataFrame, rnk: Int): DataFrame =
      graft.curation.Sampling.quotaTopK(obj, Seq("qid"), "mmr_raw", "cid", 1)
        .select(col("qid"), lit(rnk.toLong).as("rnk"), col("cid"),
          expr("mmr_raw div 1000000L").as("mmr_u"))
    var sel = materialize(pick1(
      sl.select(col("qid"), col("cid"),
        expr(s"${lambdaPpm}L * score_u").as("mmr_raw")), 1))
    var r = 2
    while (r <= k) {
      val selc = sel.select(col("qid"), col("cid").as("cj"))
      val maxsim = sims.join(selc, Seq("qid", "cj"))
        .groupBy(col("qid"), col("ci").as("cid"))
        .agg(max(col("sim_u")).as("maxsim_u"))
      val rem = sl.join(sel.select(col("qid"), col("cid")),
        Seq("qid", "cid"), "left_anti")
      val obj = rem.join(maxsim, Seq("qid", "cid"), "left")
        .select(col("qid"), col("cid"),
          expr(s"${lambdaPpm}L * score_u - ${1000000L - lambdaPpm}L * " +
            "coalesce(maxsim_u, 0L)").as("mmr_raw"))
      sel = materialize(sel.unionByName(pick1(obj, r)))
      r += 1
    }
    sel
  }

  /** SimHash bucket ids, one per hash table — codegen'd native expression
    * (graft.functions.SimhashBuckets); plane components are stateless
    * splitmix64-derived values keyed by (table, plane, dim). */
  def simhashBuckets(vec: Column, planes: Int, tables: Int): Column =
    graft.functions.SimhashBuckets.simhashBuckets(vec, planes, tables)

  /**
   * Approximate top-k: candidates restricted to rows sharing the query's
   * SimHash bucket in at least one of `tables` independent hash tables.
   * Recall rises with tables, cost falls with planes. Output contract
   * matches [[cosineTopK]] (rank within retrieved candidates).
   */
  def lshCosineTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 8, tables: Int = 4): DataFrame = {
    // norm computed ONCE per row, before the band explode — not per
    // candidate pair (a per-pair norm would redo two full folds times
    // the pair count times the bucket-collision multiplicity)
    def bucketed(df: DataFrame, id: String, vec: String, norm: String) =
      df.select(col(idCol).as(id), col(vecCol).cast("array<double>").as(vec))
        .withColumn(norm, l2norm(col(vec)))
        .select(col(id), col(vec), col(norm),
          posexplode(simhashBuckets(col(vec), planes, tables)))
        .withColumnsRenamed(Map("pos" -> "tbl", "col" -> "bucket"))
    val q = bucketed(queries, "qid", "qv", "qn")
    // spread the candidate scan for the per-collision dot products —
    // no-op at real scale, parallelizes under-split inputs (r14)
    val c = bucketed(
      graft.toolbox.Partitions.spreadCompute(candidates), "cid", "cv", "cn")
    // score per collision, then dedup on SLIM (qid, cid, cos) rows: a
    // pair colliding in m of the `tables` hash tables pays m dot
    // products, but the dedup shuffle stays 3 scalars wide. The
    // alternative (dedup first, carrying vectors through the aggregate)
    // trades the m-1 redundant folds for shuffling m full vectors per
    // pair — measured strictly worse for any realistic dim/tables ratio
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6).as("cos_r6"))
      .dropDuplicates("qid", "cid")
    rank(scored, k)
  }

  /**
   * IVF (inverted-file) approximate top-k — the second ANN family next
   * to [[lshCosineTopK]]: every candidate is assigned to its nearest of
   * `nlist` coarse centroids (one cell each — the "inverted list"), and
   * a query scores only the candidates in its `nprobe` nearest cells.
   * `nprobe = nlist` degenerates to exact brute force (every cell
   * probed), which is what the oracle-checked gate query runs; real
   * deployments use `nprobe << nlist` for a `~nprobe/nlist` cost cut.
   *
   * Scale shape: centroids are tiny (nlist vectors) and ride the plan
   * as literals — candidate assignment is one map-side pass (nlist
   * dot products per row, no shuffle); the probe join shuffles only by
   * cell id; each candidate lives in exactly ONE cell, so no dedup pass
   * is needed (unlike multi-table LSH).
   *
   * The coarse quantizer is pluggable in spirit; here it is the
   * deterministic id-ordered sample of the candidate set (first `nlist`
   * vectors by id, L2-normalized). Production would train k-means
   * offline and pass the centroids in — the operator's plan shape is
   * identical either way.
   */
  def ivfTopK(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame =
    ivfCore(queries, candidates, idCol, vecCol, k,
      idSampleCentroids(candidates, idCol, vecCol, nlist), nprobe)

  /**
   * IVF top-k with EXPLICIT centroids — the production overload: pass a
   * trained quantizer ([[trainCentroids]], or any offline k-means) as a
   * small DataFrame holding one centroid vector per row in `vecCol`.
   * `nlist` = the centroid count; plan shape identical to [[ivfTopK]].
   */
  def ivfTopKWith(
      queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    ivfCore(queries, candidates, idCol, vecCol, k,
      centroids.select(col(vecCol).cast("array<double>")).collect()
        .map(r => normalized(r.getSeq[Double](0))), nprobe)

  /** Deterministic id-ordered sample quantizer (first `nlist` vectors by
    * id, L2-normalized on the driver — nlist rows, not a data collect).
    * Structurally exact at nprobe = nlist (the gate-oracle path), but a
    * BIASED quantizer for nprobe << nlist: an id-ordered sample of a
    * clustered corpus need not cover the cluster structure. Production
    * recall wants [[trainCentroids]]. */
  private def idSampleCentroids(
      candidates: DataFrame, idCol: String, vecCol: String, nlist: Int): Array[Seq[Double]] =
    candidates
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol)).limit(nlist).collect()
      .map(r => normalized(r.getSeq[Double](1)))

  private def normalized(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /**
   * Deterministic spherical k-means for the IVF coarse quantizer:
   * id-ordered sample init (reproducible — no RNG), then `iters` Lloyd
   * rounds of assign-to-nearest-centroid (map-side: centroids ride as
   * literals, exactly the serving path's assignment expression) and
   * per-cell mean + renormalize. Empty cells keep their previous
   * centroid. Returns one row per centroid: (cell, `vecCol`).
   *
   * Scale shape per round: one narrow assignment pass + one
   * posexplode(cell, dim, value) shuffle aggregated map-side to
   * nlist·dim cells — no iteration ever collects data rows; only the
   * nlist·dim means come back to the driver.
   */
  def trainCentroids(
      candidates: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    var cents: Array[Seq[Double]] = idSampleCentroids(candidates, idCol, vecCol, nlist)
    if (cents.nonEmpty) {
      // train on unit vectors: cosine assignment == dot with normalized
      // centroids; the mean of a cell's unit vectors, renormalized, is
      // the spherical-k-means update. NO spreadCompute here: an r14 A/B
      // measured the spread WORSE for this kernel (ivf/kmeans trains are
      // nlist-bounded — per-iter work is too small to repay the extra
      // exchange + per-task overhead; contrast ProductQuantizer.train,
      // whose m-way subspace assignment is heavy enough to win)
      val unit = candidates
        .select(col(vecCol).cast("array<double>").as("__v"))
        .withColumn("__n", l2norm(col("__v")))
        .where(col("__n") > 0)
        .select(transform(col("__v"), x => x / col("__n")).as("__v"))
      for (_ <- 1 to iters) {
        val assign = ivfAssignCell(cents)
        val means = unit
          .withColumn("__cell", assign(col("__v")))
          .select(col("__cell"), posexplode(col("__v")))
          .groupBy(col("__cell"), col("pos")).agg(avg(col("col")).as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .view.mapValues(rows =>
            normalized(rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)).toMap
        cents = cents.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
      }
    }
    cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("cell", vecCol)
  }

  /** Per-centroid (dot score, cell id) structs — the ONE scoring
    * definition shared by assignment (training + serving) and query-side
    * probing, so the three can never desynchronize. */
  private[similarity] def ivfCentScores(cents: Array[Seq[Double]])(vec: Column): Seq[Column] =
    cents.toIndexedSeq.zipWithIndex.map { case (cvec, i) =>
      struct(dot(vec, typedLit(cvec)).as("s"), lit(i).as("cell"))
    }

  /** Map-side nearest-centroid assignment expression (argmax dot). */
  private[similarity] def ivfAssignCell(cents: Array[Seq[Double]]): Column => Column =
    vec => if (cents.length == 1) lit(0)
      else greatest(ivfCentScores(cents)(vec): _*).getField("cell")

  /** Top-`nprobe` cell ids for a query vector (descending centroid
    * score) — shared by [[ivfTopKWith]] and [[IvfPq]]. */
  private[similarity] def ivfProbeCells(cents: Array[Seq[Double]], nprobe: Int)(
      vec: Column): Column =
    slice(reverse(array_sort(array(ivfCentScores(cents)(vec): _*))), 1,
      math.max(1, nprobe)).getField("cell")

  /** Centroid frame (one vector per row in `vecCol`) → normalized
    * driver-side array, cell order restored — shared by the explicit-
    * centroid serving paths. */
  private[similarity] def centroidArray(centroids: DataFrame, vecCol: String): Array[Seq[Double]] = {
    val hasCell = centroids.columns.contains("cell")
    val rows =
      if (hasCell) centroids.select(col("cell").cast("int"),
        col(vecCol).cast("array<double>")).collect().sortBy(_.getInt(0)).map(_.getSeq[Double](1))
      else centroids.select(col(vecCol).cast("array<double>")).collect().map(_.getSeq[Double](0))
    rows.map(normalized)
  }

  private def ivfCore(
      queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cents: Array[Seq[Double]], nprobe: Int): DataFrame = {
    // no candidates/centroids => empty result with the contract schema
    // (matches what cosineTopK/lshCosineTopK return for an empty side)
    if (cents.isEmpty)
      return queries.limit(0).select(
        col(idCol).as("qid"), col(idCol).as("cid"),
        lit(0.0).as("cos_r6"), lit(0L).as("rnk"))

    // per-row centroid scores: nlist literal-vector dot products
    // (greatest(struct(dot, idx)) = argmax, ties to the larger idx;
    // greatest needs >= 2 args, so a single centroid is cell 0 directly)
    val nearestCell: Column => Column = ivfAssignCell(cents)
    // top-nprobe cells for a query: sort the score structs descending,
    // keep the first nprobe cell ids — same ivfCentScores definition as
    // the assignment side
    def probeCells(vec: Column): Column =
      slice(reverse(array_sort(array(ivfCentScores(cents)(vec): _*))), 1, math.max(1, nprobe))
        .getField("cell")

    // spread: no-op at real scale, parallelizes under-split inputs (r14)
    val c = graft.toolbox.Partitions.spreadCompute(
      candidates.select(
        col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv")))
      .withColumn("cn", l2norm(col("cv")))
      .withColumn("__cell", nearestCell(col("cv")))
    val q = queries.select(
      col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", l2norm(col("qv")))
      .withColumn("__cell", explode(probeCells(col("qv"))))

    scoreAndRank(c.join(broadcast(q), Seq("__cell")), k)
  }
}
