package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) for embedding similarity search — the third
 * ANN family next to [[Similarity.lshCosineTopK]] and
 * [[Similarity.ivfTopK]], and the one that attacks MEMORY rather than
 * candidate count: each candidate vector is stored as `m` small
 * sub-codebook indices (one byte each at ksub <= 256) instead of
 * `dim` floats — 64-dim float vectors compress ×32 (256 B → 8 B). At
 * 100 TB of embeddings that is the difference between a scan that
 * rereads parquet and a code table that fits in cluster memory.
 *
 * Pipeline:
 *  1. [[train]]: per-subspace Lloyd k-means over the UNIT-normalized
 *     candidate vectors (cosine targets), deterministic id-ordered
 *     sample init, all `m` subspaces trained in ONE aggregation per
 *     iteration — only m·ksub·(dim/m) = ksub·dim means reach the
 *     driver per round, never data rows (the
 *     [[Similarity.trainCentroids]] collect discipline).
 *  2. [[encodeCol]]: map-side argmin assignment per subspace — codebooks
 *     ride the plan as literals, no shuffle; at scale the codes column
 *     is computed once and persisted next to the ids.
 *  3. [[topK]]: ADC scan — each query precomputes an m×ksub lookup
 *     table of sub-dot-products (`lut[j][c] = <q_j, codebook_j[c]>`),
 *     every candidate pair costs m table reads via the codegen'd
 *     [[graft.functions.PqAdcScore]] (`Σ_j lut[j][codes[j]]` ≈
 *     `<q, x/|x|>`, which ranks identically to cosine per query);
 *     the top `shortlist` candidates per query by ADC score are then
 *     re-ranked EXACTLY (original vectors join back only for the
 *     shortlist), so emitted scores are exact cosines and, for a
 *     sufficient shortlist, the result equals brute force rank for
 *     rank — the same "exact modulo retrieval" contract as the LSH and
 *     IVF paths.
 *
 * Scale shape of [[topK]]: queries broadcast with their LUTs (Q·m·ksub
 * doubles); the candidate side streams its (id, codes) rows — the big
 * side never shuffles vectors for the scan, the shortlist cut is the
 * bounded top-k AGGREGATE (map-side truncation to `shortlist`, so the
 * exchange ships ~Q·shortlist partials — no term proportional to N),
 * and the exact re-rank touches only Q·shortlist full vectors. Composable with IVF:
 * restrict the candidate side to probed cells first, then ADC-scan the
 * survivors (the two operators share the literal-centroid map-side
 * assignment idiom).
 */
object ProductQuantizer {

  /** Trained PQ codebooks: `cents(j)(c)` is the `dim/m`-length centroid
    * `c` of subspace `j`. */
  final case class Codebooks(dim: Int, m: Int, cents: Array[Array[Array[Double]]]) {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    def dsub: Int = dim / m
    def ksub: Int = cents.head.length
  }

  /** Unit-normalized double vector (zero vectors pass through — their
    * cosine is undefined and the exact re-rank preserves whatever the
    * brute-force path would emit for them). */
  private[similarity] def unitCol(v: Column): Column = {
    val n = Similarity.l2norm(v)
    when(n > 0, transform(v, x => x / n)).otherwise(v)
  }

  /** Per-subspace argmin-distance code as a map-side literal expression:
    * `argmin_c ||x_j − c||² = argmax_c (<x_j, c> − ½||c||²)` — the ½‖c‖²
    * terms fold to constants, so assignment is ksub sub-dot-products. */
  private def codeCol(cb: Codebooks, j: Int)(vec: Column): Column = {
    val sub = slice(vec, j * cb.dsub + 1, cb.dsub)
    if (cb.ksub == 1) lit(0)
    else greatest(cb.cents(j).toIndexedSeq.zipWithIndex.map { case (c, i) =>
      val halfNorm = c.map(x => x * x).sum / 2.0
      struct((Similarity.dot(sub, typedLit(c.toSeq)) - lit(halfNorm)).as("s"), lit(i).as("code"))
    }: _*).getField("code")
  }

  /** `array<int>` of the m sub-codebook indices for a (unit) vector. */
  def encodeCol(cb: Codebooks, unitVec: Column): Column =
    array((0 until cb.m).map(j => codeCol(cb, j)(unitVec)): _*)

  /**
   * Train PQ codebooks: per-subspace Lloyd k-means on unit vectors.
   * Deterministic: init from the first `ksub` vectors by id (their
   * subvectors), then `iters` rounds of assign + per-(subspace, code,
   * dim) mean; empty cells keep their previous centroid.
   *
   * One aggregation per round covers ALL subspaces: explode to
   * (subspace, code, dim, value) and mean map-side-combined — the
   * collect is ksub·dim doubles, independent of row count.
   */
  def train(candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 5): Codebooks = {
    val first = candidates
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .orderBy(col(idCol)).limit(ksub).collect()
    require(first.nonEmpty, "PQ training needs a non-empty candidate set")
    val dim = first.head.getSeq[Double](1).length
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val dsub = dim / m
    def normalized(v: Seq[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      (if (n == 0) v else v.map(_ / n)).toArray
    }
    // init subspace j from the sample's subvectors; short samples pad by
    // cycling (duplicate centroids merge into one occupied cell harmlessly)
    var cb = Codebooks(dim, m, Array.tabulate(m) { j =>
      Array.tabulate(ksub) { c =>
        normalized(first(c % first.length).getSeq[Double](1)).slice(j * dsub, (j + 1) * dsub)
      }
    })
    if (first.length == 1 && iters > 0) return cb // degenerate: one vector
    // spread: no-op at real scale, parallelizes under-split inputs (r14)
    val unit = graft.toolbox.Partitions.spreadCompute(
      candidates.select(col(vecCol).cast("array<double>").as("__v")))
      .withColumn("__n", Similarity.l2norm(col("__v")))
      .where(col("__n") > 0)
      .select(transform(col("__v"), x => x / col("__n")).as("__v"))
    for (_ <- 1 to iters) {
      val entries = (0 until m).map { j =>
        struct(lit(j).as("j"), codeCol(cb, j)(col("__v")).as("code"),
          slice(col("__v"), j * dsub + 1, dsub).as("sub"))
      }
      val means = unit
        .select(explode(array(entries: _*)).as("e"))
        .select(col("e.j"), col("e.code"), posexplode(col("e.sub")))
        .groupBy(col("j"), col("code"), col("pos")).agg(avg(col("col")).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .view.mapValues(rows => rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray)
        .toMap
      cb = Codebooks(dim, m, Array.tabulate(m) { j =>
        Array.tabulate(ksub) { c => means.getOrElse((j, c), cb.cents(j)(c)) }
      })
    }
    cb
  }

  /** The per-query ADC lookup table expression — shared by [[topK]]
    * and the IVF-restricted composition ([[IvfPq.topK]]). */
  private[similarity] def adcLut(cb: Codebooks, qv: Column): Column =
    array((0 until cb.m).map { j =>
      val qsub = slice(qv, j * cb.dsub + 1, cb.dsub)
      array(cb.cents(j).toIndexedSeq.map(cvec => Similarity.dot(qsub, typedLit(cvec.toSeq))): _*)
    }: _*)

  /**
   * PQ ADC top-k with exact re-rank. Output contract matches
   * [[Similarity.cosineTopK]]: (qid, cid, cos_r6, rnk 1..k), self-pairs
   * excluded, emitted cosines EXACT (computed on the original vectors);
   * only retrieval is approximate — a pair outside the per-query ADC
   * `shortlist` cannot surface. `shortlist >= k` required.
   */
  def topK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cb: Codebooks, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    // spread: no-op at real scale, parallelizes under-split inputs (r14)
    val c = graft.toolbox.Partitions.spreadCompute(candidates
      .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv")))
      .withColumn("cn", Similarity.l2norm(col("cv")))
    // codes computed once per candidate (at scale: precomputed + persisted)
    val codes = c.select(col("cid"), encodeCol(cb, unitCol(col("cv"))).as("codes"))
    // per-query LUT: lut[j][c] = <q_j, codebook_j[c]> — m·ksub doubles,
    // broadcast with the query row; ADC sums approximate <q, x/|x|>,
    // which per query ranks identically to cosine (qn is constant)
    val lut = adcLut(cb, col("qv"))
    val q = queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
    val qlut = q.select(col("qid"), lut.as("lut"))
    val adc = codes.crossJoin(broadcast(qlut))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.PqAdcScore.pqAdcScore(col("lut"), col("codes")).as("adc"))
    // bounded shortlist cut: the top-`shortlist` aggregate truncates
    // map-side, so the exchange ships ~Q·shortlist partials — NOT the
    // Q·N (qid, cid, adc) rows a row_number window would shuffle; ties
    // by cid for determinism (same (-score, cid) total order).
    // shortlist = Int.MaxValue (the exact-oracle configuration) makes
    // top-k the identity — skip the aggregate outright instead of
    // accumulating every candidate into unbounded per-query buffers
    // (r14: those buffers were the suite's worst GC source, 2-3 s
    // collections); the null filter mirrors quotaTopK's, so the kept
    // (qid, cid) set is bit-identical
    val short =
      if (shortlist == Int.MaxValue)
        adc.where(col("adc").isNotNull && col("cid").isNotNull)
          .select("qid", "cid")
      else graft.curation.Sampling
        .quotaTopK(adc, Seq("qid"), "adc", "cid", shortlist)
        .select("qid", "cid")
    // exact re-rank: the Q·shortlist (qid, cid) pairs pick up the query
    // vectors and BROADCAST — the candidate side streams its vectors
    // map-side, so the re-rank adds zero candidate shuffle
    val rejoined = c.select(col("cid"), col("cv"), col("cn"))
      .join(broadcast(short
        .join(q.select(col("qid"), col("qv"), col("qn")), "qid")), "cid")
    Similarity.scoreAndRank(rejoined, k)
  }
}
