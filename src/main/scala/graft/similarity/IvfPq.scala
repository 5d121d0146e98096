package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * IVF ∘ PQ — the composed production ANN shape: the inverted file cuts
 * WHICH candidates are scanned (each query touches only its `nprobe`
 * cells ≈ `nprobe/nlist` of the corpus), product quantization cuts WHAT
 * is scanned (m one-byte codes per candidate instead of `dim` floats),
 * and the exact re-rank on original vectors keeps emitted scores exact
 * — a FAISS `IVFx,PQy` index expressed as one declarative Spark plan.
 *
 * Plan shape (all three legs inherit their components' contracts):
 *  1. candidates assign to their nearest centroid map-side (literal
 *     centroids, no shuffle) and carry (cell, codes) — at scale both
 *     are precomputed once and persisted;
 *  2. the query side explodes to its `nprobe` probe cells WITH its ADC
 *     lookup table and BROADCASTS — the cell equi-join restricts the
 *     scan to probed cells with zero candidate shuffle (each candidate
 *     lives in exactly ONE cell, so no dedup pass either);
 *  3. the ADC scores cut to `shortlist` per query through the bounded
 *     top-k aggregate (~Q·shortlist partials cross the exchange, no
 *     ∝N term) and re-rank exactly via a broadcast join-back.
 *
 * `nprobe = nlist` AND an unbounded shortlist degenerate to exact
 * brute force — the oracle-gate setting (`simsearch_ivfpq`); real
 * deployments dial both down and trade recall for the multiplied cost
 * cut (recall recorded per round beside the single-family paths).
 *
 * Reference: the reference engine has no ANN surface — this is
 * training-data-pipeline scope; no reference behavior is cited.
 */
object IvfPq {

  /**
   * IVF-restricted PQ top-k. `centroids`: one coarse centroid per row
   * in `vecCol` (from [[Similarity.trainCentroids]] or any offline
   * k-means); `cb`: trained [[ProductQuantizer.Codebooks]]. Output
   * contract identical to [[Similarity.cosineTopK]]:
   * (qid, cid, cos_r6, rnk 1..k), self-pairs excluded, cosines exact;
   * retrieval misses only what cell probing or the ADC shortlist cut
   * away.
   */
  def topK(queries: DataFrame, candidates: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int,
      cb: ProductQuantizer.Codebooks, nprobe: Int, shortlist: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cents = Similarity.centroidArray(centroids, vecCol)
    require(cents.nonEmpty, "need at least one centroid")

    // spread: no-op at real scale, parallelizes under-split inputs (r14)
    val c = graft.toolbox.Partitions.spreadCompute(candidates
      .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv")))
      .withColumn("cn", Similarity.l2norm(col("cv")))
    // the stored artifact at scale: (cid, cell, codes) — computed once
    val coded = c.select(col("cid"),
      Similarity.ivfAssignCell(cents)(col("cv")).as("__cell"),
      ProductQuantizer.encodeCol(cb, ProductQuantizer.unitCol(col("cv"))).as("codes"))

    val q = queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
    val probes = q.select(col("qid"),
        ProductQuantizer.adcLut(cb, col("qv")).as("lut"),
        explode(Similarity.ivfProbeCells(cents, nprobe)(col("qv"))).as("__cell"))

    // probed-cell ADC scan: candidates stream, queries broadcast per
    // cell; one cell per candidate => (qid, cid) already distinct
    val adc = coded.join(broadcast(probes), Seq("__cell"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        graft.functions.PqAdcScore.pqAdcScore(col("lut"), col("codes")).as("adc"))
    // shortlist = Int.MaxValue: top-k is the identity — skip the
    // unbounded aggregate (see ProductQuantizer.topK, r14)
    val short =
      if (shortlist == Int.MaxValue)
        adc.where(col("adc").isNotNull && col("cid").isNotNull)
          .select("qid", "cid")
      else graft.curation.Sampling
        .quotaTopK(adc, Seq("qid"), "adc", "cid", shortlist)
        .select("qid", "cid")
    val rejoined = c.select(col("cid"), col("cv"), col("cn"))
      .join(broadcast(short
        .join(q.select(col("qid"), col("qv"), col("qn")), "qid")), "cid")
    Similarity.scoreAndRank(rejoined, k)
  }
}
