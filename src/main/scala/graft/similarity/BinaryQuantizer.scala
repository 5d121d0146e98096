package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Binary (1-bit) embedding quantization — the EXTREME end of the ANN
 * storage dial ([[ScalarQuantizer]] is 4x, [[ProductQuantizer]] ~32x,
 * this is 64x: one bit per dimension, packed 64 dims to a long, so a
 * 64-dim float vector stores as a single BIGINT). The classic
 * sign-quantization trick (Charikar's SimHash geometry — the same
 * hyperplane idea as [[Similarity.lshCosineTopK]], but with AXIS-ALIGNED
 * planes through the per-dimension corpus mean instead of random
 * projections): bit d is set iff `v_d > mean_d`. Hamming distance on the
 * packed words then approximates angular distance, and `bit_count(xor)`
 * is one instruction per 64 dimensions — the cheapest shortlist scan in
 * the family.
 *
 * Train: ONE per-dimension mean aggregation (dim-sized result to the
 * driver — the IVF/PQ/int8 trainer-eagerness discipline). Centering on
 * the mean rather than 0 keeps the code balanced per dimension even for
 * biased corpora (all-positive features would otherwise encode to a
 * constant bit).
 *
 * Search ([[topK]]): queries and candidates encode with the SAME
 * thresholds (symmetric binary search); candidates score by NEGATED
 * Hamming distance (so "score descending" = "distance ascending",
 * reusing the family's top-k ordering contract), top-`shortlist` per
 * query via the bounded top-k aggregate (~Q·shortlist partials cross
 * the exchange — no ∝N term), then the exact cosine re-rank on the
 * original vectors. Emitted cosines are EXACT; recall is the only
 * approximation, and `shortlist >= |candidates|` is structurally exact
 * for ANY thresholds (the `simsearch_pq`/`simsearch_int8` gate
 * argument: every candidate passes through the exact re-rank).
 *
 * Persistence: [[paramsDF]]/[[paramsFrom]] — a (pos, thr) frame, shape
 * derived from rows (no metadata sidecar; the ModelStore rule).
 *
 * Reference scope note: the reference transformer (vasnake
 * BroadcastSpatialJoin.scala) has no vector search; this operator is
 * part of the training-data-pipeline surface built beside it.
 */
object BinaryQuantizer {

  case class BinaryParams(thresholds: Array[Double]) {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    def dim: Int = thresholds.length
    /** Packed-code width in 64-bit words. */
    def words: Int = (dim + 63) / 64
    override def equals(o: Any): Boolean = o match {
      case p: BinaryParams => thresholds.sameElements(p.thresholds)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(thresholds)
  }

  /** One eager dim-sized stats job (the trainer-eagerness discipline):
    * per-dimension mean over every candidate vector. */
  def train(candidates: DataFrame, vecCol: String): BinaryParams = {
    val rows = candidates
      .select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy("pos").agg(avg("col").as("thr"))
      .orderBy("pos")
      .collect()
    require(rows.nonEmpty, "cannot train binary params on an empty/zero-dim corpus")
    require(rows.head.getInt(0) == 0 && rows.last.getInt(0) == rows.length - 1,
      "ragged embedding dimensions (every vector must have the same length)")
    BinaryParams(rows.map(_.getDouble(1)))
  }

  /** Map-only sign encode: `array<bigint>` of [[BinaryParams.words]]
    * packed words; bit j of word w covers dimension 64·w + j. The
    * thresholds unroll as literal constants (params are model-sized),
    * so the whole encode stays inside whole-stage codegen. */
  def encodeCol(p: BinaryParams, vec: Column): Column = {
    val v = vec.cast("array<double>")
    val wordCols = (0 until p.words).map { w =>
      (0 until 64).filter(j => w * 64 + j < p.dim).map { j =>
        val d = w * 64 + j
        when(element_at(v, d + 1) > lit(p.thresholds(d)), lit(1L << j))
          .otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }
    array(wordCols: _*)
  }

  /** Hamming distance between two packed codes: one `bit_count(xor)`
    * per 64 dimensions, summed by a sequential fold. */
  def hammingCol(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /**
   * Binary-shortlisted exact-rerank top-k; output contract identical to
   * [[Similarity.cosineTopK]] (qid, cid, cos_r6, rnk — exact cosines).
   * Candidates stream as packed codes (map-only encode); the shortlist
   * cut is the bounded top-k aggregate (~Q·shortlist partials cross the
   * exchange, no ∝N term; Hamming ties break by candidate id ascending)
   * and the re-rank broadcasts the Q·shortlist pairs — candidates never
   * shuffle. `shortlist >= k`; `shortlist >= |candidates|` is exact for
   * any thresholds.
   */
  def topK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      p: BinaryParams, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    // spread: no-op at real scale, parallelizes under-split inputs (r14)
    val c = graft.toolbox.Partitions.spreadCompute(candidates
      .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv")))
      .withColumn("cn", Similarity.l2norm(col("cv")))
    // the stored artifact: one bigint per 64 dims; encode is map-only
    val codes = c.select(col("cid"), encodeCol(p, col("cv")).as("cb"))
    val q = queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
    val qcodes = q.select(col("qid"), encodeCol(p, col("qv")).as("qb"))
    // negated Hamming so "score desc" = "distance asc" — the family's
    // quotaTopK ordering contract (ties by cid asc) applies unchanged
    val approx = codes.crossJoin(broadcast(qcodes))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (-hammingCol(col("qb"), col("cb"))).cast("double").as("ax"))
    // shortlist = Int.MaxValue: top-k is the identity — skip the
    // unbounded aggregate (see ProductQuantizer.topK, r14)
    val short =
      if (shortlist == Int.MaxValue)
        approx.where(col("ax").isNotNull && col("cid").isNotNull)
          .select("qid", "cid")
      else graft.curation.Sampling
        .quotaTopK(approx, Seq("qid"), "ax", "cid", shortlist)
        .select("qid", "cid")
    // broadcast the Q·shortlist pairs (with query vectors); candidates
    // stream map-side — zero candidate shuffle in the re-rank
    val rejoined = c.select(col("cid"), col("cv"), col("cn"))
      .join(broadcast(short
        .join(q.select(col("qid"), col("qv"), col("qn")), "qid")), "cid")
    Similarity.scoreAndRank(rejoined, k)
  }

  /** Persistable (pos, thr) frame. */
  def paramsDF(spark: SparkSession, p: BinaryParams): DataFrame = {
    import spark.implicits._
    p.thresholds.indices.map(i => (i, p.thresholds(i))).toDF("pos", "thr")
  }

  /** Reload from a [[paramsDF]]-shaped frame (e.g. a parquet
    * round-trip); dimension derives from the rows and gaps fail. */
  def paramsFrom(df: DataFrame): BinaryParams = {
    val rows = df.select(col("pos").cast("int"), col("thr").cast("double"))
      .orderBy("pos").collect()
    require(rows.nonEmpty, "empty binary params frame")
    require(rows.head.getInt(0) == 0 && rows.last.getInt(0) == rows.length - 1
        && rows.map(_.getInt(0)).toSeq == rows.indices.toSeq,
      "binary params frame has gaps or duplicate positions")
    BinaryParams(rows.map(_.getDouble(1)))
  }
}
