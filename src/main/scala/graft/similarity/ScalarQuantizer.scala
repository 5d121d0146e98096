package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scalar (int8) embedding quantization — the STORAGE dial of the ANN
 * family, between full floats and [[ProductQuantizer]]'s m-byte codes:
 * each dimension maps affinely onto the 256 int8 levels, so a
 * 64-dim float vector stores as 64 bytes (4x smaller; 8x vs the
 * doubles it scores as) while staying per-dimension decodable —
 * unlike PQ codes, int8 codes support any downstream math after a
 * map-only decode, and the reconstruction error is a per-dimension
 * constant `scale_d / 2` bound, not a codebook assignment artifact.
 *
 * Train: ONE per-dimension min/max aggregation (dim-sized result to
 * the driver — the IVF/PQ trainer-eagerness discipline);
 * `scale_d = (hi_d − lo_d) / 255`, `code = round((v − lo_d) / scale_d)
 * − 128` clamped to [−128, 127] (a constant dimension has scale 0 and
 * encodes to −128, decoding exactly to `lo_d`). Encode/decode are
 * map-only `transform` expressions over literal parameter arrays — no
 * join, no shuffle, engine-replayable IEEE arithmetic.
 *
 * Search ([[topK]]): candidates score as their DECODED vectors against
 * exact queries (asymmetric SQ search), top-`shortlist` per query by
 * approximate cosine, then the [[Similarity.scoreAndRank]] exact
 * re-rank on original vectors — emitted cosines are EXACT, recall is
 * the only approximation, and an unbounded shortlist is structurally
 * exact for ANY parameters (the `simsearch_pq` gate argument).
 *
 * Persistence: [[paramsDF]]/[[paramsFrom]] — a (pos, lo, scale) frame,
 * shape derived from rows (no metadata sidecar; the ModelStore rule).
 */
object ScalarQuantizer {

  case class Int8Params(lo: Array[Double], scale: Array[Double]) {
    require(lo.length == scale.length && lo.nonEmpty,
      s"lo/scale must be equal-length and non-empty (${lo.length}/${scale.length})")
    def dim: Int = lo.length
    override def equals(o: Any): Boolean = o match {
      case p: Int8Params =>
        lo.sameElements(p.lo) && scale.sameElements(p.scale)
      case _ => false
    }
    override def hashCode: Int =
      java.util.Arrays.hashCode(lo) * 31 + java.util.Arrays.hashCode(scale)
  }

  /** One eager dim-sized stats job (the trainer-eagerness discipline):
    * per-dimension min/max over every candidate vector. */
  def train(candidates: DataFrame, vecCol: String): Int8Params = {
    val rows = candidates
      .select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy("pos").agg(min("col").as("lo"), max("col").as("hi"))
      .orderBy("pos")
      .collect()
    require(rows.nonEmpty, "cannot train int8 params on an empty/zero-dim corpus")
    require(rows.head.getInt(0) == 0 && rows.last.getInt(0) == rows.length - 1,
      "ragged embedding dimensions (every vector must have the same length)")
    val lo = rows.map(_.getDouble(1))
    val scale = rows.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0)
    Int8Params(lo, scale)
  }

  /** Map-only int8 encode: `array<tinyint>` of the input's dimension. */
  def encodeCol(p: Int8Params, vec: Column): Column =
    transform(vec.cast("array<double>"), (v, i) => {
      val lo = element_at(typedLit(p.lo.toSeq), i + 1)
      val sc = element_at(typedLit(p.scale.toSeq), i + 1)
      when(sc === 0d, lit(-128))
        .otherwise(greatest(lit(-128), least(lit(127),
          round((v - lo) / sc).cast("int") - 128)))
        .cast("byte")
    })

  /** Map-only decode back to `array<double>`; error per dimension is
    * bounded by `scale_d / 2` (clamping aside, which only triggers for
    * values outside the trained range). */
  def decodeCol(p: Int8Params, codes: Column): Column =
    transform(codes, (c, i) =>
      element_at(typedLit(p.lo.toSeq), i + 1)
        + (c.cast("double") + 128d) * element_at(typedLit(p.scale.toSeq), i + 1))

  /**
   * Int8-shortlisted exact-rerank top-k; output contract identical to
   * [[Similarity.cosineTopK]] (qid, cid, cos_r6, rnk — exact cosines).
   * Candidates stream as codes + decode (map-only); the shortlist cut
   * is the bounded top-k aggregate (~Q·shortlist partials cross the
   * exchange, no ∝N term) and the re-rank broadcasts the shortlist —
   * candidates never shuffle. `shortlist >= k`;
   * `shortlist >= |candidates|` is exact for any parameters.
   */
  def topK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      p: Int8Params, shortlist: Int): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    // spread: no-op at real scale, parallelizes under-split inputs (r14)
    val c = graft.toolbox.Partitions.spreadCompute(candidates
      .select(col(idCol).as("cid"), col(vecCol).cast("array<double>").as("cv")))
      .withColumn("cn", Similarity.l2norm(col("cv")))
    // the stored artifact: codes only; decode is a map-only transform
    val dec = c.select(col("cid"), decodeCol(p, encodeCol(p, col("cv"))).as("dv"))
      .withColumn("dn", Similarity.l2norm(col("dv")))
    val q = queries
      .select(col(idCol).as("qid"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
    val approx = dec.crossJoin(broadcast(q))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        (Similarity.dot(col("qv"), col("dv")) / (col("qn") * col("dn"))).as("ax"))
    // bounded shortlist cut (see ProductQuantizer.topK): ~Q·shortlist
    // partials cross the exchange instead of Q·N score rows
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

  /** Persistable (pos, lo, scale) frame. */
  def paramsDF(spark: SparkSession, p: Int8Params): DataFrame = {
    import spark.implicits._
    p.lo.indices.map(i => (i, p.lo(i), p.scale(i))).toDF("pos", "lo", "scale")
  }

  /** Reload from a [[paramsDF]]-shaped frame (e.g. a parquet
    * round-trip); dimension derives from the rows and gaps fail. */
  def paramsFrom(df: DataFrame): Int8Params = {
    val rows = df.select(col("pos").cast("int"), col("lo").cast("double"),
        col("scale").cast("double"))
      .orderBy("pos").collect()
    require(rows.nonEmpty, "empty int8 params frame")
    require(rows.head.getInt(0) == 0 && rows.last.getInt(0) == rows.length - 1
        && rows.map(_.getInt(0)).toSeq == rows.indices.toSeq,
      "int8 params frame has gaps or duplicate positions")
    Int8Params(rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }
}
