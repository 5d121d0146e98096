package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * IVF quantizer recall as a MEASURED NUMBER, not just a pass/fail bit:
 * recall@10 at nprobe = 2 of nlist = 8 on a deterministic clustered
 * corpus, for the trained (spherical k-means) and the id-sample coarse
 * quantizer. `graft.Bench` emits both values into its JSON artifact each
 * round, so a quantizer regression changes a recorded number; the
 * PipelineOpsSpec recall pin ("recover recall with trained IVF
 * centroids") asserts thresholds over the same corpus.
 *
 * Corpus (seeded, reproducible): 8 tight unit-vector clusters of 10
 * vectors each, ID-ORDERED so the first-8-by-id sample quantizer lands
 * every centroid in cluster 0 — the worst case that separates quantizer
 * quality from luck.
 */
object RecallProbe {

  val Nlist = 8
  val Nprobe = 2
  val K = 10

  def corpus(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def unit(dim: Int): Array[Float] = {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Seq.fill(Nlist)(unit(32))
    (0 until 80).map { i =>
      val c = centers(i / 10)
      (i.toLong, c.zipWithIndex.map { case (x, j) => x + 0.05f * (((i * 31 + j * 7) % 5) - 2) })
    }.toDF("vec_id", "embedding")
  }

  /** PQ recall@10 at a 2k ADC shortlist (m = 8 × 4-dim subspaces,
    * ksub = 16, 3 Lloyd rounds) on the same clustered corpus — the
    * production-shape retrieval number for the PQ family (the gate row
    * runs the structurally-exact unbounded shortlist instead). */
  def measurePq(spark: SparkSession): Double = {
    val vecs = corpus(spark)
    val q = vecs.where(col("vec_id") % 10 === 3)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(q, vecs, "vec_id", "embedding", K))
    val cb = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 8, ksub = 16, iters = 3)
    val got = pairs(ProductQuantizer.topK(q, vecs, "vec_id", "embedding", K, cb, shortlist = 2 * K))
    got.intersect(exact).size.toDouble / exact.size
  }

  /** Binary (1-bit) recall@10 at a 2k Hamming shortlist on the same
    * clustered corpus — the production-shape retrieval number for the
    * sign-quantization path (the gate row runs the structurally-exact
    * unbounded shortlist instead). */
  def measureBinary(spark: SparkSession): Double = {
    val vecs = corpus(spark)
    val q = vecs.where(col("vec_id") % 10 === 3)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(q, vecs, "vec_id", "embedding", K))
    val p = BinaryQuantizer.train(vecs, "embedding")
    val got = pairs(BinaryQuantizer.topK(q, vecs, "vec_id", "embedding", K, p, shortlist = 2 * K))
    got.intersect(exact).size.toDouble / exact.size
  }

  /** Composed IVF+PQ recall@10 at production knobs (nprobe 2 of 8
    * cells, shortlist 2K) — the multiplied-approximation path must
    * stay within a few points of its single-family parents. */
  def measureIvfPq(spark: SparkSession): Double = {
    val vecs = corpus(spark)
    val q = vecs.where(col("vec_id") % 10 === 3)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(q, vecs, "vec_id", "embedding", K))
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding", Nlist, iters = 5)
    val cb = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 8, ksub = 16, iters = 3)
    val got = pairs(IvfPq.topK(q, vecs, cents, "vec_id", "embedding", K, cb,
      Nprobe, shortlist = 2 * K))
    got.intersect(exact).size.toDouble / exact.size
  }

  /** (trained, sampled) recall@10 against the exact brute-force top-k,
    * one query per cluster. */
  def measure(spark: SparkSession): (Double, Double) = {
    val vecs = corpus(spark)
    val q = vecs.where(col("vec_id") % 10 === 3)
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(q, vecs, "vec_id", "embedding", K))
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding", Nlist, iters = 5)
    val trained = pairs(Similarity.ivfTopKWith(q, vecs, cents, "vec_id", "embedding", K, Nprobe))
    val sampled = pairs(Similarity.ivfTopK(q, vecs, "vec_id", "embedding", K, Nlist, Nprobe))
    def recall(got: Set[(Long, Long)]): Double =
      got.intersect(exact).size.toDouble / exact.size
    (recall(trained), recall(sampled))
  }
}
