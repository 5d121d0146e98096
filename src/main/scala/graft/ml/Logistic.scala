package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed logistic-regression scoring and training for
 * quality-classifier curation — the "model-based quality filter" stage of
 * an LLM training-data pipeline (score every document with a small linear
 * model over cheap text features; keep the high scorers). The reference
 * engine has no model stage; this extends the curation surface the same
 * way the IVF trainer extends ANN (reference: vasnake
 * SpatialJoinTransformer has no analogue — this file cites no reference
 * behavior).
 *
 * Two halves, deliberately decoupled:
 *
 *  - [[logit]] / [[score]]: SERVING — a pure column expression over a
 *    feature array with literal weights. Map-only, codegen'd by Catalyst
 *    (chained multiply-adds), zero shuffle: at 100 TB the scoring pass
 *    rides the same scan as any other profile column. The logit uses a
 *    FIXED left-to-right summation order, so an external SQL engine
 *    replays it bit-for-bit (the gate row hashes against DuckDB).
 *
 *  - [[train]]: full-batch gradient descent where each iteration is ONE
 *    map-side-combined aggregation; only the (d+1)-element gradient ever
 *    reaches the driver (same collect discipline as
 *    [[graft.similarity.Similarity.trainCentroids]] — nlist·dim means
 *    there, d+1 sums here; never data rows). Deterministic init (zeros),
 *    no sampling, no RNG; results are reproducible up to floating-point
 *    summation order across partitions (the usual distributed-sum
 *    caveat — the spec asserts with tolerances, the GATE scores fixed
 *    literal weights so oracle comparison stays exact).
 *
 * Scale notes (100 TB): an iteration shuffles d+1 partial sums per map
 * task — independent of row count; 20 iterations are 20 scans. For a
 * 4-feature quality model that is the cheapest possible trainer shape;
 * if the scan dominates, cache the (features, label) projection before
 * calling (the projection is 5 doubles/row — the caller's call).
 */
object Logistic {

  /** Exact-arithmetic logit: `bias + w(0)*f[1] + w(1)*f[2] + ...` as a
    * left-associated chain of multiply-adds — IEEE-reproducible in any
    * engine that evaluates `b + w1*f1 + w2*f2 + ...` left to right (SQL
    * `+` is left-associative in both Spark and DuckDB). Null/missing
    * features contribute 0 (empty documents score the bias alone). */
  def logit(features: Column, weights: Seq[Double], bias: Double): Column =
    weights.zipWithIndex.foldLeft(lit(bias): Column) { case (acc, (w, i)) =>
      acc + lit(w) * coalesce(element_at(features, i + 1), lit(0.0d))
    }

  /** Sigmoid probability. `exp` is correctly rounded to < 1 ulp in
    * practice but NOT IEEE-mandated exact — gate rows that hash against
    * an external oracle should emit the [[logit]] (exact) and threshold
    * on it; `score` is for in-engine consumption. */
  def score(features: Column, weights: Seq[Double], bias: Double): Column = {
    val z = logit(features, weights, bias)
    lit(1.0d) / (lit(1.0d) + exp(-z))
  }

  /** Trained model: weights (length d) and bias, plus the training-loss
    * trajectory (mean log-loss per iteration, recorded BEFORE that
    * iteration's step — losses(0) is the loss of the zero model). */
  final case class Model(weights: Array[Double], bias: Double, losses: Array[Double]) {
    def logitCol(features: Column): Column = logit(features, weights.toSeq, bias)
    def scoreCol(features: Column): Column = score(features, weights.toSeq, bias)
  }

  /**
   * Full-batch gradient descent on log-loss with optional L2.
   *
   * @param df        training frame
   * @param featCol   `array<double>` feature column, fixed length d
   * @param labelCol  numeric 0/1 label column
   * @param iters     gradient steps
   * @param lr        learning rate (on the MEAN gradient)
   * @param l2        L2 penalty on weights (not the bias)
   */
  def train(df: DataFrame, featCol: String, labelCol: String,
      iters: Int = 20, lr: Double = 1.0, l2: Double = 0.0): Model = {
    val d = df.select(size(col(featCol))).head().getInt(0)
    require(d > 0, s"feature column $featCol must be non-empty arrays")
    var w = Array.fill(d)(0.0)
    var b = 0.0
    val losses = Array.newBuilder[Double]
    // (features ++ [1], label) — the appended constant makes the bias
    // gradient fall out of the same per-position aggregation as the
    // weight gradients: one explode, one groupBy(pos), no second scan
    val base = df.select(
      concat(col(featCol).cast("array<double>"), array(lit(1.0d))).as("__f"),
      col(labelCol).cast("double").as("__y"))
    for (_ <- 1 to iters) {
      val p = score(col("__f"), w.toSeq, b) // __f's appended 1 rides w only up to d-1
      // residual (p - y) and per-row log-loss; clamp loss args away from
      // exact 0/1 so a perfectly-separated batch doesn't log(0)
      val loss = -(col("__y") * log(greatest(p, lit(1e-15))) +
        (lit(1.0d) - col("__y")) * log(greatest(lit(1.0d) - p, lit(1e-15))))
      val scored = base.select(col("__f"), (p - col("__y")).as("__r"), loss.as("__l"))
      // ONE aggregation: pos d is the bias slot (x == 1), pos d+1 carries
      // the loss sum and row count piggybacked as an extra exploded slot
      val rows = scored
        .select(col("__r"), col("__l"), posexplode(col("__f")))
        .groupBy(col("pos"))
        .agg(sum(col("col") * col("__r")).as("g"), sum(col("__l")).as("ls"),
          count(lit(1)).as("n"))
        .collect()
      val n = rows.head.getLong(3).toDouble
      val grad = rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
      losses += rows.head.getDouble(2) / n
      w = w.zipWithIndex.map { case (wi, i) => wi - lr * (grad(i) / n + l2 * wi) }
      b = b - lr * grad(d) / n
    }
    Model(w, b, losses.result())
  }
}
