package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit
import graft.ml.Logistic

class LogisticSpec extends AnyFlatSpec with Matchers {
  import SparkTestKit.spark
  import spark.implicits._

  behavior of "Logistic"

  // linearly separable: label = x0 > 0.5, with x1 pure noise
  private lazy val separable = (0 until 200).map { i =>
    val x0 = (i % 100) / 100.0
    val x1 = ((i * 37) % 100) / 100.0
    (Array(x0, x1), if (x0 > 0.5) 1.0 else 0.0)
  }.toDF("f", "y").cache()

  it should "drive training loss down and separate the separable" in {
    val m = Logistic.train(separable, "f", "y", iters = 50, lr = 2.0)
    m.losses.head shouldBe math.log(2.0) +- 1e-9 // zero model on balanced labels
    m.losses.last should be < m.losses.head / 2
    // the signal feature dominates the noise feature
    math.abs(m.weights(0)) should be > 5 * math.abs(m.weights(1))
    m.weights(0) should be > 0.0
    // training accuracy
    val scored = separable.select(col("y"),
      (m.scoreCol(col("f")) >= 0.5).cast("double").as("p"))
    val acc = scored.where(col("y") === col("p")).count().toDouble / 200
    acc should be >= 0.95
  }

  it should "match a driver-side gradient-descent replay bit-for-bit-ish" in {
    // same GD, computed locally: pins the distributed gradient aggregation
    // (map-side-combined sums) to the mathematical definition
    val data = separable.as[(Array[Double], Double)].collect()
    var w = Array(0.0, 0.0); var b = 0.0
    for (_ <- 1 to 5) {
      val grads = Array(0.0, 0.0); var gb = 0.0
      for ((f, y) <- data) {
        val p = 1.0 / (1.0 + math.exp(-(b + w(0) * f(0) + w(1) * f(1))))
        val r = p - y
        grads(0) += f(0) * r; grads(1) += f(1) * r; gb += r
      }
      val n = data.length.toDouble
      w = Array(w(0) - 2.0 * grads(0) / n, w(1) - 2.0 * grads(1) / n)
      b = b - 2.0 * gb / n
    }
    val m = Logistic.train(separable, "f", "y", iters = 5, lr = 2.0)
    m.weights(0) shouldBe w(0) +- 1e-9 // fp summation-order tolerance
    m.weights(1) shouldBe w(1) +- 1e-9
    m.bias shouldBe b +- 1e-9
  }

  it should "score the bias alone for null/empty feature slots" in {
    val df = Seq(
      (1L, Array[Double](0.3, 0.4)),
      (2L, null.asInstanceOf[Array[Double]])).toDF("id", "f")
    val out = df.select(col("id"),
      Logistic.logit(col("f"), Seq(1.0, 1.0), bias = -2.0).as("z"))
      .as[(Long, Double)].collect().toMap
    out(1L) shouldBe (-2.0 + 0.3 + 0.4) +- 1e-12
    out(2L) shouldBe -2.0 +- 1e-12 // null array -> all features coalesce to 0
  }

  it should "apply L2 shrinkage to weights but not the bias" in {
    val plain = Logistic.train(separable, "f", "y", iters = 10, lr = 1.0)
    val ridge = Logistic.train(separable, "f", "y", iters = 10, lr = 1.0, l2 = 0.5)
    math.abs(ridge.weights(0)) should be < math.abs(plain.weights(0))
  }
}
