package graft.pipeline

import graft.SparkTestKit
import graft.SparkTestKit.assertDataFrameEquals
import graft.ml.{Logistic, ModelStore}
import graft.similarity.{ProductQuantizer, Similarity}
import graft.text.NgramLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persistence round-trips for every trained-state artifact: serve-with-
  * reloaded-state must equal serve-with-fresh-state (bit-exact where the
  * state is doubles — parquet round-trips IEEE doubles exactly). */
class ModelStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestKit.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-spec-$tag-").toString

  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)), (4L, Seq(0.0f, 0.9f, 0.1f, 0.0f)),
    (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f)), (6L, Seq(0.0f, 0.0f, 0.9f, 0.1f)),
    (7L, Seq(0.0f, 0.0f, 0.0f, 1.0f)), (8L, Seq(0.1f, 0.0f, 0.0f, 0.9f)),
  ).toDF("vec_id", "embedding")

  test("IVF centroids round-trip: reloaded serving equals fresh serving") {
    val cents = Similarity.trainCentroids(vecs, "vec_id", "embedding", nlist = 4, iters = 2)
    val path = tmp("ivf")
    ModelStore.saveCentroids(cents, path)
    val reloaded = ModelStore.loadCentroids(spark, path)
    // state itself round-trips exactly (value compare — parquet widens
    // the array's containsNull flag, which serving doesn't care about)
    assert(reloaded.orderBy("cell").collect().map(_.toSeq).toSeq ==
      cents.orderBy("cell").collect().map(_.toSeq).toSeq)
    // ...and so does the query result served from it
    val q = vecs.where(col("vec_id") <= 2)
    assertDataFrameEquals(
      Similarity.ivfTopKWith(q, vecs, reloaded, "vec_id", "embedding", k = 3, nprobe = 4),
      Similarity.ivfTopKWith(q, vecs, cents, "vec_id", "embedding", k = 3, nprobe = 4))
  }

  test("PQ codebooks round-trip: shape derived from rows, contents bit-exact") {
    val cb = ProductQuantizer.train(vecs, "vec_id", "embedding", m = 2, ksub = 4, iters = 2)
    val path = tmp("pq")
    ModelStore.savePq(spark, cb, path)
    val re = ModelStore.loadPq(spark, path)
    assert(re.dim == cb.dim && re.m == cb.m && re.ksub == cb.ksub)
    for (j <- 0 until cb.m; c <- 0 until cb.ksub)
      assert(re.cents(j)(c).sameElements(cb.cents(j)(c)),
        s"codebook cell ($j, $c) changed across save/load")
    val q = vecs.where(col("vec_id") <= 2)
    assertDataFrameEquals(
      ProductQuantizer.topK(q, vecs, "vec_id", "embedding", k = 3, re, shortlist = 100),
      ProductQuantizer.topK(q, vecs, "vec_id", "embedding", k = 3, cb, shortlist = 100))
  }

  test("PQ load rejects a sparse artifact") {
    val path = tmp("pq-sparse")
    Seq((0, 0, Seq(1.0, 2.0)), (1, 1, Seq(3.0, 4.0)))
      .toDF("j", "code", "cent").write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException](ModelStore.loadPq(spark, path))
    assert(e.getMessage.contains("sparse"))
  }

  test("bigram LM round-trip: reloaded scores equal fresh scores, V derived") {
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the log"),
      (3L, "a rare token here"), (4L, "the cat ran")).toDF("doc_id", "text")
    val lm = NgramLm.train(docs, "text", minCount = 2L)
    val path = tmp("lm")
    ModelStore.saveBigramLm(lm, path)
    val re = ModelStore.loadBigramLm(spark, path)
    // count tables round-trip exactly (multiset compare)
    assertDataFrameEquals(re.vocab, lm.vocab)
    assertDataFrameEquals(re.bigrams, lm.bigrams)
    assertDataFrameEquals(re.contexts, lm.contexts)
    assertDataFrameEquals(re.vocabSizeRow, lm.vocabSizeRow)
    // scoring is integer micro-nat arithmetic — reloaded == fresh exactly
    assertDataFrameEquals(
      NgramLm.score(docs, "doc_id", "text", re),
      NgramLm.score(docs, "doc_id", "text", lm))
  }

  test("logistic model round-trip: weights, bias and loss trajectory bit-exact") {
    val train = Seq(
      (Seq(0.9, 0.1), 1), (Seq(0.8, 0.3), 1), (Seq(0.7, 0.2), 1),
      (Seq(0.1, 0.9), 0), (Seq(0.2, 0.8), 0), (Seq(0.3, 0.7), 0),
    ).toDF("f", "y")
    val m = Logistic.train(train, "f", "y", iters = 5, lr = 0.5)
    val path = tmp("logit")
    ModelStore.saveLogistic(spark, m, path)
    val re = ModelStore.loadLogistic(spark, path)
    assert(re.weights.sameElements(m.weights), "weights changed across save/load")
    assert(re.bias == m.bias, "bias changed across save/load")
    assert(re.losses.sameElements(m.losses), "loss trajectory changed across save/load")
    // the reloaded model builds the SAME literal expression, so scoring
    // matches bit-for-bit
    assertDataFrameEquals(
      train.select(round(re.logitCol(col("f")), 12).as("z")),
      train.select(round(m.logitCol(col("f")), 12).as("z")))
  }

  test("logistic load rejects a gappy weight series") {
    val path = tmp("logit-bad")
    Seq(("w", 0, 1.0), ("w", 2, 2.0), ("b", 0, 0.5))
      .toDF("kind", "idx", "value").write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException](ModelStore.loadLogistic(spark, path))
    assert(e.getMessage.contains("non-contiguous"))
  }

  test("BPE merges.txt export/import: interop text artifact serves identically") {
    val docs = Seq((1L, "ab ab abc abcd"), (2L, "ab abc abc xyz"))
      .toDF("doc_id", "text")
    val merges = graft.text.Bpe.train(docs, "text", rounds = 4)
    assert(merges.nonEmpty)
    val path = tmp("bpe-txt") + "/merges.txt"
    ModelStore.exportBpeMerges(spark, merges, path)
    // the artifact is the GPT-2 text layout: header + rank-ordered pairs
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).toArray.map(_.toString).toSeq
    assert(lines.head == "#version: 0.2")
    assert(lines.size == merges.size + 1)
    assert(lines.tail.forall(l => l.count(_ == ' ') == 1))
    val re = ModelStore.importBpeMerges(spark, path)
    // ranks and pairs round-trip (counts don't travel: 0 by contract)
    assert(re.map(m => (m.rank, m.left, m.right)) ==
      merges.sortBy(_.rank).map(m => (m.rank, m.left, m.right)))
    assert(re.forall(_.count == 0L))
    // serving from the imported table equals serving from the fresh one
    assertDataFrameEquals(
      docs.select(col("doc_id"), graft.text.Bpe.tokenCount(col("text"), re).as("n")),
      docs.select(col("doc_id"), graft.text.Bpe.tokenCount(col("text"), merges).as("n")))
  }

  test("merges.txt import rejects malformed pair lines") {
    val path = tmp("bpe-bad") + "/merges.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "#version: 0.2\na b c\n".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](ModelStore.importBpeMerges(spark, path))
    assert(e.getMessage.contains("single 'left right' pair"))
  }
}
