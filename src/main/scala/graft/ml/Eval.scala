package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding-quality evaluation harness. An embedding pipeline needs a
 * number that says whether today's vectors are better than
 * yesterday's BEFORE they reach the index: leave-one-out 1-NN label
 * agreement is the classic probe (a vector should sit nearest to its
 * own class), and per-class reporting exposes the label a regression
 * hides inside a global average.
 *
 * Determinism: the neighbor is [[graft.similarity.Similarity
 * .cosineTopK]]'s rank 1 (cos_r6 desc, id asc — self-pairs excluded by
 * that operator's contract), counts are exact integers, and the
 * accuracy ships in 1e6-units via truncating division (the micro-unit
 * convention) — no engine-variant doubles in the output.
 *
 * Scale: inherits cosineTopK's layout — the eval set is broadcast as
 * the query side, candidates never shuffle, and the per-query cut is
 * the bounded top-k aggregate. The Q·N dot products make this the
 * EVAL-SET-sized harness it is everywhere (thousands of labeled rows,
 * not the corpus); corpus-scale sweeps should feed the same label
 * join + agreement aggregate from [[graft.similarity.Similarity
 * .ivfTopKWith]] output instead.
 */
object Eval {

  /** Per-label leave-one-out 1-NN agreement. Output:
    * `(labelCol, n, n_correct, acc_micro)` — acc_micro =
    * (n_correct·1e6) div n. Rows with a NULL label are excluded as
    * queries AND as neighbors (an unlabeled row can neither score nor
    * vouch). */
  def knnLabelAccuracy(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val labeled = df.where(col(labelCol).isNotNull)
    val nn = graft.similarity.Similarity
      .cosineTopK(labeled, labeled, idCol, vecCol, k = 1)
    val lbl = labeled.select(col(idCol), col(labelCol))
    nn.join(lbl.toDF("qid", "__q_label"), "qid")
      .join(lbl.toDF("cid", "__n_label"), "cid")
      .groupBy(col("__q_label"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__q_label") <=> col("__n_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("__q_label").as(labelCol), col("n"), col("n_correct"),
        expr("(n_correct * 1000000L) div n").as("acc_micro"))
  }
}
