package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Leave-one-out 1-NN label prediction: per labeled row, the label of
    * its nearest labeled neighbor (cosine desc, id asc — the
    * [[graft.similarity.Similarity.cosineTopK]] contract). Output:
    * `(idCol, actual, predicted)` — the (actual, predicted) frame the
    * classification metrics below consume. Null-labeled rows are
    * excluded as queries AND neighbors, same as [[knnLabelAccuracy]].
    * Eval-set-sized by design (Q·N dot products). */
  def knnPredict(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val labeled = df.where(col(labelCol).isNotNull)
    val nn = graft.similarity.Similarity
      .cosineTopK(labeled, labeled, idCol, vecCol, k = 1)
    val lbl = labeled.select(col(idCol), col(labelCol))
    nn.join(lbl.toDF("qid", "__a"), "qid")
      .join(lbl.toDF("cid", "__p"), "cid")
      .select(col("qid").as(idCol), col("__a").as("actual"),
        col("__p").as("predicted"))
  }

  /** Confusion matrix over an (actual, predicted) frame: one row per
    * observed (actual, predicted) pair with its exact count. Rows where
    * either side is NULL are excluded (an unscored prediction belongs
    * in coverage reporting, not in the matrix). Map-side-combined
    * groupBy; the shuffle carries at most |classes|² partial rows per
    * partition, so the exchange is class-bounded regardless of data
    * size — this is the safe 100 TB reduction the per-class metrics
    * below all build on. */
  def confusion(df: DataFrame, actualCol: String, predCol: String): DataFrame =
    df.where(col(actualCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(actualCol).as("actual"), col(predCol).as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 in micro-units (1e6 × value,
    * truncating division — the house fixed-point convention). One row
    * per class observed as actual OR predicted:
    * `(clazz, n_actual, tp, fp, fn, prec_micro, rec_micro, f1_micro)`;
    * a metric whose denominator is zero (class never predicted / never
    * actual) ships NULL rather than a fake 0 or 1. Identities used:
    * precision = tp/n_pred, recall = tp/n_actual,
    * F1 = 2·tp/(n_pred + n_actual) — all exact integer forms, no
    * compounding of already-truncated intermediates. Everything after
    * [[confusion]] operates on the class-bounded matrix, so the plan
    * cost is one map-side-combined groupBy over the data plus
    * class-count-sized joins. */
  def classificationReport(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val cm = confusion(df, actualCol, predCol)
    val byActual = cm.groupBy(col("actual").as("clazz"))
      .agg(sum("n").as("n_actual"),
        sum(when(col("actual") <=> col("predicted"), col("n"))
          .otherwise(0L)).as("tp"))
    val byPred = cm.groupBy(col("predicted").as("clazz"))
      .agg(sum("n").as("n_pred"))
    byActual.join(byPred, Seq("clazz"), "full_outer")
      .select(col("clazz"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fp"),
        (coalesce(col("n_actual"), lit(0L)) - coalesce(col("tp"), lit(0L)))
          .as("fn"),
        coalesce(col("n_pred"), lit(0L)).as("__np"))
      .select(col("clazz"), col("n_actual"), col("tp"), col("fp"), col("fn"),
        when(col("__np") > 0, expr("(tp * 1000000L) div __np"))
          .as("prec_micro"),
        when(col("n_actual") > 0, expr("(tp * 1000000L) div n_actual"))
          .as("rec_micro"),
        when(col("__np") + col("n_actual") > 0,
          expr("(2L * tp * 1000000L) div (__np + n_actual)"))
          .as("f1_micro"))
  }

  /** Cohen's kappa — chance-corrected inter-rater / model-vs-gold
    * agreement. Single row
    * `(n, n_agree, po_micro, pe_micro, kappa_micro)` with
    * po = agree/n, pe = Σ_c rowmarg_c·colmarg_c / n², and
    * kappa = (po − pe)/(1 − pe), each in truncating micro-units;
    * kappa_micro is NULL when pe_micro = 1e6 (degenerate single-class
    * frame, kappa undefined). Both engines truncate integral division
    * toward zero, so negative kappa (agreement below chance) replays
    * exactly. The pe term computes n² in a long: the harness is bounded
    * at n ≤ 3·10⁶ pairs — an EVAL-set harness (human-labeled slices),
    * not a corpus aggregate, same positioning as [[knnLabelAccuracy]] —
    * and the bound is ENFORCED with an in-plan raise_error (the
    * [[graft.stats.GroupStats.standardize]] fail-loudly convention):
    * past it, pe_num·1e6 would silently wrap and ship a wrong kappa.
    * Plan shape: one confusion groupBy over the data, then
    * class-count-sized marginal joins and 1-row crossJoins. */
  def cohenKappa(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val cm = confusion(df, actualCol, predCol)
    // n ≤ 3e6 keeps every long exact: pe_num ≤ n² ≤ 9e12, ·1e6 ≤ 9e18
    // < Long.Max (9.22e18); n·n likewise
    val nOk = when(col("n") > 3000000L,
      raise_error(concat(lit("Eval.cohenKappa: n = "), col("n").cast("string"),
        lit(" exceeds the exact-arithmetic bound of 3e6 pairs " +
          "(pe_num * 1e6 would overflow long) — kappa is an eval-set " +
          "metric; subsample the frame"))))
      .otherwise(col("n"))
    val totals = cm.agg(sum("n").as("n"),
      sum(when(col("actual") <=> col("predicted"), col("n")).otherwise(0L))
        .as("n_agree"))
      .select(nOk.as("n"), col("n_agree"))
    // inner join: a class missing on either side contributes a zero
    // product to pe, so dropping it is exact
    val peNum = cm.groupBy(col("actual").as("k")).agg(sum("n").as("rm"))
      .join(cm.groupBy(col("predicted").as("k")).agg(sum("n").as("pm")), "k")
      .agg(coalesce(sum(col("rm") * col("pm")), lit(0L)).as("pe_num"))
    totals.crossJoin(peNum)
      .select(col("n"), col("n_agree"),
        expr("(n_agree * 1000000L) div n").as("po_micro"),
        expr("(pe_num * 1000000L) div (n * n)").as("pe_micro"))
      .select(col("n"), col("n_agree"), col("po_micro"), col("pe_micro"),
        when(col("pe_micro") =!= 1000000L,
          expr("((po_micro - pe_micro) * 1000000L) div (1000000L - pe_micro)"))
          .as("kappa_micro"))
  }

  /** Exact ROC-AUC by the Mann-Whitney rank statistic, with the
    * standard average-rank tie correction:
    * AUC = (Σ_{pos} avgrank − P(P+1)/2) / (P·N). Works on an INTEGRAL
    * score column (quality scores in this library already ship in
    * micro-units) and a 0/1 label column; rows with a NULL on either
    * are excluded. Single output row `(n_pos, n_neg, auc_micro)`;
    * auc_micro is NULL when either class is empty (AUC undefined).
    *
    * Scale shape: the data-sized pass is ONE map-side-combined
    * groupBy(score) — the rank window then runs over the DISTINCT-SCORE
    * table only (2·avgrank = 2·cum_before + c + 1 per tie group), so no
    * corpus-sized global sort ever happens; a 10¹⁰-row frame with 10⁵
    * distinct scores ranks 10⁵ rows. The closing arithmetic keeps
    * everything in longs: exact for n ≤ 2·10⁶ per class at micro-unit
    * output scale — ENFORCED in-plan (raise_error) like [[cohenKappa]],
    * as is the 0/1 label contract: a stray label value (2, -1, a
    * multiclass column passed by mistake) would otherwise be silently
    * counted as a negative and ship a plausible-but-meaningless AUC
    * (the [[graft.stats.ABTest.twoProportions]] variant-count
    * convention — fail loudly, never guess). */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val g = df.where(col(labelCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("c"),
        sum(when(col(labelCol) === 1, 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol) =!= 0 && col(labelCol) =!= 1, 1L)
          .otherwise(0L)).as("__bad"))
    val w = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    // exact-arithmetic bound: sum2 ≤ P·2n ≤ 2n², and (sum2−P(P+1))·1e6
    // must fit a long → n ≤ ~2e6 rows keeps the numerator < 9.2e18
    g.withColumn("cb", coalesce(sum("c").over(w), lit(0L)))
      // sum2 = 2·Σ_{pos} avgrank: each of the p positives in a tie
      // group of size c starting after cb rows has avgrank
      // cb + (c+1)/2, so 2·avgrank = 2·cb + c + 1
      .agg(sum(col("p")).as("n_pos"),
        sum(col("c") - col("p")).as("n_neg"),
        sum(col("p") * (lit(2L) * col("cb") + col("c") + lit(1L)))
          .as("__sum2"),
        sum(col("__bad")).as("__nbad"))
      .select(
        when(col("__nbad") > 0,
          raise_error(concat(lit("Eval.rocAuc: "), col("__nbad").cast("string"),
            lit(" label value(s) outside {0, 1} — rocAuc is a binary " +
              "metric; binarize the label column first"))))
          .otherwise(
            when(col("n_pos") + col("n_neg") > 2000000L,
              raise_error(concat(lit("Eval.rocAuc: n = "),
                (col("n_pos") + col("n_neg")).cast("string"),
                lit(" exceeds the exact-arithmetic bound of 2e6 rows " +
                  "(the rank numerator * 1e6 would overflow long) — " +
                  "subsample the eval frame"))))
              .otherwise(col("n_pos"))).as("n_pos"),
        col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("((__sum2 - n_pos * (n_pos + 1L)) * 1000000L)" +
            " div (2L * n_pos * n_neg)")).as("auc_micro"))
  }
}
