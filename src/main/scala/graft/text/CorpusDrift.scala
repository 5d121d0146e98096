package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus drift report — the monitoring pass a continuously-fed training
 * pipeline runs between snapshot A (yesterday's corpus / the reference
 * mix) and snapshot B (today's): how far has the token distribution
 * moved, and which regions of feature space moved it?
 *
 * Features are hashed unigram (by default) buckets via the codegen'd
 * [[graft.functions.Md5Lower64]] (`md5_number_lower % B`, power-of-two
 * B — the [[graft.curation.Sampling.importanceWeights]] machinery), so
 * the report is corpus-vocabulary-independent: fixed B rows however
 * large the corpora. Probabilities are add-one smoothed,
 * `pX_b = (cX_b + 1) / (totX + B)`.
 *
 * Determinism: every emitted number is either an exact integer or the
 * single IEEE division/conversion of exact integers — per-bucket log
 * ratios round to micro-nat LONGS before any summation (the
 * [[NgramLm]] contract), KL aggregates integer products and divides
 * once with half-away-from-zero integer rounding, TVD sums exact
 * integer numerators as longs. An external SQL engine replays the
 * whole report bit-for-bit.
 *
 * Scale shape: two map-side-combined bucket-count aggregations (each
 * collapses to <= B rows before any join), a B-row outer join, 1-row
 * totals riding broadcast crossJoins, one final 1-row aggregate.
 * Nothing corpus-sized ever shuffles beyond the count partials.
 */
object CorpusDrift {

  private def bucketCounts(df: DataFrame, textCol: String,
      buckets: Int, ns: Seq[Int]): DataFrame = {
    import graft.functions.{Md5Lower64, WordShingles}
    val gs = ns.map(n => WordShingles.wordGrams(col(textCol), n))
    val cat = if (gs.size == 1) gs.head else concat(gs: _*)
    df.select(explode(cat).as("__g"))
      .select(pmod(Md5Lower64.md5Lower64(col("__g")), lit(buckets.toLong)).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
  }

  /**
   * Per-bucket drift rows for buckets present in EITHER snapshot:
   * `(bucket, c_a, c_b, lr_micro)` — counts plus the micro-nat
   * add-one-smoothed log ratio `ln(pA_b / pB_b)`. Positive `lr_micro` =
   * the bucket lost mass in B (shrinking domain), negative = B grew it.
   * Top-|lr| rows localize the drift.
   */
  def report(a: DataFrame, aTextCol: String, b: DataFrame, bTextCol: String,
      buckets: Int = 4096, ns: Seq[Int] = Seq(1)): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    require(ns.nonEmpty && ns.forall(_ >= 1) && ns.distinct.size == ns.size,
      s"gram sizes must be distinct positive ints, got ${ns.mkString(",")}")
    val B = buckets.toLong
    val ca = bucketCounts(a, aTextCol, buckets, ns)
      .withColumnsRenamed(Map("__b" -> "bucket", "__c" -> "c_a"))
    val cb = bucketCounts(b, bTextCol, buckets, ns)
      .withColumnsRenamed(Map("__b" -> "bucket", "__c" -> "c_b"))
    val totA = ca.agg(coalesce(sum(col("c_a")), lit(0L)).as("__totA"))
    val totB = cb.agg(coalesce(sum(col("c_b")), lit(0L)).as("__totB"))
    ca.join(cb, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .crossJoin(broadcast(totA)).crossJoin(broadcast(totB))
      .select(col("bucket"), col("c_a"), col("c_b"),
        round(log(((col("c_a") + 1L) * (col("__totB") + B)).cast("double")
          / ((col("__totA") + B) * (col("c_b") + 1L)).cast("double")) * 1e6)
          .cast("long").as("lr_micro"))
  }

  /**
   * One-row drift summary: `(n_grams_a, n_grams_b, kl_ab_micro,
   * tvd_num, tvd_r6)` — gram totals, `KL(A || B)` in micro-nats
   * (integer: Σ (c_a+1)·lr_micro over ALL B buckets — absent buckets
   * contribute the uniform smoothing term — divided once by
   * (totA + B) with half-away-from-zero rounding), the exact integer
   * total-variation numerator `Σ |(c_a+1)(totB+B) − (c_b+1)(totA+B)|`,
   * and the derived `tvd_r6 = round(tvd_num / (2·(totA+B)·(totB+B)),
   * 6)` total-variation distance.
   */
  def summary(a: DataFrame, aTextCol: String, b: DataFrame, bTextCol: String,
      buckets: Int = 4096, ns: Seq[Int] = Seq(1)): DataFrame = {
    val B = buckets.toLong
    val rep = report(a, aTextCol, b, bTextCol, buckets, ns)
    // totals are re-derivable from the report itself (Σ c_x over present
    // buckets IS the gram total); the per-row tvd term needs them
    // alongside each bucket row — broadcast 1-row aggregates joined in
    val ta0 = rep.agg(coalesce(sum(col("c_a")), lit(0L)).as("ta0"))
    val tb0 = rep.agg(coalesce(sum(col("c_b")), lit(0L)).as("tb0"))
    val withTot = rep.crossJoin(broadcast(ta0)).crossJoin(broadcast(tb0))
    val agg = withTot.agg(
      max(col("ta0")).as("ta"), max(col("tb0")).as("tb"),
      coalesce(sum((col("c_a") + 1L) * col("lr_micro")), lit(0L)).as("klp"),
      coalesce(sum(abs((col("c_a") + 1L) * (col("tb0") + B)
        - (col("c_b") + 1L) * (col("ta0") + B))), lit(0L)).as("tvp"),
      count(lit(1)).as("npresent"))
    agg.select(col("ta").as("n_grams_a"), col("tb").as("n_grams_b"),
        col("klp"), col("tvp"), col("npresent"), col("ta"), col("tb"))
      .withColumn("__nabsent", lit(B) - col("npresent"))
      // absent-bucket lr: same composite expression at c_a = c_b = 0
      .withColumn("__lr0",
        round(log((col("tb") + B).cast("double") / (col("ta") + B).cast("double")) * 1e6)
          .cast("long"))
      .withColumn("__klnum", col("klp") + col("__nabsent") * col("__lr0"))
      .withColumn("__kld", (col("ta") + B) * 2L)
      // half-away-from-zero integer division (the NgramLm trick)
      .withColumn("kl_ab_micro",
        when(col("__klnum") >= 0L,
          expr("(__klnum * 2 + (ta + " + B + ")) DIV __kld"))
          .otherwise(-expr("((-__klnum) * 2 + (ta + " + B + ")) DIV __kld")))
      .withColumn("tvd_num",
        col("tvp") + col("__nabsent") * abs(col("tb") - col("ta")))
      .withColumn("tvd_r6",
        round(col("tvd_num").cast("double")
          / (lit(2.0) * (col("ta") + B).cast("double") * (col("tb") + B).cast("double")), 6))
      .select(col("n_grams_a"), col("n_grams_b"), col("kl_ab_micro"),
        col("tvd_num"), col("tvd_r6"))
  }
}
