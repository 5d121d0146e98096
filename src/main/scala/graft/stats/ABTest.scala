package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Two-proportion A/B test report: given experiment events — a unit
 * (user), its variant, and a per-row success flag — emit ONE row with
 * per-variant unit/conversion counts and the pooled two-proportion
 * z-statistic, the decision number an experimentation pipeline
 * publishes. A unit CONVERTS if any of its rows carries the flag.
 *
 * Engine-exact by the [[GroupStats.standardize]] discipline: both
 * aggregations produce exact integer counts (per-(variant, unit) max
 * flag, then per-variant sums — two map-side-combined passes, no
 * distinct aggregate), the z finishes in single-valued IEEE double
 * ops from those integers, and ships as `floor(1e6·z)` micro-units.
 * Degenerate pools (pooled rate 0 or 1 — no variance) yield a null z.
 *
 * Scale: shuffle 1 = (variant, unit) pairs (the unit-dedup — bounded
 * by units, not events); shuffle 2 = 2 variant partials; the report
 * assembly is a 2-row sort_array fold, constant. Exactly two distinct
 * variants are required — anything else raises at execution (the
 * in-plan `raise_error` guard), because silently picking two of k
 * variants would misreport the experiment.
 *
 * Output: `(variant_a, n_a, x_a, variant_b, n_b, x_b, z_micro)` —
 * variants in ascending name order (a = smaller), so the z's SIGN is
 * deterministic: positive means variant_a converts better.
 */
object ABTest {

  def twoProportions(df: DataFrame, unitCol: String, variantCol: String,
      successCol: String): DataFrame = {
    val missing = Seq(unitCol, variantCol, successCol)
      .filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns missing: ${missing.mkString(", ")}")
    val perUnit = df
      .where(col(unitCol).isNotNull && col(variantCol).isNotNull)
      .groupBy(col(variantCol).cast("string").as("__v"), col(unitCol).as("__u"))
      .agg(max(when(col(successCol).cast("boolean"), 1).otherwise(0)).as("__c"))
    val perVariant = perUnit.groupBy(col("__v"))
      .agg(count(lit(1)).as("__n"), sum(col("__c")).cast("long").as("__x"))
    val packed = perVariant
      .agg(sort_array(collect_list(struct(col("__v"), col("__n"), col("__x"))))
        .as("__s"))
      // fail loudly on != 2 variants: a silent pick-two would misreport
      .select(when(size(col("__s")) === 2, col("__s"))
        .otherwise(raise_error(concat(lit("ABTest.twoProportions requires "
          + "exactly 2 variants, got "), size(col("__s")).cast("string"))))
        .as("__s"))
    val nA = col("__s")(0)("__n").cast("double")
    val xA = col("__s")(0)("__x").cast("double")
    val nB = col("__s")(1)("__n").cast("double")
    val xB = col("__s")(1)("__x").cast("double")
    val pA = xA / nA
    val pB = xB / nB
    val pPool = (xA + xB) / (nA + nB)
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / nA + lit(1.0) / nB))
    packed.select(
      col("__s")(0)("__v").as("variant_a"),
      col("__s")(0)("__n").as("n_a"), col("__s")(0)("__x").as("x_a"),
      col("__s")(1)("__v").as("variant_b"),
      col("__s")(1)("__n").as("n_b"), col("__s")(1)("__x").as("x_b"),
      when(se > 0.0, floor(lit(1e6) * (pA - pB) / se).cast("long"))
        .as("z_micro"))
  }
}
