package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations — the contract gate a pipeline
 * runs before promoting a snapshot (the dbt-test / Great Expectations
 * shape as plain Spark plans). Every check emits the same report row
 * `(rule, n_checked, n_bad, pass)`; [[report]] unions checks into one
 * frame a scheduler can alert on.
 *
 * Scale shapes, per check family:
 *  - [[tableRules]] — ANY number of row-level predicates over one
 *    table costs ONE map-side-combined aggregation pass (a conditional
 *    sum per rule), then a constant-size explode to report rows; never
 *    one scan per rule;
 *  - [[uniqueKey]] — one key-count aggregation; n_bad counts the
 *    SURPLUS rows (total − distinct), so 0 means exactly-once keys;
 *  - [[referential]] — orphan detection as a left-anti equi-join
 *    (AQE broadcast/skew rules apply); child rows with a NULL key are
 *    excluded, the SQL FK convention — pair a `notNull` tableRule with
 *    it when nulls are themselves violations.
 *
 * Determinism: counts of exact predicates — engine-replayable by
 * construction; report ordering is the caller's (the gate sorts).
 */
object Expectations {

  private def reportRow(rule: String, nChecked: Column, nBad: Column)(df: DataFrame) =
    df.select(lit(rule).as("rule"), nChecked.as("n_checked"), nBad.as("n_bad"))
      .withColumn("pass", col("n_bad") === 0L)

  /** Row-level predicate rules over one table, ONE aggregation pass:
    * each (name, violation) pair contributes a conditional sum; the
    * violation column marks BAD rows (null predicate counts as bad —
    * an expectation that cannot be evaluated did not hold). */
  def tableRules(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_._1).distinct.size == rules.size, "rule names must be unique")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, bad), i) =>
        coalesce(sum(coalesce(bad, lit(true)).cast("long")), lit(0L)).as(s"__b_$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("rule"), col("__n").as("n_checked"), col(s"__b_$i").as("n_bad"))
      }: _*)).as("__r"))
      .select(col("__r.rule"), col("__r.n_checked"), col("__r.n_bad"))
      .withColumn("pass", col("n_bad") === 0L)
  }

  /** Exactly-once key expectation: n_bad = surplus rows beyond one per
    * distinct key combination (null key components group like values). */
  def uniqueKey(df: DataFrame, keyCols: Seq[String], rule: String): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c")), lit(0L)).as("__n"),
        coalesce(sum(col("__c") - 1L), lit(0L)).as("__bad"))
    reportRow(rule, col("__n"), col("__bad"))(counts)
  }

  /** Referential integrity: child keys with no matching parent row.
    * NULL child keys are excluded (SQL FK convention); n_checked is
    * the number of checked (non-null-key) child rows. */
  def referential(child: DataFrame, childKeys: Seq[String],
      parent: DataFrame, parentKeys: Seq[String], rule: String): DataFrame = {
    require(childKeys.nonEmpty && childKeys.size == parentKeys.size,
      s"key lists must be non-empty and equal-length (${childKeys.size}/${parentKeys.size})")
    val c = child.select(childKeys.map(col): _*)
      .where(childKeys.map(col(_).isNotNull).reduce(_ && _))
    val p = parent.select(parentKeys.zip(childKeys).map { case (pk, ck) => col(pk).as(ck) }: _*)
    val total = c.agg(count(lit(1)).as("__n"))
    val orphans = c.join(p, childKeys, "left_anti")
      .agg(coalesce(count(lit(1)), lit(0L)).as("__bad"))
    reportRow(rule, col("__n"), col("__bad"))(total.crossJoin(orphans))
  }

  /** Union of check outputs into the one report frame. */
  def report(checks: DataFrame*): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    checks.reduce(_ unionByName _)
  }
}
