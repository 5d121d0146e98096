package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed-table layout: pre-shuffle a table ONCE at write time so
 * every later equi-join or aggregation on the bucket keys runs with
 * NO exchange at read time. At 100 TB this is the single biggest
 * shuffle lever an analytics pipeline has — a fact table joined
 * against its dimensions every day pays the partitioning shuffle one
 * time instead of per query; two tables bucketed the same way
 * sort-merge-join scan-to-scan.
 *
 * Spark-first: this is Spark's own data-source bucketing
 * (`bucketBy`/`sortBy` + `saveAsTable`), not a custom layout — the
 * scan reports `HashPartitioning(keys, n)` and Catalyst's
 * `EnsureRequirements` drops the exchange on its own. The helpers here
 * add the three things the raw API leaves to the caller:
 *
 *  - **one file per bucket**: the writer is preceded by
 *    `repartition(numBuckets, keys)` — Spark's bucket id and its
 *    shuffle hash are the same Murmur3 `pmod`, so shuffle partition i
 *    holds exactly bucket i and each bucket lands in ONE file. Without
 *    this, T writer tasks can emit T files per bucket, and the read
 *    side loses the per-bucket sort guarantee (Spark only trusts
 *    `sortBy` order for single-file buckets) — the sort-merge join
 *    would re-sort what the writer already sorted.
 *  - **explicit location**: tables are written as EXTERNAL at `path`
 *    (a bucketed layout is a long-lived artifact; where it lives
 *    should be the caller's decision, not the warehouse default's).
 *  - **a validated co-located join**: [[colocatedJoin]] refuses to run
 *    unless both sides are bucketed on the join keys with the SAME
 *    bucket count — the silent failure mode of bucketing is a config
 *    drift (8 vs 16 buckets, key order, a re-write that dropped the
 *    spec) that quietly reintroduces the full shuffle.
 *
 * Scale notes: pick `numBuckets` so one bucket of the LARGER table
 * fits an executor's task comfortably (bucket count is fixed at write
 * time — size for the table's growth horizon); bucket-pruning applies
 * on point lookups (`spark.sql.sources.bucketing.enabled`); AQE
 * cannot split a skewed bucket (no exchange to re-plan), so heavily
 * skewed keys belong in a salted or broadcast plan instead — measure
 * with [[graft.stats.GroupStats.topValues]] first.
 */
object Bucketed {

  /** Write `df` as an external parquet table bucketed (and per-bucket
    * sorted) on `keys`, one file per bucket; replaces `table`.
    *
    * Write-then-swap: the data lands under a STAGING catalog name
    * first; only after the write succeeds is the previous `table`
    * registration dropped and the staging entry renamed over it — a
    * failed write leaves the existing registration (a long-lived
    * artifact) untouched. Caveat the caller owns: the BYTES at `path`
    * are overwritten eagerly, so a true full swap needs a fresh path
    * per rewrite — which is exactly what [[Compact.compactBucketed]]
    * does (rewrite to a new location, then swap, old location returned
    * for vacuuming). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keys: Seq[String], numBuckets: Int): Unit = {
    require(keys.nonEmpty, "at least one bucket key required")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val missing = keys.filterNot(df.columns.contains)
    require(missing.isEmpty, s"bucket keys missing from input: ${missing.mkString(", ")}")
    val spark = df.sparkSession
    val staging = table + "__staged"
    spark.sql(s"DROP TABLE IF EXISTS `$staging`")
    df.repartition(numBuckets, keys.map(col): _*)
      .write.format("parquet").option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite").saveAsTable(staging)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(s"ALTER TABLE `$staging` RENAME TO `$table`")
  }

  /** The (numBuckets, bucketKeys) spec of a catalog table, if bucketed. */
  def bucketSpecOf(spark: SparkSession, table: String): Option[(Int, Seq[String])] = {
    val catalog = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    catalog.getTableMetadata(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(s => (s.numBuckets, s.bucketColumnNames.toSeq))
  }

  /**
   * Equi-join two bucketed tables on `keys` with the exchange-free
   * plan GUARANTEED by construction: both sides must be bucketed on
   * exactly `keys` with the same bucket count (else
   * IllegalArgumentException — fail loudly, never silently shuffle).
   * Broadcast is disabled for this join (a broadcast would hide a
   * broken layout behind a small test side); `joinType` as in
   * `DataFrame.join`.
   */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, keys: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "at least one join key required")
    def spec(t: String) = bucketSpecOf(spark, t).getOrElse(
      throw new IllegalArgumentException(s"table `$t` is not bucketed"))
    val (ln, lk) = spec(leftTable)
    val (rn, rk) = spec(rightTable)
    require(ln == rn, s"bucket counts differ: `$leftTable`=$ln, `$rightTable`=$rn " +
      "— the join would reintroduce a full exchange; rewrite one side")
    require(lk == keys && rk == keys,
      s"join keys $keys must equal both bucket specs (left=$lk, right=$rk)")
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), keys, joinType)
  }
}
