package graft.toolbox

import org.apache.spark.sql.DataFrame

/**
 * Partition-count hygiene for COMPUTE-bound stages.
 *
 * Spark sizes partitions by BYTES everywhere: scans split files by
 * `maxPartitionBytes`/`openCostInBytes`, and AQE coalesces post-shuffle
 * partitions toward `advisoryPartitionSizeInBytes`. For the pairwise
 * kernels (brute-force cosine top-k, PQ/ADC scans, all-pairs
 * verification, semantic-dedup assignment) the per-ROW work dwarfs the
 * per-BYTE work, so a byte-small input — one sub-4 MB parquet file, or
 * a sub-advisory exchange — serializes an O(N·Q) scan onto ONE task
 * while every other core idles. Measured on the 32-core bench session:
 * graph_triangles' exact-cosine pair scan ran as a single task of ~4 s
 * pure CPU (three times over, see Triangles) with 31 cores idle.
 *
 * [[spreadCompute]] floors the partition count of such a kernel's
 * stream side at the session default parallelism. At production scale
 * this is a structural no-op — a real table arrives in at least as many
 * splits as the cluster has cores — so the pairwise operators'
 * "candidates never shuffle" contract is preserved exactly where it
 * matters; only under-split inputs pay one round-robin exchange of the
 * N rows, which the parallelized O(N·Q) scan repays immediately.
 *
 * Caller contract: the frame must be SCAN-ROOTED (projections/filters
 * over a read, no Exchange). For exchange-bearing frames the helper
 * returns the input unchanged — their partitioning is AQE's runtime
 * decision, and inspecting `.rdd` there would materialize query stages.
 */
object Partitions {
  /** Note: inspecting the physical plan and `.rdd` here forces eager
    * analysis + physical planning of `df` at COMPOSITION time (including
    * driver-side file listing for scan-rooted frames), and the partition
    * decision is frozen before execution — analysis errors surface at
    * builder time, not action time. Acceptable for the scan-rooted
    * kernels this serves; do not wrap exchange-bearing frames (the guard
    * below returns them unchanged for exactly that reason). */
  def spreadCompute(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (want <= 1) return df
    val hasExchange = df.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
    // .rdd on an exchange-free plan compiles the subtree but runs no
    // job; the returned frame builds on the original logical plan
    if (!hasExchange && df.rdd.getNumPartitions < want) df.repartition(want)
    else df
  }

  /** Exchange-side twin of [[spreadCompute]] for compute-heavy stages
    * DOWNSTREAM of a shuffle (pair-verify joins and the like): AQE sizes
    * post-shuffle partitions by BYTES, so a byte-small but
    * per-row-expensive stage collapses onto 1-2 tasks while the other
    * cores idle. Round-robin-repartitions `df` to defaultParallelism —
    * but ONLY when the operator's SCAN-ROOTED input `gauge` arrives in
    * fewer splits than the session has cores (the [[spreadCompute]]
    * small-input signal: the stage's volume is proportional to the
    * corpus, and a real-scale corpus arrives in ≥ cores splits). At
    * scale this is a structural no-op, so it can never cap a
    * production-scale stage at core count or add a payload shuffle.
    * `gauge` must be exchange-free; exchange-bearing gauges return `df`
    * unchanged (conservative).
    *
    * Round-robin, not keyed: a keyed repartition matching the upstream
    * aggregate's (key, numPartitions) is ELIDED by EnsureRequirements
    * and the surviving ENSURE_REQUIREMENTS exchange is AQE-coalesced
    * right back to 1 task (measured, r15). A session-level variant
    * (adaptive.coalescePartitions.minPartitionSize 1m → 64k) won
    * 0.4-0.5 s on single-pass retrieval queries but cost the iterative
    * operators more (per-round task overhead on ~50 KB state tables) —
    * hence this per-operator form instead of a session constant. */
  def floorWidth(df: DataFrame, gauge: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (want <= 1) return df
    val gaugeHasExchange = gauge.queryExecution.sparkPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange])
    if (!gaugeHasExchange && gauge.rdd.getNumPartitions < want)
      df.repartition(want)
    else df
  }
}
