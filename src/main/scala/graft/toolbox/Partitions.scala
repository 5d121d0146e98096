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
}
