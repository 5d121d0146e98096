package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Md5Lower64

/**
 * Deterministic pseudo-random walks over a directed edge list — the
 * sequence generator feeding graph-embedding training (DeepWalk /
 * node2vec corpora) and graph-sampling estimators, with the library's
 * no-RNG discipline: step t of walk (start, j) at node u moves to u's
 * neighbor at index
 *
 *   idx = (h32 · deg(u)) div 2³²,
 *   h32 = md5_lower64(walkId ∥ ':' ∥ t ∥ ':' ∥ u) pmod 2³²
 *
 * — a pure function of (walk, step, node), so every engine, every
 * re-run, and every incremental batch generates THE SAME walks (the
 * hashSample convention lifted to sequences). `pmod` by the
 * power-of-two 2³² is exactly DuckDB's unsigned `md5_number_lower % 2³²`
 * (2⁶⁴ ≡ 0 mod 2³² cancels the signed reinterpretation), and the
 * scaled division maps the 32-bit uniform into [0, deg) identically in
 * both engines (integer ops on non-negative values; deg < 2³¹ keeps
 * the product inside a long). Neighbor index = ascending-dst rank, so
 * the mapping is unambiguous; duplicate edges deduplicate. A walk
 * reaching a node with no out-neighbors STOPS (emits no further rows).
 *
 * Scale shape: state rows are slim (walk_id, start, cur); each step is
 * ONE equi-join of the state rows against the node-keyed adjacency-LIST
 * snapshot (one array row per source, materialized once — [[PageRank]]'s
 * snapshot discipline) plus an O(1) `element_at`; deg is
 * `cardinality(nbrs)` off the same row — O(walks) rows move per step,
 * O(E) once for the snapshot, O(steps·walks) total. Nothing is ever
 * quadratic and no RNG state lives on the driver. Hub caveat: a node's
 * out-neighborhood is one array row (per-row memory ∝ max degree) —
 * cap or pre-split celebrity nodes upstream on power-law graphs (see
 * the in-code note at the snapshot). The default `materialize`
 * (localCheckpoint) is executor-local and non-recomputable: on
 * clusters with executor churn pass `_.checkpoint(eager = true)`.
 */
object Walks {

  /** `walksPerNode` walks of `steps` steps from every node with at
    * least one out-neighbor. Output: (walk_id, start, step, node) —
    * step 0 is the start node itself; walk_id = "start#j". */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
      steps: Int, walksPerNode: Int = 1,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    require(walksPerNode >= 1, s"walksPerNode must be >= 1, got $walksPerNode")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // adjacency LIST: one row per source, out-neighbors ascending.
    // The step becomes one slim equi-join on the node id plus an O(1)
    // element_at — the previous edge-row layout joined on the key PAIR
    // (src, idx), which re-shuffled the whole O(E) adjacency snapshot
    // every step; this snapshot shuffles once and each step moves only
    // the O(walks) state rows (r14). Neighbor index = ascending-dst
    // rank, exactly the old row_number()-1 ordering, so the walks are
    // bit-identical. deg = cardinality(nbrs) replaces the separate
    // degree table (one snapshot instead of two). Hub caveat: a node's
    // neighbors become ONE array row (memory ∝ max degree, like the
    // old window's per-key run); cap or pre-split celebrity nodes
    // upstream for power-law graphs.
    val adj = materialize(e.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs")))
    val starts = adj.select(col("src").as("start"))
    var state = materialize(
      starts
        .crossJoin(spark(starts).range(walksPerNode).toDF("j"))
        .select(concat(col("start"), lit("#"), col("j")).as("walk_id"),
          col("start"), col("start").as("node"), lit(0).as("step")))
    val out = Seq.newBuilder[DataFrame]
    out += state
    var t = 1
    while (t <= steps) {
      val h = Md5Lower64.md5Lower64(
        concat(col("walk_id"), lit(":"), lit(t), lit(":"), col("node")))
      state = materialize(state
        .join(adj, state("node") === adj("src"))
        .select(col("walk_id"), col("start"),
          pmod(h, lit(4294967296L)).as("__h32"), col("nbrs"))
        .select(col("walk_id"), col("start"),
          element_at(col("nbrs"), (expr(
            "(__h32 * cardinality(nbrs)) div 4294967296L") + 1L).cast("int"))
            .as("node"),
          lit(t).as("step")))
      out += state
      t += 1
    }
    out.result().reduce(_ unionByName _)
      .select(col("walk_id"), col("start"), col("step").cast("long").as("step"),
        col("node"))
  }

  private def spark(df: DataFrame) = df.sparkSession

  /** Render [[walks]] output as whitespace-joined node-id lines — the
    * text corpus a DeepWalk/word2vec trainer consumes directly (each
    * walk one "sentence", nodes as tokens). Deterministic: rows are
    * collected per walk and sorted by (step, node) — step is unique
    * within a walk, so partitioning can never perturb a line. Output:
    * (walk_id, line). */
  def corpusLines(walks: DataFrame): DataFrame =
    walks.groupBy(col("walk_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("step"), col("node")))),
          x => x.getField("node").cast("string")),
        " ").as("line"))
}
