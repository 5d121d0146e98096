package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * k-core extraction by fixed-round peeling — the dense-subgraph lens on
 * a similarity or link graph: the k-core (maximal subgraph where every
 * node keeps degree ≥ k) surfaces boilerplate clusters, template farms
 * and mutually-linked spam that pair thresholds alone miss, and its
 * complement orders nodes by "peripheralness" for curation.
 *
 * Contract: exactly `rounds` SIMULTANEOUS peel rounds — each round
 * recomputes degrees within the surviving subgraph and drops every node
 * below k at once. Peeling is monotone, so once no node drops the
 * result is the exact k-core; the FIXED round count (not a
 * convergence test) is what makes two engines bit-identical even on a
 * graph that hasn't converged yet — the same determinism device as the
 * fixed-iteration [[PageRank]]. Callers wanting certainty pass
 * `rounds` ≥ the peel depth (bounded by the graph's degeneracy
 * ordering length; tiny in practice — 8 covers the gate corpus).
 *
 * Scale shape: per round one degree aggregation (map-side combined)
 * plus two semi-joins filtering the edge snapshot — O(E) slim rows per
 * round, O(rounds·E) total, nothing quadratic, no driver-side state;
 * each round's survivor edge set is localCheckpoint'ed (the
 * clusterPairs discipline) so lineage stays flat; inject
 * `materialize = _.checkpoint(eager = true)` for a fault-tolerant
 * run — results bit-identical (ReliableCheckpointSpec).
 */
object KCore {

  /** Surviving (node, deg) rows after `rounds` peels at threshold `k`,
    * with `deg` the node's degree INSIDE the surviving subgraph.
    * `pairs` is an undirected edge list in any orientation (duplicates,
    * loops, nulls dropped). */
  def kCore(pairs: DataFrame, iCol: String, jCol: String, k: Int,
      rounds: Int = 8,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var edges = materialize(Triangles.canonical(pairs, iCol, jCol))
    var r = 0
    while (r < rounds) {
      val deg = edges.select(col("u").as("node"))
        .unionByName(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val keep = deg.where(col("deg") >= k).select(col("node"))
      edges = materialize(
        edges
          .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
          .select(col("u"), col("v")))
      r += 1
    }
    edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
  }
}
