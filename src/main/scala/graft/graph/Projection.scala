package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Weighted one-mode projection of a bipartite edge list — the standard
 * graph-construction step for co-occurrence analysis: project
 * (customer, supplier) purchases to a supplier↔supplier co-purchase
 * graph, (user, page) visits to a page co-visit graph, (doc, entity)
 * mentions to an entity co-mention graph. The projected edges feed the
 * rest of the package ([[PageRank.runWeighted]], [[Triangles]],
 * [[KCore]]).
 *
 * Scale shape: the self-join fans out Σ_left deg² pair rows, which a
 * single hub left-node can blow up quadratically (a customer connected
 * to everything contributes |right|² rows and zero signal — the
 * stopword problem in graph form). `maxDegree` is the documented skew
 * valve: left nodes with more than `maxDegree` distinct right
 * neighbors are dropped ENTIRELY before the join (the
 * jaccardPairs-maxDocFreq convention — lossy, explicit, and the
 * practice co-occurrence pipelines actually run). With the cap, fanout
 * is bounded by |left|·maxDegree²; without it the projection is exact.
 * Everything else is equi-join + map-side-combined count: no driver
 * state, no unkeyed shuffle.
 *
 * Determinism: integer counting only.
 */
object Projection {

  /** Co-occurrence projection onto the `rightCol` side. Output:
    * (node_i, node_j, w) with node_i < node_j and w = number of
    * distinct shared left neighbors (input pairs are deduplicated). */
  def coOccurrence(pairs: DataFrame, leftCol: String, rightCol: String,
      maxDegree: Option[Int] = None,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame = {
    // snapshot once: the self-join below consumes `filtered` twice, and
    // a lazy plan re-runs the (possibly expensive) upstream pair
    // computation per side whenever predicate pushdown specializes the
    // clones past ReuseExchange (the r14 Triangles lesson)
    val p = materialize(pairs
      .select(col(leftCol).cast("long").as("l"), col(rightCol).cast("long").as("r"))
      .where(col("l").isNotNull && col("r").isNotNull)
      .distinct())
    val filtered = maxDegree match {
      case Some(cap) =>
        require(cap >= 1, s"maxDegree must be >= 1, got $cap")
        val keep = p.groupBy(col("l")).agg(count(lit(1)).as("__d"))
          .where(col("__d") <= cap).select(col("l"))
        p.join(keep, Seq("l"), "left_semi")
      case None => p
    }
    filtered.select(col("l"), col("r").as("node_i"))
      .join(filtered.select(col("l"), col("r").as("node_j")), Seq("l"))
      .where(col("node_i") < col("node_j"))
      .groupBy(col("node_i"), col("node_j"))
      .agg(count(lit(1)).as("w"))
  }
}
