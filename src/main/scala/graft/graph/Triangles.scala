package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Per-node triangle counting over an undirected pair list — the
 * cluster-cohesion signal on a similarity graph (how mutually-connected
 * a near-dup/embedding neighborhood is: a component held together by a
 * single bridge pair scores 0, a tight clique scores high), and the
 * standard building block for local clustering coefficients and
 * spam-farm detection on link graphs.
 *
 * Algorithm: degree-ordered edge orientation (Suri & Vassilvitskii,
 * WWW'11) — orient every undirected edge toward the (degree, id)-
 * lexicographically LARGER endpoint, enumerate wedges only from each
 * node's oriented out-neighborhood, close them against the oriented
 * edge set. Orientation bounds every out-degree by O(√E), so the wedge
 * join generates O(E^1.5) rows worst-case instead of Σdeg² — the
 * difference between feasible and not on a power-law 100 TB graph
 * (a celebrity node with 10⁸ neighbors contributes out-wedges from its
 * √E out-list, not 10¹⁶ pairs). All joins are equi-joins on edge keys;
 * AQE's skew split handles residual hot keys.
 *
 * Determinism: pure integer counting over a deterministic orientation —
 * no floats anywhere, so engine agreement is structural.
 */
object Triangles {

  /** Per-node triangle membership counts. `pairs` rows are undirected
    * (iCol, jCol) edges in any orientation; duplicates, self-loops and
    * null endpoints are dropped. Output: (node, tri_cnt) for every node
    * in at least one triangle; Σ tri_cnt = 3 · #triangles.
    *
    * r14: the three corners are exploded in ONE pass over the triangle
    * list — the previous 3-way union re-planned (and re-executed) the
    * whole closing join per corner. Same node multiset, same counts. */
  def perNode(pairs: DataFrame, iCol: String, jCol: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame =
    perNodeCanon(materialize(canonical(pairs, iCol, jCol)), materialize)

  private def perNodeCanon(canon: DataFrame,
      materialize: DataFrame => DataFrame): DataFrame =
    trianglesCanon(canon, materialize)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_cnt"))

  /** The distinct triangle list (a, b, c), each exactly once, endpoints
    * in ascending (degree, id) orientation order.
    *
    * r14 snapshot discipline: `canon` and `oriented` are each consumed
    * by several joins below. Left lazy, Catalyst clones the whole
    * upstream pair computation per consumer — and because predicate
    * pushdown specializes each clone's null filters, the copies stop
    * being canonically equal and ReuseExchange cannot dedupe them
    * (measured: graph_triangles ran its O(N²) exact-cosine pair scan
    * THREE times). One localCheckpoint per table makes every consumer
    * read the same snapshot — the clusterPairs iteration discipline
    * applied to a DAG-shaped (not iterative) plan. */
  def triangles(pairs: DataFrame, iCol: String, jCol: String,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame =
    trianglesCanon(materialize(canonical(pairs, iCol, jCol)), materialize)

  /** [[triangles]] over an already-canonical, already-snapshotted edge
    * list — shared so [[clusteringCoef]] never canonicalizes twice. */
  private def trianglesCanon(canon: DataFrame,
      materialize: DataFrame => DataFrame): DataFrame = {
    val deg = canon.select(col("u").as("n")).unionByName(canon.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient toward the (degree, id)-larger endpoint; snapshotted —
    // consumed three times below (e1, e2, the closing edge set)
    val oriented = materialize(canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("dv"))
          .otherwise(col("du")).as("dt")))
    // wedges from each source's out-list, ordered by (degree, id) so
    // each unordered out-pair appears once; the closing edge (b → c)
    // is oriented exactly this way because ord(b) < ord(c)
    val e1 = oriented.select(col("s"), col("t").as("b"), col("dt").as("db"))
    val e2 = oriented.select(col("s"), col("t").as("c"), col("dt").as("dc"))
    val wedges = e1.join(e2, Seq("s"))
      .where(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select(col("s").as("a"), col("b"), col("c"))
    wedges.join(oriented.select(col("s").as("b"), col("t").as("c")),
        Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Local clustering coefficient in `unit⁻¹` fixed point:
    * coef_unit = (2·triangles·unit) div (deg·(deg−1)) — how close each
    * node's neighborhood is to a clique, the per-node cohesion score
    * behind boilerplate/spam-cluster detection. Integer division on
    * non-negative values (the engine-exact contract); nodes with
    * deg < 2 score 0 by definition. Output: (node, deg, tri_cnt,
    * coef_unit) for every node with at least one edge. */
  def clusteringCoef(pairs: DataFrame, iCol: String, jCol: String,
      unit: Long = 1000000L,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame = {
    require(unit >= 1, s"unit must be >= 1, got $unit")
    // ONE canonical snapshot feeds both the degree table and the
    // triangle count — the old path canonicalized (and re-ran the
    // upstream pair computation) twice, once per consumer (r14)
    val canon = materialize(canonical(pairs, iCol, jCol))
    val deg = canon.select(col("u").as("node"))
      .unionByName(canon.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    deg.join(perNodeCanon(canon, materialize), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"))
      .withColumn("coef_unit",
        when(col("deg") < 2, lit(0L))
          .otherwise(expr(s"(2 * tri_cnt * ${unit}L) div (deg * (deg - 1))")))
  }

  /** Canonical undirected edge list (lo, hi), distinct, loops and null
    * endpoints dropped — shared by every operator in this package. */
  private[graph] def canonical(pairs: DataFrame, iCol: String,
      jCol: String): DataFrame =
    pairs
      .select(col(iCol).cast("long").as("x"), col(jCol).cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .distinct()
}
