package graft.join

import graft.spatial.{GeoKit, Geodesic, GeomSpec, SpatialPredicate}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.ClassicConversions._
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.index.strtree.{ItemBoundable, ItemDistance, STRtree}

/**
 * Broadcast spatial join kernel: collect + index the broadcast side with an
 * STRtree, flatMap the iterated side probing the index.
 *
 * Contract (pinned by the reference's behavior at
 * src/main/scala/me/valik/spark/transformer/BroadcastSpatialJoin.scala:456-478
 * and README.md:180-186):
 *  - output = one row per (iterated row, matching broadcast row) pair;
 *  - predicate is evaluated as `iterated op broadcast`;
 *  - `nearest` emits exactly one match per iterated row — the candidate
 *    closest in JTS coordinate-space distance (degrees), considering only
 *    candidates that pass the extra condition; deterministic tie-break by
 *    broadcast-row index;
 *  - `withindist N` prefilters with an envelope expanded by the conservative
 *    1° ≈ 35 km radius, then refines with the exact geodesic centroid
 *    distance ≤ N metres;
 *  - null geometries on either side drop out (inner-join semantics);
 *  - the result RDD keeps the iterated side's partitioning (flatMap).
 *
 * Scale notes: the broadcast side is shipped as WKB + rows once per
 * executor; the STRtree is built lazily once per executor (not per task).
 * Geometries on the iterated side are materialized one row at a time inside
 * the partition iterator — nothing is collected to the driver except the
 * declared-small broadcast side. For joins where neither side fits in
 * memory, use [[graft.join.GridSpatialJoin]] instead.
 */
object SpatialJoinCore {

  /** Packed broadcast side: rows + WKB geometries; index built lazily per executor. */
  final class PackedIndex(val rows: Array[Row], val wkbs: Array[Array[Byte]])
      extends Serializable {

    @transient @volatile private var cache: (Array[Geometry], STRtree) = _

    private def ensure(): (Array[Geometry], STRtree) = {
      var c = cache
      if (c == null) synchronized {
        c = cache
        if (c == null) {
          val gs = wkbs.map(GeoKit.wkbToGeom) // null wkb → null geometry
          val t = new STRtree()
          var i = 0
          while (i < gs.length) {
            if (gs(i) != null) t.insert(gs(i).getEnvelopeInternal, Integer.valueOf(i))
            i += 1
          }
          t.build() // STRtree is read-thread-safe only once built
          c = (gs, t)
          cache = c
        }
      }
      c
    }

    def geoms: Array[Geometry] = ensure()._1
    def tree: STRtree = ensure()._2
    def indexedCount: Int = { ensure(); wkbs.count(_ != null) }
  }

  private object GeomItemDistance extends ItemDistance with Serializable {
    private def geomOf(b: ItemBoundable, geoms: Array[Geometry]): Geometry =
      b.getItem match {
        case i: Integer  => geoms(i)
        case g: Geometry => g
      }
    // bound via thread-local because ItemDistance gets no context argument
    val currentGeoms = new ThreadLocal[Array[Geometry]]
    def distance(a: ItemBoundable, b: ItemBoundable): Double =
      geomOf(a, currentGeoms.get).distance(geomOf(b, currentGeoms.get))
  }

  /**
   * @return RDD of (iteratedRow, broadcastRow, distanceMeters); distance is
   *         0 unless `needDistance` or the predicate is withindist.
   */
  def join(
      iterated: DataFrame,
      broadcasted: DataFrame,
      iteratedGeom: GeomSpec,
      broadcastGeom: GeomSpec,
      predicate: SpatialPredicate,
      condition: Option[CompiledCondition],
      needDistance: Boolean): RDD[(Row, Row, Int)] = {

    val spark = iterated.sparkSession
    // Collect the (pruned, declared-small) broadcast side on the driver and
    // pack geometries as WKB — smaller and cheaper to ship than JTS objects.
    val rows = broadcasted.collect()
    val wkbs = rows.map { r =>
      val g = broadcastGeom.geometry(r)
      if (g == null) null else GeoKit.geomToWkb(g)
    }
    val bc = spark.sparkContext.broadcast(new PackedIndex(rows, wkbs))
    val computeDist = needDistance || predicate.isInstanceOf[SpatialPredicate.WithinDist]

    iterated.rdd.mapPartitions { it =>
      val idx = bc.value
      val geoms = idx.geoms
      val tree = idx.tree
      // bind the geometry array for nearestNeighbour's ItemDistance once
      // per task, and clear it on completion so pooled executor threads
      // do not pin the broadcast array after the job ends
      GeomItemDistance.currentGeoms.set(geoms)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => GeomItemDistance.currentGeoms.remove()))
      val empty = idx.indexedCount == 0
      val condEval: (Row, Int) => Boolean =
        condition.map(_.indexedEvaluator(idx.rows)).getOrElse((_, _) => true)

      def emit(row: Row, g: Geometry, i: Int, dist: => Int): (Row, Row, Int) =
        (row, idx.rows(i), if (computeDist) dist else 0)

      it.flatMap { row =>
        val g = iteratedGeom.geometry(row)
        if (g == null || empty) Iterator.empty
        else predicate match {
          case SpatialPredicate.Nearest =>
            nearestMatch(row, g, tree, geoms, condEval) match {
              case -1 => Iterator.empty
              case i  => Iterator.single(emit(row, g, i, Geodesic.centroidDistance(g, geoms(i))))
            }
          case wd: SpatialPredicate.WithinDist =>
            // coarse, strictly over-approximating prefilter. Latitude: any
            // path of length D moves < D/110500 m-per-deg of latitude
            // (minimum meridian arc/degree is ~110574 m). Longitude: the
            // parallel-circle radius is >= a·cos(phi), and a geodesic of
            // length D cannot excurse more than D/110500 deg beyond its
            // endpoints' latitude band — so cos at the band edge (+2x
            // margin) bounds the longitude displacement. ~3x tighter than
            // the reference's flat 1 deg = 35 km constant, never under.
            val env = g.getEnvelopeInternal.copy()
            val latDeg = wd.meters / 110500.0
            val phiMax = math.min(89.9,
              math.max(math.abs(env.getMinY), math.abs(env.getMaxY)) + 2 * latDeg)
            val cosPhi = math.cos(math.toRadians(phiMax))
            val lonDeg =
              if (cosPhi <= 1e-6) 360.0
              else wd.meters / (Geodesic.SemiMajorA * cosPhi * math.Pi / 180.0)
            env.expandBy(lonDeg, latDeg)
            candidates(tree, env).flatMap { i =>
              if (!condEval(row, i)) None
              else {
                val d = Geodesic.centroidDistance(g, geoms(i)) // exact refine
                if (d <= wd.meters.toInt) Some((row, idx.rows(i), d)) else None
              }
            }.iterator
          case rel =>
            candidates(tree, g.getEnvelopeInternal).flatMap { i =>
              if (rel.relates(g, geoms(i)) && condEval(row, i))
                Some(emit(row, g, i, Geodesic.centroidDistance(g, geoms(i))))
              else None
            }.iterator
        }
      }
    }
  }

  private def candidates(tree: STRtree, env: org.locationtech.jts.geom.Envelope): Seq[Int] = {
    val out = Seq.newBuilder[Int]
    tree.query(env, (item: Any) => out += item.asInstanceOf[Integer].intValue())
    out.result()
  }

  /**
   * Index of the nearest (JTS coordinate distance) broadcast geometry that
   * passes the condition, or -1. Deterministic under distance ties: among
   * all tied nearest candidates the smallest broadcast index wins — so k
   * grows until either every entry was seen or the k-th distance strictly
   * exceeds the best passing distance (guaranteeing all ties were seen).
   * Starts at k=2 so the common unique-nearest case needs a single probe.
   */
  private def nearestMatch(
      row: Row,
      g: Geometry,
      tree: STRtree,
      geoms: Array[Geometry],
      condEval: (Row, Int) => Boolean): Int = {
    val total = geoms.count(_ != null)
    if (total == 0) return -1
    val env = g.getEnvelopeInternal
    var k = 2
    while (true) {
      val kk = math.min(k, total)
      val found = tree
        .nearestNeighbour(env, g, GeomItemDistance, kk)
        .map(_.asInstanceOf[Integer].intValue())
      // JTS does not guarantee order: sort by (distance, index) for determinism
      val sorted = found.sortBy(i => (g.distance(geoms(i)), i))
      val kthDist = sorted.iterator.map(i => g.distance(geoms(i))).max
      sorted.find(i => condEval(row, i)) match {
        case Some(i) =>
          // unseen candidates are all at >= kthDist; strict > means no
          // unseen tie can exist at the best distance
          if (kk == total || kthDist > g.distance(geoms(i))) return i
        case None =>
          if (kk == total) return -1
      }
      k = kk * 4
    }
    -1
  }
}
