package graft.spatial

import org.locationtech.jts.geom.Geometry

/**
 * The six join predicates and their parser.
 *
 * Parsing is substring-based, case-insensitive, with `nearest` as the
 * catch-all fallback, and `withindist` matched before `within` (reference:
 * src/main/scala/me/valik/spatial/SpatialJoin.scala:48-56). The radius of
 * `withindist N` is the number after the first space; the coarse index
 * radius uses the reference's conservative 1° ≈ 35 km over-approximation
 * (SpatialJoin.scala:63-80) so the R-tree prefilter can only over-select,
 * never under-select, before the exact geodesic refine.
 */
sealed trait SpatialPredicate extends Serializable {
  /** Exact relation test, `left op right` where left is the iterated side. */
  def relates(left: Geometry, right: Geometry): Boolean
}

object SpatialPredicate {

  case object Nearest extends SpatialPredicate {
    def relates(l: Geometry, r: Geometry): Boolean = true // selection, not a filter
  }
  final case class WithinDist(meters: Double) extends SpatialPredicate {
    /** Conservative coarse radius in degrees for the envelope prefilter. */
    def degrees: Double = meters / MetersPerDegree
    def relates(l: Geometry, r: Geometry): Boolean =
      Geodesic.centroidDistance(l, r) <= meters.toInt
  }
  case object Within extends SpatialPredicate {
    def relates(l: Geometry, r: Geometry): Boolean = l.within(r)
  }
  case object Contains extends SpatialPredicate {
    def relates(l: Geometry, r: Geometry): Boolean = l.contains(r)
  }
  case object Intersects extends SpatialPredicate {
    def relates(l: Geometry, r: Geometry): Boolean = l.intersects(r)
  }
  case object Overlaps extends SpatialPredicate {
    def relates(l: Geometry, r: Geometry): Boolean = l.overlaps(r)
  }

  /** 1 degree ≈ 35 km: deliberately smaller than the true ~111 km/deg so the
    * radius-in-degrees over-approximates (reference: SpatialJoin.scala:63-70). */
  val MetersPerDegree: Double = 35000.0

  /** Parse a predicate string; any unrecognized value falls back to Nearest. */
  def parse(predicate: String): SpatialPredicate = {
    val p = predicate.toLowerCase
    if (p.contains("withindist")) WithinDist(extractRadiusMeters(predicate))
    else if (p.contains("within")) Within
    else if (p.contains("contains")) Contains
    else if (p.contains("intersects")) Intersects
    else if (p.contains("overlaps")) Overlaps
    else Nearest
  }

  /** "withindist 10000" → 10000.0; missing/garbage number → 0. */
  def extractRadiusMeters(op: String): Double = {
    import graft.toolbox.StringToolbox._
    implicit val sep: Separators = Separators(" ")
    op.extractNumber(1).getOrElse(0d)
  }

  def isNearest(op: String): Boolean = parse(op) == Nearest
  def isWithinDist(op: String): Boolean = parse(op).isInstanceOf[WithinDist]
}
