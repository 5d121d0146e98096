package graft.spatial

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property-based tests for the pure spatial core (SURVEY §5 test plan):
 * predicate duality under argument flip, withindist radius monotonicity,
 * geodesic sanity envelopes, total predicate parsing.
 */
object SpatialProperties extends Properties("spatial") {

  private val lon = Gen.chooseNum(-179.0, 179.0)
  private val lat = Gen.chooseNum(-85.0, 85.0)

  private val point = for (x <- lon; y <- lat) yield GeoKit.point(x, y)

  private val rect = for {
    x <- lon; y <- lat
    w <- Gen.chooseNum(0.01, 5.0); h <- Gen.chooseNum(0.01, 5.0)
  } yield GeoKit.wktToGeom(
    s"POLYGON(($x $y,${x + w} $y,${x + w} ${y + h},$x ${y + h},$x $y))")

  private val geom = Gen.oneOf(point, rect)

  property("within/contains duality") = forAll(geom, geom) { (a, b) =>
    SpatialPredicate.Within.relates(a, b) == SpatialPredicate.Contains.relates(b, a)
  }

  property("intersects symmetry") = forAll(geom, geom) { (a, b) =>
    SpatialPredicate.Intersects.relates(a, b) == SpatialPredicate.Intersects.relates(b, a)
  }

  property("overlaps symmetry") = forAll(rect, rect) { (a, b) =>
    SpatialPredicate.Overlaps.relates(a, b) == SpatialPredicate.Overlaps.relates(b, a)
  }

  property("within implies intersects") = forAll(geom, rect) { (a, b) =>
    !SpatialPredicate.Within.relates(a, b) || SpatialPredicate.Intersects.relates(a, b)
  }

  property("withindist radius monotonicity") =
    forAll(point, point, Gen.chooseNum(1000.0, 2e6), Gen.chooseNum(0.0, 2e6)) { (a, b, r1, dr) =>
      val small = SpatialPredicate.WithinDist(r1)
      val large = SpatialPredicate.WithinDist(r1 + dr)
      !small.relates(a, b) || large.relates(a, b)
    }

  property("geodesic symmetry + bounds") = forAll(point, point) { (a, b) =>
    val (ac, bc) = (a.getCoordinate, b.getCoordinate)
    val d1 = Geodesic.inverseMeters(ac.y, ac.x, bc.y, bc.x)
    val d2 = Geodesic.inverseMeters(bc.y, bc.x, ac.y, ac.x)
    // symmetric to numeric noise, non-negative, below half the max circumference
    math.abs(d1 - d2) < 1e-6 && d1 >= 0 && d1 < 2.1e7
  }

  property("geodesic within 1% of spherical haversine") = forAll(point, point) { (a, b) =>
    val (ac, bc) = (a.getCoordinate, b.getCoordinate)
    val d = Geodesic.inverseMeters(ac.y, ac.x, bc.y, bc.x)
    val R = 6371008.8
    val p1: Double = math.toRadians(ac.y)
    val p2: Double = math.toRadians(bc.y)
    val dp: Double = p2 - p1
    val dl: Double = math.toRadians(bc.x - ac.x)
    val h = math.pow(math.sin(dp / 2), 2) +
      math.cos(p1) * math.cos(p2) * math.pow(math.sin(dl / 2), 2)
    val hav = 2 * R * math.asin(math.min(1.0, math.sqrt(h)))
    d < 1000.0 || math.abs(d - hav) / math.max(d, hav) < 0.01
  }

  property("predicate parsing is total (fallback nearest)") =
    forAll(Gen.alphaNumStr) { s =>
      SpatialPredicate.parse(s) != null
    }

  property("withindist parses before within; radius extracted") =
    forAll(Gen.chooseNum(1, 10000000)) { r =>
      SpatialPredicate.parse(s"withindist $r") == SpatialPredicate.WithinDist(r.toDouble)
    }
}
