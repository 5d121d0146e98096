package graft.spatial

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class GeodesicSpec extends AnyFlatSpec with Matchers {

  it should "reproduce the reference's golden geodesic values" in {
    // reference: BroadcastSpatialJoinTest.scala:115-119 — (1,1)→(1.1,1.1) and
    // (2,2)→(2.1,2.1), WGS84 ellipsoid, centroid-to-centroid, Int metres
    Geodesic.centroidDistance(GeoKit.point(1, 1), GeoKit.point(1.1, 1.1)) shouldBe 15689
    Geodesic.centroidDistance(GeoKit.point(2, 2), GeoKit.point(2.1, 2.1)) shouldBe 15685
  }

  it should "be symmetric and zero on coincident points" in {
    Geodesic.inverseMeters(10, 20, -30, 40) shouldBe Geodesic.inverseMeters(-30, 40, 10, 20) +- 1e-6
    Geodesic.inverseMeters(5, 5, 5, 5) shouldBe 0.0
  }

  it should "match known long-distance values" in {
    // ~1 degree of latitude at the equator ≈ 110574.4 m (public WGS84 fact)
    Geodesic.inverseMeters(0, 0, 1, 0) shouldBe 110574.4 +- 1.0
    // ~1 degree of longitude at the equator ≈ 111319.5 m
    Geodesic.inverseMeters(0, 0, 0, 1) shouldBe 111319.5 +- 1.0
  }

  it should "use centroids for non-point geometries" in {
    val poly = GeoKit.wktToGeom("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))") // centroid (1,1)
    Geodesic.centroidDistance(poly, GeoKit.point(1.1, 1.1)) shouldBe 15689
  }
}

class SpatialPredicateSpec extends AnyFlatSpec with Matchers {
  import SpatialPredicate._

  it should "parse all predicates case-insensitively with nearest fallback" in {
    parse("WithinDist 15700") shouldBe WithinDist(15700)
    parse("within") shouldBe Within
    parse("CONTAINS") shouldBe Contains
    parse("intersects") shouldBe Intersects
    parse("overlaps") shouldBe Overlaps
    parse("nearest") shouldBe Nearest
    parse("anything else") shouldBe Nearest // silent fallback, reference SpatialJoin.scala:55
    parse("") shouldBe Nearest
  }

  it should "match withindist before within" in {
    parse("withindist 100").isInstanceOf[WithinDist] shouldBe true
  }

  it should "extract radius with 35km/degree coarse conversion" in {
    val wd = parse("withindist 35000").asInstanceOf[WithinDist]
    wd.meters shouldBe 35000.0
    wd.degrees shouldBe 1.0
    parse("withindist").asInstanceOf[WithinDist].meters shouldBe 0.0 // garbage → 0
  }
}
