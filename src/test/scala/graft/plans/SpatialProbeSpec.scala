package graft.plans

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}
import org.locationtech.jts.index.strtree.STRtree
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Differential pin for the unconditioned-nearest fast path (single
  * k=2 walk + ranged tie query): on duplicate-heavy point sets it must
  * return EXACTLY what the conditional k-growth loop returns — same
  * nearest, same smallest-index tie-break. The fast path is what
  * `nearest` joins without an extra condition run at scale, where
  * MakeSf1-style key-shifted copies put 10+ items at identical
  * coordinates and the k-growth loop re-walks the tree per round.
  */
class SpatialProbeSpec extends AnyFlatSpec with Matchers {

  private val gf = new GeometryFactory()

  private def probeOf(pts: Seq[(Double, Double)]): (SpatialProbe, Array[Geometry]) = {
    val geoms: Array[Geometry] =
      pts.map { case (x, y) => gf.createPoint(new Coordinate(x, y)): Geometry }.toArray
    val tree = new STRtree()
    geoms.zipWithIndex.foreach { case (g, i) =>
      tree.insert(g.getEnvelopeInternal, Integer.valueOf(i))
    }
    tree.build()
    (new SpatialProbe(geoms, tree), geoms)
  }

  // a non-sentinel always-true closure: forces the conditional loop
  private val loopPath: Int => Boolean = i => i >= 0

  "nearestMatch fast path" should "agree with the k-growth loop on duplicate-heavy sets" in {
    // deterministic pseudo-random points with heavy duplication: every
    // point appears `copies` times (distinct indices, same coordinate)
    for (seed <- 1 to 5; copies <- Seq(1, 3, 10)) {
      val base = (0 until 40).map { i =>
        val h = (seed * 1000003 + i * 7919) % 97
        ((h % 13).toDouble, (h % 11).toDouble)
      }
      val pts = (0 until copies).flatMap(_ => base)
      val (probe, _) = probeOf(pts)
      for (qi <- 0 until 25) {
        val q = gf.createPoint(new Coordinate((qi * 3 % 17).toDouble + 0.25,
          (qi * 5 % 13).toDouble - 0.25))
        val fast = probe.nearestMatch(q, SpatialProbe.AlwaysTrue)
        val slow = probe.nearestMatch(q, loopPath)
        fast shouldBe slow
      }
    }
  }

  it should "pick the smallest index among exact coordinate ties" in {
    // nearest is (5,5); indices 2,4,7 all sit there — 2 must win
    val pts = Seq((0.0, 0.0), (9.0, 9.0), (5.0, 5.0), (1.0, 8.0),
      (5.0, 5.0), (8.0, 1.0), (9.0, 0.0), (5.0, 5.0))
    val (probe, _) = probeOf(pts)
    val q = gf.createPoint(new Coordinate(5.2, 5.2))
    probe.nearestMatch(q, SpatialProbe.AlwaysTrue) shouldBe 2
    probe.nearestMatch(q, loopPath) shouldBe 2
  }

  it should "agree with brute force under rare and impossible conditions" in {
    // 300 points: enough that a rare condition drives k past the
    // scan cutoff (128) — the scan fallback must match brute force
    val pts = (0 until 300).map { i =>
      val h = (i * 7919) % 101
      ((h % 15).toDouble, (h % 9).toDouble)
    }
    val (probe, geoms) = probeOf(pts)
    def brute(q: Geometry, cond: Int => Boolean): Int = {
      var best = -1; var bd = Double.MaxValue
      geoms.indices.foreach { i =>
        if (cond(i)) { val d = q.distance(geoms(i)); if (d < bd) { bd = d; best = i } }
      }
      best
    }
    for (qi <- 0 until 15) {
      val q = gf.createPoint(new Coordinate((qi * 3 % 17) + 0.4, (qi * 5 % 13) - 0.4))
      val rare: Int => Boolean = i => i % 97 == 3 // ~3 of 300 pass
      val never: Int => Boolean = _ => false
      probe.nearestMatch(q, rare) shouldBe brute(q, rare)
      probe.nearestMatch(q, never) shouldBe -1
    }
  }

  it should "handle single-item and probe-on-point cases" in {
    val (one, _) = probeOf(Seq((3.0, 3.0)))
    one.nearestMatch(gf.createPoint(new Coordinate(0, 0)), SpatialProbe.AlwaysTrue) shouldBe 0
    // probe exactly ON a duplicated point: distance 0 ties
    val (dup, _) = probeOf(Seq((1.0, 1.0), (1.0, 1.0), (2.0, 2.0)))
    dup.nearestMatch(gf.createPoint(new Coordinate(1, 1)), SpatialProbe.AlwaysTrue) shouldBe 0
  }
}
