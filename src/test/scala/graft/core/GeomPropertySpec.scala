package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.geom._

/**
 * Randomized differential tests for the geometry kernel — each property
 * checks `Geom` against an INDEPENDENT reference computation (crossing-number
 * ray cast, dense segment sampling, convexity invariants), not against the
 * kernel's own algorithm. Seeded, so failures reproduce. This guards the
 * code the session-6 review found edge-case bugs in (point-to-segment
 * fallbacks, boundary semantics): a future "optimization" that reintroduces
 * corner-to-corner distances or boundary-inclusive containment fails here.
 */
class GeomPropertySpec extends AnyFunSuite {

  private def forRandom(n: Int)(body: scala.util.Random => Unit): Unit = {
    val rnd = new scala.util.Random(20260817L)
    (1 to n).foreach(_ => body(rnd))
  }

  /** random star-shaped (possibly concave) SIMPLE polygon around (cx, cy):
    * vertices at sorted distinct angles, random radii — never self-crossing. */
  private def starPolygon(rnd: scala.util.Random, cx: Double, cy: Double,
                          k: Int, rMin: Double, rMax: Double): PolygonG = {
    var pts = Array.empty[Pt]
    while (pts.length < 4) {
      val angles = Array.fill(k)(rnd.nextDouble() * 2 * math.Pi).sorted
      val keep = angles.indices.collect {
        case i if i == 0 || angles(i) - angles(i - 1) > 0.05 => angles(i)
      }
      pts = keep.map { a =>
        val r = rMin + rnd.nextDouble() * (rMax - rMin)
        Pt(cx + r * math.cos(a), cy + r * math.sin(a))
      }.toArray
    }
    PolygonG(Array(pts :+ pts(0)))
  }

  /** independent crossing-number ray cast (half-open edge rule). */
  private def rayCastContains(p: Pt, ring: Array[Pt]): Boolean = {
    var inside = false; var i = 0
    while (i < ring.length - 1) {
      val a = ring(i); val b = ring(i + 1)
      if ((a.y > p.y) != (b.y > p.y)) {
        val xInt = a.x + (p.y - a.y) / (b.y - a.y) * (b.x - a.x)
        if (p.x < xInt) inside = !inside
      }
      i += 1
    }
    inside
  }

  private def minBoundaryDist(p: Pt, ring: Array[Pt]): Double =
    (0 until ring.length - 1)
      .map(i => Geom.distPointSegment(p, ring(i), ring(i + 1))).min

  test("property: winding-number containment agrees with an independent ray cast") {
    var checked = 0
    forRandom(150) { rnd =>
      val poly = starPolygon(rnd, 50, 50, 14, 5, 40)
      (1 to 40).foreach { _ =>
        val p = Pt(rnd.nextDouble() * 100, rnd.nextDouble() * 100)
        // skip probes near the boundary: containment there is a tolerance
        // question (onRing uses 1e-9), not an algorithm question
        if (minBoundaryDist(p, poly.shell) > 1e-6) {
          assert(poly.containsPoint(p) == rayCastContains(p, poly.shell),
            s"disagree at $p for ${poly.shell.mkString(",")}")
          checked += 1
        }
      }
    }
    assert(checked > 5000, s"too many skipped probes: $checked")
  }

  test("property: distPointSegment matches dense sampling within the Lipschitz bound") {
    forRandom(400) { rnd =>
      def r() = rnd.nextDouble() * 100
      val p = Pt(r(), r()); val a = Pt(r(), r()); val b = Pt(r(), r())
      val d = Geom.distPointSegment(p, a, b)
      val steps = 1000
      val sampled = (0 to steps).map { i =>
        val t = i.toDouble / steps
        p.distTo(Pt(a.x + t * (b.x - a.x), a.y + t * (b.y - a.y)))
      }.min
      val segLen = a.distTo(b)
      assert(d <= sampled + 1e-9, s"claimed $d above sampled min $sampled")
      assert(sampled - d <= segLen / steps + 1e-9,
        s"claimed $d too far below sampled min $sampled (len $segLen)")
    }
  }

  /** random geometry mix: point / multipoint / line / star polygon. */
  private def randomGeom(rnd: scala.util.Random, cx: Double, cy: Double): Geom =
    rnd.nextInt(4) match {
      case 0 => PointG(Pt(cx + rnd.nextDouble() * 20 - 10, cy + rnd.nextDouble() * 20 - 10))
      case 1 => MultiPointG(Array.fill(2 + rnd.nextInt(3))(
        Pt(cx + rnd.nextDouble() * 20 - 10, cy + rnd.nextDouble() * 20 - 10)))
      case 2 => LineStringG(Array.fill(2 + rnd.nextInt(3))(
        Pt(cx + rnd.nextDouble() * 20 - 10, cy + rnd.nextDouble() * 20 - 10)))
      case _ => starPolygon(rnd, cx, cy, 8, 2, 10)
    }

  test("property: distance is symmetric and dwithin's envelope prefilter never drops a true pair") {
    forRandom(500) { rnd =>
      val a = randomGeom(rnd, rnd.nextDouble() * 100, rnd.nextDouble() * 100)
      val b = randomGeom(rnd, rnd.nextDouble() * 100, rnd.nextDouble() * 100)
      val dab = Geom.distance(a, b)
      assert(dab == Geom.distance(b, a), s"asymmetric distance for $a / $b")
      // dwithin must equal the unfiltered predicate — a too-tight envelope
      // expand would silently drop true pairs at exactly this boundary
      val d = rnd.nextDouble() * 60
      assert(Geom.dwithin(a, b, d) == (dab <= d),
        s"dwithin($d) disagrees with distance $dab")
    }
  }

  test("property: distance 0 iff inside (far from boundary), within(point) consistent") {
    forRandom(200) { rnd =>
      val poly = starPolygon(rnd, 50, 50, 12, 5, 40)
      val p = Pt(rnd.nextDouble() * 100, rnd.nextDouble() * 100)
      if (minBoundaryDist(p, poly.shell) > 1e-6) {
        val in = rayCastContains(p, poly.shell)
        val d = Geom.distance(PointG(p), poly)
        assert((d == 0.0) == in, s"distance $d vs inside=$in at $p")
        assert(Geom.within(PointG(p), poly) == in)
      }
    }
  }

  test("property: point-to-multipolygon distance equals the min over parts") {
    forRandom(200) { rnd =>
      val parts = Array.fill(1 + rnd.nextInt(3))(
        starPolygon(rnd, rnd.nextDouble() * 200, rnd.nextDouble() * 200, 8, 2, 15))
      val mp = MultiPolygonG(parts)
      val p = Pt(rnd.nextDouble() * 200, rnd.nextDouble() * 200)
      val combined = Geom.distance(PointG(p), mp)
      val perPart = parts.map(pg => Geom.distance(PointG(p), pg)).min
      assert(combined == perPart, s"$combined != min-over-parts $perPart")
    }
  }

  test("property: convex polygon contains its centroid; signed area positive CCW") {
    forRandom(200) { rnd =>
      // constant radius + sorted distinct angles = vertices on a circle = convex
      val cx = rnd.nextDouble() * 100; val cy = rnd.nextDouble() * 100
      val poly = starPolygon(rnd, cx, cy, 10, 20, 20.000001)
      assert(poly.containsPoint(poly.centroid),
        s"centroid ${poly.centroid} outside convex ${poly.shell.mkString(",")}")
      assert(Geom.signedArea(poly.shell) > 0,
        "sorted-ascending angles should give a CCW ring with positive area")
      assert(poly.area > 0 && poly.area <= math.Pi * 20.000001 * 20.000001 + 1e-6,
        s"area ${poly.area} outside the circumscribed-circle bound")
    }
  }

  test("property: segment predicates are symmetric in their arguments") {
    forRandom(400) { rnd =>
      def ip() = Pt(rnd.nextInt(20), rnd.nextInt(20)) // integer coords: exact fp
      val (a1, a2, b1, b2) = (ip(), ip(), ip(), ip())
      assert(Geom.segmentsIntersect(a1, a2, b1, b2) ==
        Geom.segmentsIntersect(b1, b2, a1, a2))
      assert(Geom.segSegDistance(a1, a2, b1, b2) ==
        Geom.segSegDistance(b1, b2, a1, a2))
      // intersecting iff zero distance (integer coords keep this exact)
      assert(Geom.segmentsIntersect(a1, a2, b1, b2) ==
        (Geom.segSegDistance(a1, a2, b1, b2) == 0.0))
    }
  }
}
