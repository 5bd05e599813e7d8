package graft.core.geom

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/**
 * Minimal planar computational-geometry kernel over WKB, sufficient for the
 * reference's PostGIS usage (EPSG:3006 is a projected metric CRS, so all
 * distance math is planar — see /root/reference/database/migrations/04-osm-base.sql:53).
 *
 * Supported: Point, LineString, Polygon (with holes), MultiPolygon,
 * MultiPoint, MultiLineString, GeometryCollection (read-only passthrough).
 *
 * Operations mirror the PostGIS subset the reference uses
 * (SURVEY.md §1.2 / §2.3): ST_Distance, ST_DWithin, ST_Within (point-in-
 * polygon via winding number), ST_Centroid, ST_MakeLine, ST_Extent,
 * ST_Intersects (bbox + exact for point/polygon cases used).
 *
 * No external geometry library: the build is offline (build.sbt), so this is
 * hand-rolled and golden-tested in GeomSpec.
 */
sealed trait Geom {
  def envelope: Envelope
  def centroid: Pt
}

final case class Pt(x: Double, y: Double) {
  def distTo(o: Pt): Double = math.hypot(x - o.x, y - o.y)
}

final case class Envelope(minX: Double, minY: Double, maxX: Double, maxY: Double) {
  def expand(d: Double): Envelope = Envelope(minX - d, minY - d, maxX + d, maxY + d)
  def intersects(o: Envelope): Boolean =
    minX <= o.maxX && o.minX <= maxX && minY <= o.maxY && o.minY <= maxY
  def contains(p: Pt): Boolean =
    p.x >= minX && p.x <= maxX && p.y >= minY && p.y <= maxY
  def contains(o: Envelope): Boolean =
    o.minX >= minX && o.maxX <= maxX && o.minY >= minY && o.maxY <= maxY
  def union(o: Envelope): Envelope =
    Envelope(math.min(minX, o.minX), math.min(minY, o.minY),
             math.max(maxX, o.maxX), math.max(maxY, o.maxY))
}

final case class PointG(p: Pt) extends Geom {
  def envelope: Envelope = Envelope(p.x, p.y, p.x, p.y)
  def centroid: Pt = p
}

final case class LineStringG(pts: Array[Pt]) extends Geom {
  def envelope: Envelope = Geom.envelopeOf(pts)
  /** Length-weighted centroid (PostGIS ST_Centroid on linework). */
  def centroid: Pt = {
    var len = 0.0; var cx = 0.0; var cy = 0.0
    var i = 0
    while (i < pts.length - 1) {
      val a = pts(i); val b = pts(i + 1)
      val l = a.distTo(b)
      cx += (a.x + b.x) / 2 * l; cy += (a.y + b.y) / 2 * l; len += l
      i += 1
    }
    if (len == 0) pts(0) else Pt(cx / len, cy / len)
  }
  def length: Double = {
    var l = 0.0; var i = 0
    while (i < pts.length - 1) { l += pts(i).distTo(pts(i + 1)); i += 1 }
    l
  }
}

/** rings(0) = exterior shell; rest are holes. Rings are closed (first==last). */
final case class PolygonG(rings: Array[Array[Pt]]) extends Geom {
  def shell: Array[Pt] = rings(0)
  def envelope: Envelope = Geom.envelopeOf(shell)
  def centroid: Pt = {
    // Area-weighted centroid; holes subtract (signed areas handle it as long
    // as hole orientation is opposite — normalize by using signed area per ring).
    var a = 0.0; var cx = 0.0; var cy = 0.0
    for (ring <- rings) {
      val (ra, rcx, rcy) = Geom.ringCentroidTerms(ring)
      // exterior contributes its signed terms; holes must subtract: flip sign
      // so holes (regardless of stored orientation) reduce the area.
      val sign = if (ring eq rings(0)) { if (ra < 0) -1.0 else 1.0 }
                 else { if (ra < 0) 1.0 else -1.0 }
      a += sign * ra; cx += sign * rcx; cy += sign * rcy
    }
    if (a == 0) shell(0) else Pt(cx / (3 * a), cy / (3 * a))
  }
  def area: Double = {
    var a = math.abs(Geom.signedArea(rings(0)))
    var i = 1
    while (i < rings.length) { a -= math.abs(Geom.signedArea(rings(i))); i += 1 }
    a
  }
  /** ST_Within point semantics: the boundary is NOT within (PostGIS excludes
    * it), so a point exactly on a shared municipality border stamps NO code —
    * matching the reference trigger AND making the answer independent of
    * polygon iteration order (the r3 boundary-inclusive form could stamp
    * whichever bordering municipality was scanned first). */
  def containsPoint(p: Pt): Boolean = {
    if (!envelope.contains(p)) return false
    if (Geom.onRing(p, rings(0))) return false
    if (Geom.windingNumber(p, rings(0)) == 0) return false
    var i = 1
    while (i < rings.length) {
      // on a hole ring = on the boundary -> outside; inside a hole -> outside
      if (Geom.onRing(p, rings(i)) || Geom.windingNumber(p, rings(i)) != 0) return false
      i += 1
    }
    true
  }
}

final case class MultiPointG(pts: Array[Pt]) extends Geom {
  def envelope: Envelope = Geom.envelopeOf(pts)
  def centroid: Pt = Pt(pts.map(_.x).sum / pts.length, pts.map(_.y).sum / pts.length)
}

final case class MultiLineStringG(lines: Array[LineStringG]) extends Geom {
  def envelope: Envelope = lines.map(_.envelope).reduce(_ union _)
  def centroid: Pt = {
    var len = 0.0; var cx = 0.0; var cy = 0.0
    for (l <- lines; i <- 0 until l.pts.length - 1) {
      val a = l.pts(i); val b = l.pts(i + 1)
      val d = a.distTo(b)
      cx += (a.x + b.x) / 2 * d; cy += (a.y + b.y) / 2 * d; len += d
    }
    if (len == 0) lines(0).pts(0) else Pt(cx / len, cy / len)
  }
}

final case class MultiPolygonG(polys: Array[PolygonG]) extends Geom {
  def envelope: Envelope = polys.map(_.envelope).reduce(_ union _)
  def centroid: Pt = {
    var a = 0.0; var cx = 0.0; var cy = 0.0
    for (p <- polys) {
      val pa = p.area
      val c = p.centroid
      a += pa; cx += c.x * pa; cy += c.y * pa
    }
    if (a == 0) polys(0).shell(0) else Pt(cx / a, cy / a)
  }
  def containsPoint(p: Pt): Boolean = polys.exists(_.containsPoint(p))
}

object Geom {
  // ---- construction helpers -------------------------------------------------
  def point(x: Double, y: Double): PointG = PointG(Pt(x, y))
  def line(pts: (Double, Double)*): LineStringG =
    LineStringG(pts.map { case (x, y) => Pt(x, y) }.toArray)
  /** Axis-aligned rectangle polygon, like ST_MakeEnvelope. */
  def envelopePoly(minX: Double, minY: Double, maxX: Double, maxY: Double): PolygonG =
    PolygonG(Array(Array(Pt(minX, minY), Pt(maxX, minY), Pt(maxX, maxY), Pt(minX, maxY), Pt(minX, minY))))

  def envelopeOf(pts: Array[Pt]): Envelope = {
    var mnx = Double.MaxValue; var mny = Double.MaxValue
    var mxx = Double.MinValue; var mxy = Double.MinValue
    var i = 0
    while (i < pts.length) {
      val p = pts(i)
      if (p.x < mnx) mnx = p.x; if (p.x > mxx) mxx = p.x
      if (p.y < mny) mny = p.y; if (p.y > mxy) mxy = p.y
      i += 1
    }
    Envelope(mnx, mny, mxx, mxy)
  }

  // ---- low-level predicates -------------------------------------------------
  def signedArea(ring: Array[Pt]): Double = {
    var a = 0.0; var i = 0
    while (i < ring.length - 1) {
      a += ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      i += 1
    }
    a / 2
  }

  /** (2*signedArea, 6*area-weighted-cx, 6*area-weighted-cy) terms for centroid. */
  private[geom] def ringCentroidTerms(ring: Array[Pt]): (Double, Double, Double) = {
    var a = 0.0; var cx = 0.0; var cy = 0.0; var i = 0
    while (i < ring.length - 1) {
      val cross = ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      a += cross
      cx += (ring(i).x + ring(i + 1).x) * cross
      cy += (ring(i).y + ring(i + 1).y) * cross
      i += 1
    }
    (a / 2, cx / 2, cy / 2)
  }

  /** Winding number of p wrt closed ring; nonzero = inside. */
  def windingNumber(p: Pt, ring: Array[Pt]): Int = {
    var wn = 0; var i = 0
    while (i < ring.length - 1) {
      val a = ring(i); val b = ring(i + 1)
      if (a.y <= p.y) {
        if (b.y > p.y && isLeft(a, b, p) > 0) wn += 1
      } else {
        if (b.y <= p.y && isLeft(a, b, p) < 0) wn -= 1
      }
      i += 1
    }
    wn
  }

  @inline private def isLeft(a: Pt, b: Pt, p: Pt): Double =
    (b.x - a.x) * (p.y - a.y) - (p.x - a.x) * (b.y - a.y)

  def onRing(p: Pt, ring: Array[Pt]): Boolean = {
    var i = 0
    while (i < ring.length - 1) {
      if (distPointSegment(p, ring(i), ring(i + 1)) < 1e-9) return true
      i += 1
    }
    false
  }

  def distPointSegment(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val l2 = dx * dx + dy * dy
    if (l2 == 0) return p.distTo(a)
    var t = ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2
    if (t < 0) t = 0 else if (t > 1) t = 1
    p.distTo(Pt(a.x + t * dx, a.y + t * dy))
  }

  def segSegDistance(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Double = {
    if (segmentsIntersect(a1, a2, b1, b2)) 0.0
    else math.min(
      math.min(distPointSegment(a1, b1, b2), distPointSegment(a2, b1, b2)),
      math.min(distPointSegment(b1, a1, a2), distPointSegment(b2, a1, a2)))
  }

  def segmentsIntersect(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Boolean = {
    val d1 = isLeft(b1, b2, a1); val d2 = isLeft(b1, b2, a2)
    val d3 = isLeft(a1, a2, b1); val d4 = isLeft(a1, a2, b2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) return true
    if (d1 == 0 && onSeg(b1, b2, a1)) return true
    if (d2 == 0 && onSeg(b1, b2, a2)) return true
    if (d3 == 0 && onSeg(a1, a2, b1)) return true
    if (d4 == 0 && onSeg(a1, a2, b2)) return true
    false
  }

  @inline private def onSeg(a: Pt, b: Pt, p: Pt): Boolean =
    math.min(a.x, b.x) <= p.x && p.x <= math.max(a.x, b.x) &&
    math.min(a.y, b.y) <= p.y && p.y <= math.max(a.y, b.y)

  // ---- boundary extraction (for distance between extended geoms) -----------
  private def boundarySegments(g: Geom): Array[(Pt, Pt)] = g match {
    case PointG(_)          => Array.empty
    case LineStringG(pts)   => pts.sliding(2).collect { case Array(a, b) => (a, b) }.toArray
    case PolygonG(rings)    => rings.flatMap(r => r.sliding(2).collect { case Array(a, b) => (a, b) })
    case MultiPointG(_)     => Array.empty
    case MultiLineStringG(ls) => ls.flatMap(l => boundarySegments(l))
    case MultiPolygonG(ps)  => ps.flatMap(p => boundarySegments(p))
  }

  private def vertices(g: Geom): Array[Pt] = g match {
    case PointG(p)            => Array(p)
    case LineStringG(pts)     => pts
    case PolygonG(rings)      => rings.flatten
    case MultiPointG(pts)     => pts
    case MultiLineStringG(ls) => ls.flatMap(_.pts)
    case MultiPolygonG(ps)    => ps.flatMap(_.rings.flatten)
  }

  private def containsPt(g: Geom, p: Pt): Boolean = g match {
    case pg: PolygonG      => pg.containsPoint(p)
    case mp: MultiPolygonG => mp.containsPoint(p)
    case _                 => false
  }

  /** PostGIS ST_Distance semantics: 0 when geometries intersect/contain. */
  def distance(a: Geom, b: Geom): Double = (a, b) match {
    case (PointG(p), PointG(q)) => p.distTo(q)
    case (PointG(p), _) =>
      if (containsPt(b, p)) 0.0
      else {
        val segs = boundarySegments(b)
        if (segs.isEmpty) vertices(b).map(p.distTo).min
        else segs.map { case (s, e) => distPointSegment(p, s, e) }.min
      }
    case (_, PointG(_)) => distance(b, a)
    case _ =>
      // areal/lineal vs areal/lineal: 0 if any vertex inside the other,
      // else min over boundary segment pairs.
      if (vertices(a).exists(containsPt(b, _)) || vertices(b).exists(containsPt(a, _))) 0.0
      else {
        val sa = boundarySegments(a); val sb = boundarySegments(b)
        if (sa.isEmpty && sb.isEmpty) {
          val va = vertices(a); val vb = vertices(b)
          va.flatMap(p => vb.map(p.distTo)).min
        } else if (sa.isEmpty) {
          // one side is point-only (MultiPoint): its vertices against the
          // other side's SEGMENTS — vertex-to-vertex alone overestimates
          // (nearest point of an edge is usually not a corner)
          vertices(a).map(p => sb.map { case (s, e) => distPointSegment(p, s, e) }.min).min
        } else if (sb.isEmpty) {
          vertices(b).map(p => sa.map { case (s, e) => distPointSegment(p, s, e) }.min).min
        } else {
          var d = Double.MaxValue
          for ((a1, a2) <- sa; (b1, b2) <- sb) {
            val s = segSegDistance(a1, a2, b1, b2)
            if (s < d) d = s
          }
          d
        }
      }
  }

  def dwithin(a: Geom, b: Geom, d: Double): Boolean = {
    if (!a.envelope.expand(d).intersects(b.envelope)) false
    else distance(a, b) <= d
  }

  /** ST_Within(point-ish, polygon) — the only Within shape the reference
    * uses. For extended geometries: all vertices strictly inside AND no edge
    * crossing the container's rings (all-vertices alone misses an edge
    * bulging out through a concavity). Not handled (pathological for the
    * reference's data): a polygon encircling one of the container's holes. */
  def within(a: Geom, b: Geom): Boolean = (a, b) match {
    case (PointG(p), pg: PolygonG)      => pg.containsPoint(p)
    case (PointG(p), mp: MultiPolygonG) => mp.containsPoint(p)
    case (_, pg: PolygonG)              =>
      vertices(a).forall(pg.containsPoint) && !crossesBoundary(a, pg)
    case (_, mp: MultiPolygonG)         =>
      vertices(a).forall(mp.containsPoint) && !crossesBoundary(a, mp)
    case _                              => false
  }

  /** any segment of `a` touching/crossing a ring segment of `b` */
  private def crossesBoundary(a: Geom, b: Geom): Boolean = {
    val sa = boundarySegments(a); val sb = boundarySegments(b)
    sa.exists { case (a1, a2) =>
      sb.exists { case (b1, b2) => segSegDistance(a1, a2, b1, b2) == 0.0 }
    }
  }

  def intersectsEnvelope(g: Geom, env: Envelope): Boolean = {
    if (!g.envelope.intersects(env)) return false
    g match {
      case PointG(p) => env.contains(p)
      case _ =>
        val rect = envelopePoly(env.minX, env.minY, env.maxX, env.maxY)
        distance(g, rect) == 0.0 || vertices(g).exists(env.contains) ||
          containsPt(g, Pt((env.minX + env.maxX) / 2, (env.minY + env.maxY) / 2))
    }
  }

  // ---- simplification (ST_SimplifyPreserveTopology analog) -----------------
  /**
   * Douglas-Peucker simplification with a collapse guard, the analog of
   * PostGIS ST_SimplifyPreserveTopology as used by the reference's
   * municipality-geometry refresh (scripts/update-municipality-geometries
   * .sql:3, tolerance 10 m on admin_level=7 boundary relations).
   *
   * Semantics: per linestring / per ring classic DP — keep both endpoints,
   * recursively keep the vertex farthest from the chord while its distance
   * exceeds `tol` (strict >, first-max tie pick). "Preserve topology" is
   * honored as the collapse guard: a ring that would simplify below 4 points
   * (and lines below 2) returns unchanged, so no component ever vanishes or
   * degenerates — the property the 290-row municipality dim depends on.
   * Unlike PostGIS this port does not additionally repair self-intersections
   * introduced by vertex removal; on near-convex admin boundaries at 10 m
   * tolerance that case does not arise, and the output here is only ever
   * consumed by the envelope/winding kernels, which tolerate it.
   *
   * Closed rings are first ROTATED to a canonical start (the minimal vertex
   * by (x, y)) before DP anchors there: anchored ring DP force-keeps its
   * start vertex, so without the rotation the output would depend on where
   * ring chaining happened to begin — and buildArea chains from whatever way
   * collect_list happened to list first, which is nondeterministic in Spark.
   * With the rotation the simplified ring is a pure function of the ring's
   * cyclic point sequence. (The canonical vertex itself is force-kept even
   * when sub-tolerance — inherent to anchored ring DP, same as PostGIS
   * anchoring at the stored start; determinism is the contract here.)
   */
  def simplify(g: Geom, tol: Double): Geom = g match {
    case p: PointG            => p
    case m: MultiPointG       => m
    case LineStringG(pts)     => LineStringG(simplifyPts(pts, tol, 2))
    case MultiLineStringG(ls) => MultiLineStringG(ls.map(l => LineStringG(simplifyPts(l.pts, tol, 2))))
    case PolygonG(rings)      => PolygonG(rings.map(r => simplifyPts(canonicalRing(r), tol, 4)))
    case MultiPolygonG(ps)    => MultiPolygonG(ps.map(p => PolygonG(p.rings.map(r => simplifyPts(canonicalRing(r), tol, 4)))))
  }

  /** Rotate a closed ring (head == last) to start at its minimal vertex by
    * (x, y); open or degenerate inputs pass through unchanged. */
  private def canonicalRing(r: Array[Pt]): Array[Pt] = {
    if (r.length < 4 || r.head != r.last) return r
    var m = 0; var i = 1
    while (i < r.length - 1) { // exclude the duplicate closing point
      val p = r(i); val q = r(m)
      if (p.x < q.x || (p.x == q.x && p.y < q.y)) m = i
      i += 1
    }
    if (m == 0) return r
    val out = new Array[Pt](r.length)
    var j = 0
    while (j < r.length - 1) { out(j) = r((m + j) % (r.length - 1)); j += 1 }
    out(r.length - 1) = out(0)
    out
  }

  private def simplifyPts(pts: Array[Pt], tol: Double, minPts: Int): Array[Pt] = {
    if (pts.length <= math.max(minPts, 2)) return pts
    val keep = new Array[Boolean](pts.length)
    keep(0) = true; keep(pts.length - 1) = true
    val stack = scala.collection.mutable.Stack((0, pts.length - 1))
    while (stack.nonEmpty) {
      val (lo, hi) = stack.pop()
      var best = -1; var bestD = tol
      var i = lo + 1
      while (i < hi) {
        val d = distPointSegment(pts(i), pts(lo), pts(hi))
        if (d > bestD) { bestD = d; best = i }
        i += 1
      }
      if (best >= 0) {
        keep(best) = true
        stack.push((lo, best)); stack.push((best, hi))
      }
    }
    val out = Array.newBuilder[Pt]
    var i = 0
    while (i < pts.length) { if (keep(i)) out += pts(i); i += 1 }
    val res = out.result()
    if (res.length < minPts) pts else res // collapse guard: keep original
  }

  // ---- scalar observables (ST_Area / ST_NPoints analogs) -------------------
  /** Planar area; shells minus holes (ring 0 is the shell by construction). */
  def area(g: Geom): Double = g match {
    case _: PointG | _: MultiPointG | _: LineStringG | _: MultiLineStringG => 0.0
    case PolygonG(rings) =>
      math.abs(signedArea(rings.head)) - rings.tail.map(r => math.abs(signedArea(r))).sum
    case MultiPolygonG(ps) => ps.map(area(_)).sum
  }

  /** Total vertex count, ring closing points included (ST_NPoints parity). */
  def nPoints(g: Geom): Int = g match {
    case _: PointG            => 1
    case MultiPointG(pts)     => pts.length
    case LineStringG(pts)     => pts.length
    case MultiLineStringG(ls) => ls.map(_.pts.length).sum
    case PolygonG(rings)      => rings.map(_.length).sum
    case MultiPolygonG(ps)    => ps.map(p => p.rings.map(_.length).sum).sum
  }

  // ---- polygon assembly from way soup (ST_BuildArea analog) ----------------
  /**
   * Assemble a MultiPolygon from a bag of linestrings (OSM multipolygon
   * relation members — build_geometries.py:107: role-insensitive):
   * chain lines end-to-end into closed rings (exact coordinate equality, as
   * OSM ways share nodes), then classify shells vs holes by containment
   * parity. Returns None when no closed ring can be formed (matches
   * HAVING ST_BuildArea(...) IS NOT NULL).
   */
  def buildArea(lines: Seq[LineStringG]): Option[MultiPolygonG] = {
    // 1. chain into rings
    val pool = scala.collection.mutable.ArrayBuffer(
      lines.filter(_.pts.length >= 2).map(_.pts.toVector): _*)
    val rings = scala.collection.mutable.ArrayBuffer.empty[Array[Pt]]
    while (pool.nonEmpty) {
      var cur = pool.remove(0)
      var closed = cur.head == cur.last && cur.length > 3
      var progress = true
      while (!closed && progress) {
        progress = false
        val i = pool.indexWhere(l =>
          l.head == cur.last || l.last == cur.last ||
          l.head == cur.head || l.last == cur.head)
        if (i >= 0) {
          val nxt = pool.remove(i)
          cur =
            if (nxt.head == cur.last) cur ++ nxt.tail
            else if (nxt.last == cur.last) cur ++ nxt.reverse.tail
            else if (nxt.last == cur.head) nxt ++ cur.tail
            else cur.reverse ++ nxt.tail
          progress = true
          closed = cur.head == cur.last && cur.length > 3
        }
      }
      if (closed) rings += cur.toArray
    }
    if (rings.isEmpty) return None
    // 2. nesting parity: a ring inside an odd number of other rings is a hole
    val byArea = rings.sortBy(r => -math.abs(signedArea(r)))
    def inside(inner: Array[Pt], outer: Array[Pt]): Boolean = {
      val p = inner.find(q => !outer.contains(q)).getOrElse(inner(0))
      windingNumber(p, outer) != 0
    }
    val depth = byArea.map(r => byArea.count(o => (o ne r) && inside(r, o)))
    val shells = byArea.zip(depth).filter(_._2 % 2 == 0).map(_._1)
    val holes = byArea.zip(depth).filter(_._2 % 2 == 1).map(_._1)
    val polys = shells.map { shell =>
      val myHoles = holes.filter(h => inside(h, shell))
      PolygonG((shell +: myHoles).toArray)
    }
    Some(MultiPolygonG(polys.toArray))
  }

  // ---- WKB codec (ISO WKB, little-endian on write; both endians on read) ---
  private final val PointT = 1
  private final val LineT = 2
  private final val PolyT = 3
  private final val MPointT = 4
  private final val MLineT = 5
  private final val MPolyT = 6
  private final val CollT = 7

  def toWkb(g: Geom): Array[Byte] = {
    val buf = ByteBuffer.allocate(wkbSize(g)).order(ByteOrder.LITTLE_ENDIAN)
    writeGeom(buf, g)
    buf.array()
  }

  private def wkbSize(g: Geom): Int = g match {
    case PointG(_)            => 5 + 16
    case LineStringG(pts)     => 9 + 16 * pts.length
    case PolygonG(rings)      => 9 + rings.map(r => 4 + 16 * r.length).sum
    case MultiPointG(pts)     => 9 + pts.length * (5 + 16)
    case MultiLineStringG(ls) => 9 + ls.map(wkbSize(_)).sum
    case MultiPolygonG(ps)    => 9 + ps.map(wkbSize(_)).sum
  }

  private def writeGeom(buf: ByteBuffer, g: Geom): Unit = g match {
    case PointG(p) =>
      buf.put(1.toByte).putInt(PointT).putDouble(p.x).putDouble(p.y)
    case LineStringG(pts) =>
      buf.put(1.toByte).putInt(LineT).putInt(pts.length)
      pts.foreach(p => buf.putDouble(p.x).putDouble(p.y))
    case PolygonG(rings) =>
      buf.put(1.toByte).putInt(PolyT).putInt(rings.length)
      rings.foreach { r =>
        buf.putInt(r.length)
        r.foreach(p => buf.putDouble(p.x).putDouble(p.y))
      }
    case MultiPointG(pts) =>
      buf.put(1.toByte).putInt(MPointT).putInt(pts.length)
      pts.foreach(p => writeGeom(buf, PointG(p)))
    case MultiLineStringG(ls) =>
      buf.put(1.toByte).putInt(MLineT).putInt(ls.length)
      ls.foreach(writeGeom(buf, _))
    case MultiPolygonG(ps) =>
      buf.put(1.toByte).putInt(MPolyT).putInt(ps.length)
      ps.foreach(writeGeom(buf, _))
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    val buf = ByteBuffer.wrap(bytes)
    readGeom(buf)
  }

  private def readGeom(buf: ByteBuffer): Geom = {
    val byteOrder = buf.get()
    buf.order(if (byteOrder == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
    var typ = buf.getInt()
    // EWKB flags: SRID 0x20000000, Z 0x80000000, M 0x40000000; ISO WKB
    // encodes Z/M as type + 1000/2000/3000. Higher dimensions are projected
    // to XY by SKIPPING the extra ordinates — silently masking them (the r1
    // behavior) misaligned the buffer and produced garbage coordinates
    // (ADVICE r1).
    val hasSrid = (typ & 0x20000000) != 0
    var extraDims = 0
    if ((typ & 0x80000000) != 0) extraDims += 1 // EWKB Z
    if ((typ & 0x40000000) != 0) extraDims += 1 // EWKB M
    typ &= 0x1FFFFFFF
    if (typ >= 1000) { extraDims += (if (typ >= 3000) 2 else 1); typ %= 1000 }
    if (hasSrid) buf.getInt() // skip srid
    def readPt(): Pt = {
      val p = Pt(buf.getDouble(), buf.getDouble())
      var i = 0
      while (i < extraDims) { buf.getDouble(); i += 1 }
      p
    }
    // empty geometries (POLYGON EMPTY etc.) are legal WKB but would crash
    // far from the parse (rings(0), .min on no vertices) or, worse, produce
    // a wrapped-envelope phantom cell cover — fail HERE with a clear message
    def nonEmpty(n: Int, what: String): Int = {
      if (n <= 0) throw new IllegalArgumentException(
        s"empty $what geometry in WKB (EMPTY geometries are unsupported)")
      n
    }
    typ match {
      case PointT => PointG(readPt())
      case LineT =>
        val n = nonEmpty(buf.getInt(), "LINESTRING")
        val pts = Array.fill(n)(readPt())
        LineStringG(pts)
      case PolyT =>
        val nr = nonEmpty(buf.getInt(), "POLYGON")
        val rings = Array.fill(nr) {
          val n = nonEmpty(buf.getInt(), "POLYGON ring")
          Array.fill(n)(readPt())
        }
        PolygonG(rings)
      case MPointT =>
        val n = nonEmpty(buf.getInt(), "MULTIPOINT")
        MultiPointG(Array.fill(n)(readGeom(buf).asInstanceOf[PointG].p))
      case MLineT =>
        val n = nonEmpty(buf.getInt(), "MULTILINESTRING")
        MultiLineStringG(Array.fill(n)(readGeom(buf).asInstanceOf[LineStringG]))
      case MPolyT =>
        val n = nonEmpty(buf.getInt(), "MULTIPOLYGON")
        MultiPolygonG(Array.fill(n)(readGeom(buf).asInstanceOf[PolygonG]))
      case CollT =>
        val n = nonEmpty(buf.getInt(), "GEOMETRYCOLLECTION")
        val parts = Array.fill(n)(readGeom(buf))
        // flatten homogeneous collections; a heterogeneous one has no lossless
        // representation here — FAIL rather than silently truncate to parts(0)
        // (envelope/distance/cover on a fragment give wrong answers, no error)
        if (parts.forall(_.isInstanceOf[PolygonG]))
          MultiPolygonG(parts.map(_.asInstanceOf[PolygonG]))
        else if (parts.forall(_.isInstanceOf[LineStringG]))
          MultiLineStringG(parts.map(_.asInstanceOf[LineStringG]))
        else if (parts.forall(_.isInstanceOf[PointG]))
          MultiPointG(parts.map(_.asInstanceOf[PointG].p))
        else if (parts.length == 1) parts(0)
        else throw new IllegalArgumentException(
          "heterogeneous GEOMETRYCOLLECTION is unsupported (refusing to truncate)")
      case other => throw new IllegalArgumentException(s"unsupported WKB type $other")
    }
  }

  // ---- WKT (fixture convenience; subset) ------------------------------------
  def fromWkt(wkt: String): Geom = {
    val s = wkt.trim
    val open = s.indexOf('(')
    val name = s.substring(0, open).trim.toUpperCase
    val body = s.substring(open)
    def parsePts(str: String): Array[Pt] =
      str.split(",").map { t =>
        val parts = t.trim.split("\\s+")
        Pt(parts(0).toDouble, parts(1).toDouble)
      }
    def stripOuter(str: String): String = {
      val t = str.trim
      require(t.startsWith("(") && t.endsWith(")"), s"bad WKT body: $t")
      t.substring(1, t.length - 1)
    }
    def splitTop(str: String): Seq[String] = {
      val out = ArrayBuffer.empty[String]
      var depth = 0; var start = 0
      for (i <- str.indices) str(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += str.substring(start, i); start = i + 1
        case _ =>
      }
      out += str.substring(start)
      out.toSeq
    }
    name match {
      case "POINT" => PointG(parsePts(stripOuter(body))(0))
      case "LINESTRING" => LineStringG(parsePts(stripOuter(body)))
      case "POLYGON" =>
        PolygonG(splitTop(stripOuter(body)).map(r => parsePts(stripOuter(r))).toArray)
      case "MULTIPOLYGON" =>
        MultiPolygonG(splitTop(stripOuter(body)).map { p =>
          PolygonG(splitTop(stripOuter(p)).map(r => parsePts(stripOuter(r))).toArray)
        }.toArray)
      case other => throw new IllegalArgumentException(s"unsupported WKT: $other")
    }
  }

  def toWkt(g: Geom): String = g match {
    case PointG(p) => s"POINT(${fmt(p.x)} ${fmt(p.y)})"
    case LineStringG(pts) => s"LINESTRING(${pts.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(",")})"
    case PolygonG(rings) =>
      s"POLYGON(${rings.map(r => "(" + r.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(",") + ")").mkString(",")})"
    case MultiPolygonG(ps) =>
      s"MULTIPOLYGON(${ps.map(p => toWkt(p).stripPrefix("POLYGON")).mkString(",")})"
    case MultiPointG(pts) => s"MULTIPOINT(${pts.map(p => s"${fmt(p.x)} ${fmt(p.y)}").mkString(",")})"
    case MultiLineStringG(ls) =>
      s"MULTILINESTRING(${ls.map(l => toWkt(l).stripPrefix("LINESTRING")).mkString(",")})"
  }
  private def fmt(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString
}
