package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom._

/**
 * scripts/update-municipality-geometries.sql — simplify kernel semantics and
 * the rebuild job: predicate filters, GROUP BY code across relations, the
 * COALESCE(old) branches (open ring / no relation), and that only matching
 * codes are touched.
 */
class MunicipalityGeometrySpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def ring(pts: (Double, Double)*): Array[Pt] =
    pts.map { case (x, y) => Pt(x, y) }.toArray

  private val c0 = (0.0, 0.0); private val c1 = (100.0, 0.0)
  private val c2 = (100.0, 100.0); private val c3 = (0.0, 100.0)

  test("simplify: collinear and sub-tolerance vertices drop, corners survive") {
    val r = ring(c0, (50, 3), c1, (100, 50), c2, (50, 100), c3, (0, 50), c0)
    val s5 = Geom.simplify(PolygonG(Array(r)), 5.0).asInstanceOf[PolygonG]
    assert(s5.rings.head.toSeq == ring(c0, c1, c2, c3, c0).toSeq)
    // tighter tolerance keeps the 3-off midpoint but drops the collinear ones
    val s2 = Geom.simplify(PolygonG(Array(r)), 2.0).asInstanceOf[PolygonG]
    assert(s2.rings.head.toSeq == ring(c0, (50, 3), c1, c2, c3, c0).toSeq)
  }

  test("simplify: ring rotation (chain start) does not change the kept set") {
    val a = ring(c0, (50, 3), c1, c2, c3, c0)
    val b = ring(c2, c3, c0, (50, 3), c1, c2)   // chained from another corner
    val c = ring((50, 3), c1, c2, c3, c0, (50, 3)) // chained from the REMOVABLE vertex
    val Seq(sa, sb, sc) = Seq(a, b, c).map(r =>
      Geom.simplify(PolygonG(Array(r)), 5.0).asInstanceOf[PolygonG])
    assert(sa.rings.head.toSet == sb.rings.head.toSet)
    assert(sa.rings.head.toSet == sc.rings.head.toSet,
      "a chain starting at a sub-tolerance vertex must not pin that vertex")
    assert(sa.rings.head.length == 5 && sb.rings.head.length == 5 && sc.rings.head.length == 5)
  }

  test("simplify: collapse guard keeps a ring that would fall below 4 points") {
    val thin = ring((0, 0), (100, 0), (50, 1), (0, 0))
    val s = Geom.simplify(PolygonG(Array(thin)), 5.0).asInstanceOf[PolygonG]
    assert(s.rings.head.toSeq == thin.toSeq) // unchanged, not collapsed
  }

  test("simplify: lines keep endpoints; holes simplified per ring") {
    val l = Geom.simplify(LineStringG(ring((0, 0), (50, 1), (100, 0))), 5.0)
    assert(l.asInstanceOf[LineStringG].pts.toSeq == ring((0, 0), (100, 0)).toSeq)
    val withHole = PolygonG(Array(
      ring(c0, (50, 3), c1, c2, c3, c0),
      ring((20, 20), (30, 20), (25, 20.5), (30, 30), (20, 30), (20, 20))))
    val s = Geom.simplify(withHole, 5.0).asInstanceOf[PolygonG]
    assert(s.rings(0).length == 5 && s.rings(1).length == 5)
  }

  test("municipalityGeometries: rebuild, merge-by-code, and old-geom branches") {
    val knkod = Map("type" -> "boundary", "admin_level" -> "7")
    val relations = Seq(
      (1L, knkod + ("KNKOD" -> "0101")),
      (2L, knkod + ("KNKOD" -> "0202")), // two relations, same code:
      (3L, knkod + ("KNKOD" -> "0202")), //   neither alone closes the ring
      (4L, knkod + ("KNKOD" -> "0404")), // open soup -> BuildArea NULL
      (5L, Map("type" -> "route", "admin_level" -> "7", "KNKOD" -> "0505")),
      (6L, Map("type" -> "boundary", "admin_level" -> "8", "KNKOD" -> "0505")),
      (7L, knkod))                       // no KNKOD
      .toDF("id", "tags")
    def way(id: Long, pts: (Double, Double)*): (Long, Array[Byte]) =
      id -> Geom.toWkb(LineStringG(ring(pts: _*)))
    // rel 1: square with a sub-tolerance midpoint per edge (simplify observable)
    val ways = Seq(
      way(11, c0, (50, 3), c1), way(12, c1, (97, 50), c2),
      way(13, c2, (50, 97), c3), way(14, c3, (3, 50), c0),
      // rels 2+3: each holds half the square's edges
      way(21, (200, 0), (300, 0)), way(22, (300, 0), (300, 100)),
      way(31, (300, 100), (200, 100)), way(32, (200, 100), (200, 0)),
      // rel 4: only 3 edges
      way(41, (400, 0), (500, 0)), way(42, (500, 0), (500, 100)),
      way(43, (500, 100), (400, 100)),
      // rels 5-7: closable, but the relations fail the predicates
      way(51, (600, 0), (700, 0), (700, 100)), way(52, (700, 100), (600, 100), (600, 0)),
      way(61, (600, 0), (700, 0), (700, 100)), way(62, (700, 100), (600, 100), (600, 0)),
      way(71, (600, 0), (700, 0), (700, 100)), way(72, (700, 100), (600, 100), (600, 0)))
      .toDF("id", "geom")
    val rmw = Seq(
      (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 21L), (2L, 22L), (3L, 31L), (3L, 32L),
      (4L, 41L), (4L, 42L), (4L, 43L),
      (5L, 51L), (5L, 52L), (6L, 61L), (6L, 62L), (7L, 71L), (7L, 72L))
      .toDF("relation_id", "member_id")
    val old = Geom.toWkb(Geom.point(9, 9))
    val munis = Seq("0101", "0202", "0303", "0404", "0505")
      .map(c => (c, s"M$c", old)).toDF("code", "name", "geom")

    val out = GeometryAssembly
      .municipalityGeometries(relations, rmw, ways, munis, tolerance = 10.0)
      .collect().map(r => r.getAs[String]("code") ->
        Geom.fromWkb(r.getAs[Array[Byte]]("geom"))).toMap
    assert(out.keySet == Set("0101", "0202", "0303", "0404", "0505"))

    val g1 = out("0101").asInstanceOf[MultiPolygonG]
    assert(Geom.nPoints(g1) == 5, s"simplify must drop the 4 midpoints: $g1")
    assert(Geom.area(g1) == 10000.0)
    val g2 = out("0202").asInstanceOf[MultiPolygonG]
    assert(Geom.area(g2) == 10000.0 && g2.envelope == Envelope(200, 0, 300, 100),
      "ways of two relations sharing a KNKOD must merge before assembly")
    for (c <- Seq("0303", "0404", "0505"))
      assert(Geom.toWkt(out(c)) == Geom.toWkt(Geom.point(9, 9)),
        s"$c must keep its old geometry (no relation / open ring / bad predicate)")
  }
}
