package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom._

/** osm.site (30-osm-site.sql) — role-filtered member joins into areas,
  * including the reference's verbatim quirk: the rmr join's role filter
  * tests rmw.role, so relation-member areas surface only alongside a
  * QUALIFYING way member, once per such member. */
class SiteViewSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def pt(x: Double, y: Double) = Geom.toWkb(Geom.point(x, y))

  test("siteView reproduces the reference join semantics and quirk") {
    val relations = Seq(
      (1L, Map("site" -> "a")),          // way member + rel member, both with areas
      (2L, Map("site" -> "b")),          // ONLY a relation member (quirk: never surfaces)
      (3L, Map("name" -> "x")),          // not site-tagged
      (4L, Map("site" -> "d")),          // way member with non-qualifying role
      (5L, Map("site" -> "e")),          // 2 qualifying way members x 2 rel members
      (90L, Map.empty[String, String]),  // rel-member targets
      (91L, Map.empty[String, String]),
      (92L, Map.empty[String, String]))
      .toDF("id", "tags")
    val rmw = Seq(
      (1L, 11L, "outer"),
      (4L, 41L, "inner"),               // role not in (perimeter, boundary, outer)
      (5L, 51L, "perimeter"), (5L, 52L, "boundary"))
      .toDF("relation_id", "member_id", "role")
    val rmr = Seq(
      (1L, 90L, "outer"),
      (2L, 91L, "outer"),               // quirk victim: qualifying role, no way member
      (5L, 92L, "anything"), (5L, 93L, "outer")) // 93 has no area
      .toDF("relation_id", "member_id", "role")
    val areas = Seq(
      (11L, Option(11L), Option.empty[Long], pt(1, 1)),
      (41L, Option(41L), Option.empty[Long], pt(4, 1)),
      (51L, Option(51L), Option.empty[Long], pt(5, 1)),
      (52L, Option(52L), Option.empty[Long], pt(5, 2)),
      (3600000090L, Option.empty[Long], Option(90L), pt(9, 0)),
      (3600000091L, Option.empty[Long], Option(91L), pt(9, 1)),
      (3600000092L, Option.empty[Long], Option(92L), pt(9, 2)))
      .toDF("id", "way_id", "relation_id", "geom")

    // decode via point x/y (geoms here are points)
    val rows = GeometryAssembly.siteView(relations, rmw, rmr, areas)
      .collect()
      .map { r =>
        val g = Geom.fromWkb(r.getAs[Array[Byte]]("geom")).asInstanceOf[PointG]
        (r.getLong(0), g.p.x, g.p.y)
      }.toSeq.sorted

    val expected = Seq(
      // rel 1: way area (1,1) x 1 rmr row; rel area (9,0) x 1 way member
      (1L, 1.0, 1.0), (1L, 9.0, 0.0),
      // rel 5: way areas (5,1) and (5,2), each x 2 rmr rows;
      // rel area (9,2) once per qualifying way member (x 2)
      (5L, 5.0, 1.0), (5L, 5.0, 1.0), (5L, 5.0, 2.0), (5L, 5.0, 2.0),
      (5L, 9.0, 2.0), (5L, 9.0, 2.0)).sorted
    assert(rows == expected,
      s"rel 2 (quirk), rel 3 (untagged), rel 4 (bad role) must be absent; got $rows")
  }
}
