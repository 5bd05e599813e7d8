package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom._
import graft.operators.SpatialJoin

/** Geometry assembly (T2/T3, port of the element-trigger/build_geometries
  * expectations) + XML export and read-API checks. */
class AssemblyExportsSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def pt(x: Double, y: Double) = Geom.toWkb(Geom.point(x, y))

  test("way geometry assembly + closed-way areas + multipolygon relations") {
    // nodes of a closed square ring (51) and an open way (61), plus a
    // multipolygon relation 71 made of two open ways forming a ring with a
    // hole ring (72/73)
    val nodes = SpatialJoin.withGeoMeta(Seq(
      (101L, pt(0.0, 0.0)), (102L, pt(10.0, 0.0)), (103L, pt(10.0, 10.0)), (104L, pt(0.0, 10.0)),
      (201L, pt(50.0, 50.0)), (202L, pt(60.0, 50.0)),
      // outer ring nodes for relation
      (301L, pt(100.0, 100.0)), (302L, pt(140.0, 100.0)), (303L, pt(140.0, 140.0)), (304L, pt(100.0, 140.0)),
      // hole ring nodes
      (401L, pt(110.0, 110.0)), (402L, pt(120.0, 110.0)), (403L, pt(120.0, 120.0)), (404L, pt(110.0, 120.0)))
      .toDF("id", "geom"), "geom")
    val ways = Seq(
      (51L, Map("building" -> "yes")),
      (61L, Map("highway" -> "path")),
      (72L, Map.empty[String, String]), // half of outer ring
      (73L, Map.empty[String, String]), // other half
      (74L, Map.empty[String, String])) // hole ring (closed)
      .toDF("id", "tags")
    val wayNodes = Seq(
      (51L, 101L, 1), (51L, 102L, 2), (51L, 103L, 3), (51L, 104L, 4), (51L, 101L, 5),
      (61L, 201L, 1), (61L, 202L, 2),
      (72L, 301L, 1), (72L, 302L, 2), (72L, 303L, 3),
      (73L, 303L, 1), (73L, 304L, 2), (73L, 301L, 3),
      (74L, 401L, 1), (74L, 402L, 2), (74L, 403L, 3), (74L, 404L, 4), (74L, 401L, 5))
      .toDF("way_id", "node_id", "sequence_order")
    val relations = Seq((71L, Map("type" -> "multipolygon", "natural" -> "wood")))
      .toDF("id", "tags")
    val relMemberWays = Seq((71L, 72L), (71L, 73L), (71L, 74L))
      .toDF("relation_id", "member_id")

    val waysG = GeometryAssembly.buildWayGeoms(ways, wayNodes, nodes).cache()
    val w51 = Geom.fromWkb(waysG.filter(col("id") === 51).collect()(0).getAs[Array[Byte]]("geom"))
    assert(Geom.toWkt(w51) == "LINESTRING(0 0,10 0,10 10,0 10,0 0)")
    val w61 = Geom.fromWkb(waysG.filter(col("id") === 61).collect()(0).getAs[Array[Byte]]("geom"))
    assert(Geom.toWkt(w61) == "LINESTRING(50 50,60 50)")

    val areasW = GeometryAssembly.areasFromWays(waysG).collect()
    assert(areasW.map(_.getLong(0)).toSet == Set(51L, 74L)) // closed rings only
    val a51 = Geom.fromWkb(areasW.find(_.getLong(0) == 51).get.getAs[Array[Byte]]("geom"))
    assert(a51.isInstanceOf[MultiPolygonG])
    assert(math.abs(a51.asInstanceOf[MultiPolygonG].polys(0).area - 100.0) < 1e-9)

    val areasR = GeometryAssembly.areasFromRelations(relations, relMemberWays, waysG).collect()
    assert(areasR.length == 1)
    assert(areasR(0).getLong(0) == 71L + 3600000000L) // relation area id offset
    val mp = Geom.fromWkb(areasR(0).getAs[Array[Byte]]("geom")).asInstanceOf[MultiPolygonG]
    // outer 40x40 minus 10x10 hole = 1500
    assert(math.abs(mp.polys.map(_.area).sum - 1500.0) < 1e-6, s"area ${mp.polys.map(_.area).sum}")
    assert(!mp.containsPoint(Pt(115, 115)), "hole must be excluded")
    assert(mp.containsPoint(Pt(105, 105)))

    // element table: nodes + ways-with-geom + areas
    val elems = GeometryAssembly.elements(
      nodes.withColumn("tags", map().cast("map<string,string>")),
      waysG, areasW.length match { case _ =>
        GeometryAssembly.areasFromWays(waysG)
          .unionByName(GeometryAssembly.areasFromRelations(relations, relMemberWays, waysG)) })
    assert(elems.groupBy("type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("n" -> 14L, "w" -> 5L, "a" -> 3L))

    // dirty propagation: touching node 102 dirties way 51 only; touching a
    // ring way dirties relation 71
    val (dw, dr) = GeometryAssembly.propagateDirty(
      Seq(102L).toDF("id"), Seq(73L).toDF("id"), wayNodes, relMemberWays)
    assert(dw.collect().map(_.getLong(0)).toSet == Set(51L, 73L))
    assert(dr.collect().map(_.getLong(0)).toSet == Set(71L))
  }

  test("osmChange / JOSM / GPX exports render the reference structure") {
    val devs = Seq(
      // missing -> <create> with negative id
      (1L, 1L, Seq(1L), pt(617000, 6728000), Map("amenity" -> "toilets", "name" -> "A"),
        null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], "Missing", "d", "", "v", pt(617000, 6728000), "0000", null.asInstanceOf[String]),
      // incomplete on node 42 -> <modify> merging suggested over existing
      (1L, 1L, Seq(2L), null.asInstanceOf[Array[Byte]], Map("name" -> "B", "old" -> null),
        java.lang.Long.valueOf(42L), "n", "Incomplete", "d", "", "v", pt(618000, 6729000), "0000", null.asInstanceOf[String]))
      .toDF("dataset_id", "layer_id", "upstream_item_ids", "suggested_geom", "suggested_tags",
        "osm_element_id", "osm_element_type", "title", "description", "note", "view_name",
        "center", "municipality_code", "action")
    val elements = Seq(("n", 42L, Map("amenity" -> "toilets", "keep" -> "me")))
      .toDF("type", "id", "tags")

    val osc = Exports.osmChange(devs, elements)
    assert(osc.contains("<osmChange version=\"0.6\""))
    assert("<node id=\"-\\d+\" version=\"0\"".r.findFirstIn(osc).isDefined, osc)
    assert(osc.contains("lon=\"17.14") && osc.contains("lat=\"60.6"), osc)
    assert(osc.contains("""<tag k="amenity" v="toilets"/>"""))
    // modify: suggested non-null tags + existing tags not overridden
    assert(osc.contains("<node id=\"42\" version=\"1\">"), osc)
    assert(osc.contains("""<tag k="name" v="B"/>"""))
    assert(osc.contains("""<tag k="keep" v="me"/>"""))
    // "old" has a null value (deletion) -> not emitted in modify
    assert(!osc.contains("""k="old""""), osc)
    // existing amenity not in suggested -> kept
    assert(osc.split("<modify>")(1).contains("""<tag k="amenity" v="toilets"/>"""))

    val josm = Exports.josmChange(devs, elements)
    assert(josm.contains("<osm version=\"0.6\" upload=\"false\""))
    assert(josm.contains("<bounds minlat="), josm)
    assert(josm.contains("action=\"modify\""))

    val row = devs.filter(col("title") === "Missing").collect()(0)
    val gpx = Exports.gpx(row, Seq(Map("orig" -> "x")), "2026-01-01T00:00:00Z")
    assert(gpx.contains("<wpt lat=\"60.6") && gpx.contains("<desc>Missing</desc>"), gpx)
    assert(gpx.contains("amenity=toilets  -  name=A"))
    assert(gpx.contains("<cmt>orig=x</cmt>"))
  }

  test("read API: deviation_title counts, extent, nearby kNN") {
    val devs = Seq(
      (1L, 1L, "T1", "0001", pt(1000, 1000), 1L),
      (1L, 1L, "T1", "0001", pt(1100, 1000), 2L),
      (1L, 1L, "T2", "0001", pt(1150, 1000), 3L),
      (2L, 1L, "T1", "0002", pt(9000, 9000), 4L))
      .toDF("dataset_id", "layer_id", "title", "municipality_code", "center", "key")

    val titles = ReadApi.deviationTitle(devs).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(4)).sum).toMap
    assert(titles == Map("T1" -> 3L, "T2" -> 1L))
    // per-(title, muni) grouping is preserved: T1 splits into 2 + 1
    assert(ReadApi.deviationTitle(devs).count() == 3)

    val ext = ReadApi.datasetExtent(devs).filter(col("dataset_id") === 1).collect()(0)
    assert(ext.getDouble(1) == 1000.0 && ext.getDouble(3) == 1150.0)

    val nb = ReadApi.nearby(devs, "key", k = 10, radius = 250.0)
      .select(col("p_key"), col("b_key"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // within 250 m: 1<->2 (100 m), 2<->3 (50 m), 1<->3 (150 m); 4 isolated
    assert(nb == Set((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L)), nb)
  }

  test("nearby ranks stay 1..k when deviations are co-located (self not rank-1)") {
    // three deviations at the SAME point: for probe key=2, the dist-0 ties
    // sort (b_key 1, 2, 3) so self sits at rank 2 of the raw kNN — the rank
    // must still come out 1..k after self-exclusion, not (0, 2)
    val devs = Seq(
      (1L, 1L, "T", "0001", pt(1000, 1000), 1L),
      (1L, 1L, "T", "0001", pt(1000, 1000), 2L),
      (1L, 1L, "T", "0001", pt(1000, 1000), 3L))
      .toDF("dataset_id", "layer_id", "title", "municipality_code", "center", "key")
    val nb = ReadApi.nearby(devs, "key", k = 10, radius = 250.0)
      .select(col("p_key"), col("b_key"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(nb.length == 6)
    nb.groupBy(_._1).foreach { case (p, rows) =>
      assert(rows.map(_._3).sorted.sameElements(Array(1, 2)), s"probe $p ranks: ${rows.mkString(",")}")
      assert(!rows.exists(_._2 == p), s"self pair leaked for $p")
    }
  }
}
