package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.core.tags.Tags
import graft.functions.GeoFunctions._
import graft.operators.SpatialJoin
import graft.engine.MatchEngine.MatchConfig
import graft.engine.Incremental.OsmEditBatch

/**
 * End-to-end port of the reference's own e2e test
 * (database/tests/test_recalculate_on_element.sql:1-108): the synthetic
 * "toilets" dataset — 7 upstream items, 16 OSM elements, ST_DWithin(100)
 * match, "Removed" anti leg at 500 m — expecting exactly 6 deviations, then
 * the four OSM-edit lifecycle assertions (fixed / re-titled / recalculated).
 */
class ToiletsE2ESpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def pointWkb(x: Double, y: Double) = Geom.toWkb(Geom.point(x, y))
  private def envWkb(x0: Double, y0: Double, x1: Double, y1: Double) =
    Geom.toWkb(Geom.envelopePoly(x0, y0, x1, y1))
  private def ringWkb(x0: Double, y0: Double, x1: Double, y1: Double) =
    Geom.toWkb(graft.core.geom.LineStringG(Array(
      graft.core.geom.Pt(x0, y0), graft.core.geom.Pt(x1, y0),
      graft.core.geom.Pt(x1, y1), graft.core.geom.Pt(x0, y1),
      graft.core.geom.Pt(x0, y0))))

  /** the full 16-row osm.element fixture (nodes + ways + areas) */
  private def elementRows: Seq[(String, Long, Map[String, String], Array[Byte])] = Seq(
    ("n", 42L, Map("amenity" -> "toilets"), pointWkb(1000, 1000)),
    ("n", 43L, Map("amenity" -> "toilets", "name" -> "Point toilet B"), pointWkb(2050, 1050)),
    ("n", 44L, Map("amenity" -> "toilets"), pointWkb(4050, 1050)),
    ("n", 45L, Map("amenity" -> "toilets", "name" -> "Point toilet E"), pointWkb(5050, 1050)),
    ("n", 101L, Map.empty[String, String], pointWkb(1025, 2025)),
    ("n", 102L, Map.empty[String, String], pointWkb(1025, 2025)),
    ("n", 103L, Map.empty[String, String], pointWkb(1050, 2050)),
    ("n", 104L, Map.empty[String, String], pointWkb(1025, 2050)),
    ("n", 111L, Map.empty[String, String], pointWkb(2005, 2005)),
    ("n", 112L, Map.empty[String, String], pointWkb(2025, 2005)),
    ("n", 113L, Map.empty[String, String], pointWkb(2025, 2025)),
    ("n", 114L, Map.empty[String, String], pointWkb(2005, 2025)),
    ("w", 51L, Map("amenity" -> "toilets"), ringWkb(1025, 2025, 1050, 2050)),
    ("w", 52L, Map("amenity" -> "toilets", "name" -> "Polygon toilet B"), ringWkb(2005, 2005, 2025, 2025)),
    ("a", 51L, Map("amenity" -> "toilets"), envWkb(1025, 2025, 1050, 2050)),
    ("a", 52L, Map("amenity" -> "toilets", "name" -> "Polygon toilet B"), envWkb(2005, 2005, 2025, 2025)))

  private def itemRows: Seq[(Long, String, Array[Byte])] = Seq(
    (1L, "Point toilet A", pointWkb(1000, 1000)),
    (2L, "Point toilet B", pointWkb(2000, 1000)),
    (3L, "Point toilet C", pointWkb(3000, 1000)),
    (4L, "Point toilet D", pointWkb(4000, 1000)),
    (5L, "Polygon toilet A", envWkb(1000, 2000, 1025, 2025)),
    (6L, "Polygon toilet B", envWkb(2000, 2000, 2025, 2025)),
    (7L, "Polygon toilet C", envWkb(3000, 2000, 3025, 2025)))

  private def elementsDf(rows: Seq[(String, Long, Map[String, String], Array[Byte])]): DataFrame =
    SpatialJoin.withGeoMeta(rows.toDF("type", "id", "tags", "geom"), "geom")

  private def itemsDf: DataFrame =
    SpatialJoin.withGeoMeta(
      itemRows.toDF("id", "iname", "geometry")
        .withColumn("ids", array(col("id")))
        .withColumn("tags", map(lit("amenity"), lit("toilets"), lit("name"), col("iname"))),
      "geometry")

  /** the test deviation view (test_recalculate_on_element.sql:47-86) */
  private def toiletsView(elements: DataFrame): DataFrame = {
    val osm = elements.filter(
      col("tags")("amenity") === "toilets" && col("type").isin("n", "a"))
    val matched = MatchEngine.matchView(osm, itemsDf, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 100.0),
      cellSize = 1000.0,
      antiLeg = true,
      antiMatchSpec = Some(Tags.MatchSpec(None, Nil, dOther = 500.0))))
    val isAnti = size(col("upstream_item_ids")) === 0
    matched
      .filter(isAnti ||
        col("osm_element_id").isNull ||
        !(col("osm_tags")("name") <=> col("upstream_tags")("name")))
      .select(
        lit(1L).as("dataset_id"),
        lit(1L).as("layer_id"),
        col("upstream_item_ids"),
        when(isAnti, lit(null).cast("binary"))
          .when(col("osm_element_id").isNull, col("upstream_geom"))
          .otherwise(lit(null).cast("binary")).as("suggested_geom"),
        when(isAnti, lit(null).cast("map<string,string>"))
          .otherwise(tagDiff(coalesce(col("osm_tags"), map().cast("map<string,string>")),
            col("upstream_tags"))).as("suggested_tags"),
        col("osm_element_id"),
        col("osm_element_type"),
        when(isAnti, "Removed")
          .when(col("osm_element_id").isNull, "Missing")
          .otherwise("Incomplete").as("title"),
        lit("").as("description"),
        lit("").as("note"),
        lit("test_dataset").as("view_name"),
        stCentroidWkb(coalesce(col("osm_geom"), col("upstream_geom"))).as("center"))
  }

  private val ts = java.sql.Timestamp.valueOf("2026-01-02 00:00:00")
  private def items = itemsDf.select("id", "iname")

  test("toilets fixture: 6 deviations, then the full OSM-edit lifecycle") {
    val dir = java.nio.file.Files.createTempDirectory("toilets").toString
    val store = new DeviationStore(spark, dir)

    var elements = elementRows
    assert(elementsDf(elements).count() == 16)

    val view0 = toiletsView(elementsDf(elements)).cache()
    assert(view0.count() == 6, view0.collect().mkString("\n"))
    val byTitle = view0.groupBy("title").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTitle == Map("Missing" -> 2L, "Incomplete" -> 3L, "Removed" -> 1L))
    // spot-check suggested tags
    val itemA = view0.filter(array_contains(col("upstream_item_ids"), 1L)).collect()(0)
    assert(itemA.getAs[Map[String, String]]("suggested_tags") == Map("name" -> "Point toilet A"))
    assert(itemA.getAs[String]("title") == "Incomplete")

    val (ins, del) = store.sync("test_dataset", view0)
    assert(ins == 6 && del == 0)
    assert(store.latest().count() == 6)

    // --- 1. delete node 45: suggested-delete is performed -> fixed
    elements = elements.filterNot(e => e._1 == "n" && e._2 == 45L)
    val curElems1 = elementsDf(elements)
    Incremental.applyEdits(store,
      OsmEditBatch(deleted = Some(Seq(("n", 45L)).toDF("type", "id"))),
      () => toiletsView(curElems1), items, "test_dataset", ts)
    val after1 = store.latest().filter(col("osm_element_id") === 45).collect()
    assert(after1.length == 1 && after1(0).getAs[String]("action") == "fixed",
      after1.mkString(";"))

    // --- 2. delete node 44: suggested change is deleted instead -> Missing
    elements = elements.filterNot(e => e._1 == "n" && e._2 == 44L)
    val curElems2 = elementsDf(elements)
    Incremental.applyEdits(store,
      OsmEditBatch(deleted = Some(Seq(("n", 44L)).toDF("type", "id"))),
      () => toiletsView(curElems2), items, "test_dataset", ts)
    val after2 = store.latest()
      .filter(col("suggested_tags")("name") === "Point toilet D").collect()
    assert(after2.length == 1 && after2(0).getAs[String]("title") == "Missing",
      after2.mkString(";"))

    // --- 3. insert node 1000 near item C -> Incomplete, not yet fixed
    val pre3 = store.latest().filter(col("suggested_tags")("name") === "Point toilet C").collect()
    assert(pre3.length == 1 && pre3(0).getAs[String]("title") == "Missing")
    val node1000 = SpatialJoin.withGeoMeta(
      Seq(("n", 1000L, Map("amenity" -> "toilets"), pointWkb(3010, 1010)))
        .toDF("type", "id", "tags", "geom"), "geom")
    elements = elements :+ (("n", 1000L, Map("amenity" -> "toilets"), pointWkb(3010, 1010)))
    val curElems3 = elementsDf(elements)
    Incremental.applyEdits(store,
      OsmEditBatch(inserted = Some(node1000)),
      () => toiletsView(curElems3), items, "test_dataset", ts)
    val after3 = store.latest()
      .filter(col("suggested_tags")("name") === "Point toilet C").collect()
    assert(after3.length == 1 && after3(0).getAs[String]("title") == "Incomplete", after3.mkString(";"))
    assert(after3(0).getAs[String]("action") == null)

    // --- 4. add the name -> fixed (title stays Incomplete)
    val node1000v2 = SpatialJoin.withGeoMeta(
      Seq(("n", 1000L, Map("amenity" -> "toilets", "name" -> "Point toilet C"), pointWkb(3010, 1010)))
        .toDF("type", "id", "tags", "geom"), "geom")
    elements = elements.filterNot(e => e._1 == "n" && e._2 == 1000L) :+
      (("n", 1000L, Map("amenity" -> "toilets", "name" -> "Point toilet C"), pointWkb(3010, 1010)))
    val curElems4 = elementsDf(elements)
    Incremental.applyEdits(store,
      OsmEditBatch(updated = Some(node1000v2)),
      () => toiletsView(curElems4), items, "test_dataset", ts)
    val after4 = store.latest()
      .filter(col("suggested_tags")("name") === "Point toilet C").collect()
    assert(after4.length == 1 && after4(0).getAs[String]("title") == "Incomplete", after4.mkString(";"))
    assert(after4(0).getAs[String]("action") == "fixed")
  }
}
