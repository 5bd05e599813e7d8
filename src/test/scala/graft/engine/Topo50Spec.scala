package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.operators.SpatialJoin

/** topo50 category-fan-out parity: per-category OSM predicates, computed
  * titles/layers from `andamal`, min-diff alternative selection. */
class Topo50Spec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def pt(x: Double, y: Double) = Geom.toWkb(Geom.point(x, y))

  test("anlaggningsomradespunkt: 3 categories, computed titles and layers") {
    val items = SpatialJoin.withGeoMeta(Seq(
      (1L, 139L, """{"andamal":"Idrottsanläggning"}""", pt(1000, 1000)),
      (2L, 139L, """{"andamal":"Badplats"}""", pt(5000, 5000)),
      (3L, 139L, """{"andamal":"Skjutbana, mindre"}""", pt(9000, 9000)))
      .toDF("id", "dataset_id", "original_attributes", "geometry"), "geometry")
    val osm = SpatialJoin.withGeoMeta(Seq(
      // a stadium 100 m from item 1: matches category 1 ONLY
      ("n", 1L, Map("leisure" -> "stadium"), pt(1100, 1000)),
      // a bathing place near item 2 with full tags -> no deviation
      ("n", 2L, Map("leisure" -> "bathing_place"), pt(5010, 5000)),
      // a generic pitch near item 3: category 2 needs sport=shooting -> no match
      ("n", 3L, Map("leisure" -> "pitch"), pt(9010, 9000)))
      .toDF("type", "id", "tags", "geom"), "geom")

    val m = Topo50.matchView(osm, items)
    val dev = Topo50.deviations(m).collect()
    val byItem = dev.map(r =>
      r.getAs[scala.collection.Seq[Long]]("upstream_item_ids").head -> r).toMap

    // item 1: matched the stadium; best alternative is {leisure=stadium}
    // (0-key diff) -> filtered OUT by MissingOrDiffNonEmpty... unless the
    // alternatives force a diff. diff({leisure=stadium},{leisure=stadium})={}
    // -> NO deviation for item 1.
    assert(!byItem.contains(1L), byItem.keySet.toString)
    // item 2: matched with exact tags -> no deviation either
    assert(!byItem.contains(2L))
    // item 3: shooting range has no qualifying OSM -> Missing, computed title
    val d3 = byItem(3L)
    assert(d3.getAs[String]("title") == "Skjutbana saknas") // '^[^, ]+' strips ', mindre'
    assert(d3.getAs[Long]("layer_id") == 9L)
    assert(d3.getAs[String]("description").contains("ska det finnas en skjutbana här"))
    assert(d3.getAs[Map[String, String]]("suggested_tags") ==
      Map("leisure" -> "pitch", "sport" -> "shooting"))
    assert(dev.length == 1, dev.mkString("\n"))

    // match rows still carry the per-category note (mv_match parity)
    val notes = m.filter(size(col("upstream_item_ids")) > 0)
      .select("note_c").distinct().collect().map(_.getString(0)).toSet
    assert(notes.exists(_.contains("flygbild")))
  }

  test("fused single-join match is row-identical to the per-category legs") {
    // items across several categories incl. the 1000 m Vintersport radius
    // and an OSM element satisfying TWO categories' predicates (pitch)
    val items = SpatialJoin.withGeoMeta(Seq(
      (1L, 140L, """{"andamal":"Golfbana"}""", pt(1000, 1000)),
      (2L, 140L, """{"andamal":"Vintersportanläggning"}""", pt(5000, 5000)),
      (3L, 140L, """{"andamal":"Bollplan?"}""", pt(9000, 9000)), // no category
      (4L, 140L, """{"andamal":"Ospecificerad","objekttyp":"Industriområde"}""", pt(12000, 12000)),
      (5L, 140L, """{"andamal":"Täkt"}""", pt(15000, 15000)))
      .toDF("id", "dataset_id", "original_attributes", "geometry"), "geometry")
    val osm = SpatialJoin.withGeoMeta(Seq(
      ("n", 1L, Map("leisure" -> "golf_course"), pt(1100, 1000)),
      // 800 m away: inside Vintersport's 1000 m but outside any 500 m radius
      ("a", 2L, Map("landuse" -> "winter_sports"), pt(5800, 5000)),
      ("n", 4L, Map("landuse" -> "industrial"), pt(12100, 12000)),
      ("n", 5L, Map("landuse" -> "quarry"), pt(15050, 15000)))
      .toDF("type", "id", "tags", "geom"), "geom")

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(
        concat_ws(",", transform(col("upstream_item_ids"), _.cast("string"))),
        col("osm_element_id"), col("osm_element_type"),
        graft.functions.GeoFunctions.tagsToJson(col("osm_tags")),
        col("andamal"), col("note_c"), round(col("dist"), 6))
        .collect().map(_.toString).sorted.toSeq

    val fused = canon(Topo50.matchView(osm, items, Topo50.anlaggningsomrade, 140L))
    val perLeg = canon(Topo50.matchViewPerLeg(osm, items, Topo50.anlaggningsomrade, 140L))
    assert(fused.nonEmpty && fused == perLeg,
      s"fused=${fused.mkString("|")}\nperLeg=${perLeg.mkString("|")}")
  }
}
