package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.operators.SpatialJoin

/** Parity fixtures for lifesaving_gavle (multi-value tag overlap predicate)
  * and vindbrukskollen_turbines (ref-as-name tier, guard-in-condition,
  * float-equivalence, keep-all-states filter). */
class MoreDatasetsSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def pt(x: Double, y: Double) = Geom.toWkb(Geom.point(x, y))
  private def box(x0: Double, y0: Double, x1: Double, y1: Double) =
    Geom.toWkb(Geom.envelopePoly(x0, y0, x1, y1))

  private def osmDf(rows: Seq[(String, Long, Map[String, String], Array[Byte])]): DataFrame =
    SpatialJoin.withGeoMeta(rows.toDF("type", "id", "tags", "geom"), "geom")
  private def itemsDf(rows: Seq[(Long, Long, String, Array[Byte])]): DataFrame =
    SpatialJoin.withGeoMeta(
      rows.toDF("id", "dataset_id", "original_attributes", "geometry"), "geometry")

  test("lifesaving_gavle: emergency multi-value overlap + distance-only match") {
    val munis = Seq(("2180", "Gävle", box(0, 0, 100000, 100000))).toDF("code", "name", "geom")
    val items = itemsDf(Seq(
      (1L, 8L, """{"TYP":"Livräddningspost"}""", pt(1000, 1000)),
      (2L, 8L, """{"TYP":"Livräddningsboj"}""", pt(2000, 1000)),
      (3L, 8L, """{"TYP":"Okänd"}""", pt(3000, 1000))))
    val osm = osmDf(Seq(
      ("n", 1L, Map("emergency" -> "life_ring"), pt(1000, 1002)),
      ("n", 2L, Map("emergency" -> "life_ring;assembly_point"), pt(2000, 1001)),
      ("n", 3L, Map("emergency" -> "defibrillator"), pt(3000, 1001)))) // no overlap -> excluded

    val dev = ReferenceDatasets.lifesavingGavleDeviations(
      ReferenceDatasets.lifesavingGavleMatch(osm, items, munis)).collect()
    assert(dev.length == 3, dev.mkString("\n"))
    val byItem = dev.map(r =>
      r.getAs[scala.collection.Seq[Long]]("upstream_item_ids").head -> r).toMap
    assert(byItem(1L).getAs[Map[String, String]]("suggested_tags") ==
      Map("emergency" -> "life_ring;rescue_ladder"))
    assert(byItem(1L).getAs[String]("title") == "Livräddningsutrustning saknar taggar")
    assert(byItem(2L).getAs[Map[String, String]]("suggested_tags") ==
      Map("emergency" -> "life_ring"))
    // item 3: no eligible OSM candidate -> Missing even with empty tag map
    assert(byItem(3L).getAs[String]("title") == "Livräddningsutrustning saknas")
    assert(byItem(3L).getAs[Map[String, String]]("suggested_tags") == Map.empty)
  }

  test("turbines: ref tier, guard-in-condition keeps left extension, float equivalence") {
    val munis = Seq(
      ("0001", "A", box(0, 0, 10000, 10000)),
      ("0002", "B", box(20000, 20000, 30000, 30000))).toDF("code", "name", "geom")
    val items = itemsDf(Seq(
      (1L, 462L,
        """{"ARENDESTATUS":"4","STATUS":"Uppfört","VERKID":"V1","MAXEFFEKT":"2,0",
          |"FABRIKAT":" Vestas ","MODELL":"-","NAVHOJD":"100",
          |"ORGNAMN":"Projektör ej registrerad i EP","ROTDIAMETE":"90",
          |"TOTALHOJD":"150","UPPFORT":"20150601"}""".stripMargin.replace("\n", ""),
        pt(1000, 1000)),
      (2L, 462L,
        """{"ARENDESTATUS":"4","STATUS":"Uppfört","VERKID":"V2","MAXEFFEKT":"3,5"}""",
        pt(25000, 25000)),
      (3L, 462L, // wrong status -> excluded from the upstream side entirely
        """{"ARENDESTATUS":"4","STATUS":"Planerad","VERKID":"V3"}""", pt(5000, 5000)),
      (4L, 462L,
        """{"ARENDESTATUS":"4","STATUS":"Uppfört","VERKID":"V4"}""", pt(9990, 9990))))
    val osm = osmDf(Seq(
      // ref match at 90 m (<= 100 name-tier with name_key='ref'); its
      // generator output "2 MW" is FLOAT-equivalent to upstream "2.0 MW"
      ("n", 11L, Map("power" -> "generator", "generator:method" -> "wind_turbine",
        "ref" -> "V1", "generator:output:electricity" -> "2 MW"), pt(1090, 1000)),
      // lone OSM turbine in muni 0002, no upstream near -> "possibly removed"
      ("n", 12L, Map("power" -> "generator", "generator:method" -> "wind_turbine"),
        pt(26000, 26000)),
      // 21 m from item 4 but OUTSIDE muni 0001: the condition-guard kills the
      // match (item 4 stays Missing) while the UNSCOPED anti leg still sees
      // the pair (node 14 is NOT "possibly removed")
      ("n", 14L, Map("power" -> "generator", "generator:method" -> "wind_turbine"),
        pt(10005, 10005))))

    val dev = ReferenceDatasets.turbinesDeviations(
      ReferenceDatasets.turbinesMatch(osm, items, munis)).collect()
    assert(dev.length == 4, dev.mkString("\n"))

    val tagsDev = dev.find(r => r.getAs[Long]("osm_element_id") == 11L).get
    val st = tagsDev.getAs[Map[String, String]]("suggested_tags")
    assert(!st.contains("generator:output:electricity"),
      s"2 MW ≡ 2.0 MW must not be suggested: $st")
    assert(st("manufacturer") == "Vestas" && st("start_date") == "2015-06-01" &&
      !st.contains("ref") /* equal on both sides */ &&
      !st.contains("model") && !st.contains("operator"), st)

    val missing = dev.filter(_.getAs[String]("title") == "Vindkraftverk saknas")
      .map(_.getAs[scala.collection.Seq[Long]]("upstream_item_ids").head).toSet
    assert(missing == Set(2L, 4L), s"left extension must survive the guard: $missing")

    val removed = dev.filter(_.getAs[String]("title") == "Vindkraftverk möjligen rivet")
    assert(removed.length == 1 && removed(0).getAs[Long]("osm_element_id") == 12L,
      removed.mkString(";"))
  }
}
