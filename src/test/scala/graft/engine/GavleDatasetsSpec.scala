package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.operators.SpatialJoin

/** Parity fixtures for the round-2 dataset views (migrations 17, 18, 20-25,
  * 27, 28, 29, 31, 35, 37) + the 20/20 registry coverage check. */
class GavleDatasetsSpec extends AnyFunSuite {
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

  private val munis = Seq(
    ("2180", "Gävle", box(0, 0, 100000, 100000)),
    ("0380", "Uppsala", box(200000, 0, 300000, 100000))).toDF("code", "name", "geom")

  private def ids(r: org.apache.spark.sql.Row): Seq[Long] =
    r.getAs[scala.collection.Seq[Long]]("upstream_item_ids").toSeq

  test("registry enumerates all 20 reference views") {
    val expected = Set(
      "preschools_scb", "schools_skolverket", "trees_gavle", "lifesaving_gavle",
      "badplatser_gavle", "atervinning_gavle", "papperskorgar_gavle",
      "parkeringsautomater_gavle", "cykelpumpar_gavle", "parkmobler_gavle",
      "cykelparkeringsplatser_gavle", "historiskaskyltar_gavle",
      "anlaggningsomradespunkt_topo50", "byggnadsanlaggningspunkt_topo50",
      "transformatoromradespunkt_topo50", "transformatoromrade_topo50",
      "anlaggningsomrade_topo50", "busshallplatser_gavle",
      "vindbrukskollen_turbines", "grillplatser_uppsala")
    assert(DatasetRegistry.all.size == 20)
    assert(DatasetRegistry.all.map(_.name).toSet == expected)
    assert(DatasetRegistry.all.map(_.migration).distinct.size == 20)
  }

  test("simple Gävle views: papperskorgar, cykelpumpar, parkmobler, cykelparkering, parkeringsautomater") {
    val items = itemsDf(Seq(
      (1L, 31L, "{}", pt(1000, 1000)),            // waste basket, matched clean
      (2L, 31L, "{}", pt(2000, 2000)),            // waste basket, missing
      (3L, 11L, "{}", pt(3000, 3000)),            // pump, matched w/ diff
      (4L, 7L, """{"PRODTYP":"Bänk"}""", pt(4000, 4000)),   // bench, matched clean
      (5L, 7L, """{"PRODTYP":"Soffa"}""", pt(4500, 4500)),  // not in (Bänk,Bord)
      (6L, 7L, """{"PRODTYP":"Bord"}""", pt(5000, 5000)),   // table, missing
      (7L, 21L, """{"ANTPLATSER":"10"}""", pt(6000, 6000)), // parking, diff
      (8L, 33L, """{"name":"A1"}""", pt(7000, 7000))))      // automat, ref tier
    val osm = osmDf(Seq(
      ("n", 1L, Map("amenity" -> "waste_basket"), pt(1020, 1000)),
      ("n", 3L, Map("amenity" -> "bicycle_repair_station"), pt(3010, 3000)),
      ("n", 4L, Map("amenity" -> "bench"), pt(4003, 4000)),
      ("n", 7L, Map("amenity" -> "bicycle_parking"), pt(6005, 6000)),
      // 80 m: beyond the 50 m other-tier, within the 100 m ref-name tier
      ("n", 8L, Map("amenity" -> "vending_machine", "vending" -> "parking_tickets",
        "ref" -> "A1"), pt(7080, 7000))))

    val pk = DatasetRegistry.byName("papperskorgar_gavle").deviations(osm, items, munis).collect()
    assert(pk.length == 1 && ids(pk(0)) == Seq(2L) && pk(0).getAs[String]("title") == "Papperskorg saknas")

    val cp = DatasetRegistry.byName("cykelpumpar_gavle").deviations(osm, items, munis).collect()
    assert(cp.length == 1 && ids(cp(0)) == Seq(3L))
    assert(cp(0).getAs[Map[String, String]]("suggested_tags") ==
      Map("service:bicycle:pump" -> "yes", "service:bicycle:tools" -> "unknown"))

    val pm = DatasetRegistry.byName("parkmobler_gavle").deviations(osm, items, munis).collect()
    assert(pm.length == 1 && ids(pm(0)) == Seq(6L) && pm(0).getAs[String]("title") == "Parkmöbel saknas")
    assert(pm(0).getAs[Map[String, String]]("suggested_tags") == Map("amenity" -> "table"))

    val cpp = DatasetRegistry.byName("cykelparkeringsplatser_gavle").deviations(osm, items, munis).collect()
    assert(cpp.length == 1 && ids(cpp(0)) == Seq(7L))
    assert(cpp(0).getAs[Map[String, String]]("suggested_tags") == Map("capacity" -> "10"))

    val pa = DatasetRegistry.byName("parkeringsautomater_gavle").deviations(osm, items, munis).collect()
    assert(pa.length == 1 && ids(pa(0)) == Seq(8L), pa.mkString("\n"))
    assert(pa(0).getAs[Long]("osm_element_id") == 8L, "80 m ref-equal must match via the name tier")
    val paTags = pa(0).getAs[Map[String, String]]("suggested_tags")
    assert(paTags("payment:others") == "no" && !paTags.contains("ref"), paTags.toString)
  }

  test("badplatser: alternatives pick + regex address split + first-occurrence replace") {
    val items = itemsDf(Seq(
      (1L, 4L, """{"NAMN":"Badet","URL":"https://x.sv","BESKR_KORT":"Välkommen till Badet! Fin badplats.","GATUADRESS":"Strandvägen 12, Gävle"}""",
        pt(1000, 1000)),
      (2L, 4L, """{"NAMN":"Saknat bad"}""", pt(9000, 9000))))
    val osm = osmDf(Seq(
      ("n", 1L, Map("leisure" -> "swimming_area", "name" -> "Badet"), pt(1030, 1000))))

    val dev = DatasetRegistry.byName("badplatser_gavle").deviations(osm, items, munis).collect()
    val byItem = dev.map(r => ids(r).head -> r).toMap
    // item 1: the swimming_area alternative minimizes the diff -> leisure and
    // name are NOT suggested; the regex-derived tags are
    val t1 = byItem(1L).getAs[Map[String, String]]("suggested_tags")
    assert(!t1.contains("leisure") && !t1.contains("name"), t1.toString)
    // tag_diff canonicalizes website -> contact:website (no variant on the
    // OSM side -> preferred form wins, 03:139-149)
    assert(t1("contact:website") == "https://x.sv" && t1("description:sv") == "Fin badplats." &&
      t1("addr:street") == "Strandvägen" && t1("addr:housenumber") == "12" &&
      t1("addr:city") == "Gävle", t1.toString)
    assert(byItem(2L).getAs[String]("title") == "Badplats saknas")
    // no-match address fields must be ABSENT (PG NULL-strip), not empty strings
    val t2 = byItem(2L).getAs[Map[String, String]]("suggested_tags")
    assert(!t2.contains("addr:street") && !t2.contains("addr:city") && !t2.contains("website"), t2.toString)
  }

  test("historiskaskyltar: sign/board alternatives") {
    val items = itemsDf(Seq(
      (1L, 27L, """{"NAMN":"Gamla bron"}""", pt(1000, 1000))))
    val osm = osmDf(Seq(
      ("n", 1L, Map("information" -> "board"), pt(1010, 1000))))
    val dev = DatasetRegistry.byName("historiskaskyltar_gavle").deviations(osm, items, munis).collect()
    // board alternative matches the element -> only inscription suggested
    assert(dev.length == 1)
    assert(dev(0).getAs[Map[String, String]]("suggested_tags") == Map("inscription" -> "Gamla bron"))
  }

  test("atervinning: station group-collapse + note, main-leg equi NOT applied to the anti leg") {
    val beskr = (frac: String) =>
      s"""Återvinningsstation för:  $frac  Ansvarig för stationen är FTI."""
    val items = itemsDf(Seq(
      // a centre with no eligible OSM nearby -> missing
      (1L, 17L, """{"KATEGORI":"ÅTERVINNINGSCENTRAL","NAMN":"Gästrike återvinnarna","GATUADRESS":"Utmarksvägen 16, Gävle"}""",
        pt(10000, 10000)),
      // two station items at the SAME address+geometry -> one collapsed row
      (2L, 17L, s"""{"KATEGORI":"ÅTERVINNINGSSTATION","GATUADRESS":"Torget 1, Gävle","BESKR_KORT":"${beskr("Papper")}"}""",
        pt(11000, 11000)),
      (3L, 17L, s"""{"KATEGORI":"ÅTERVINNINGSSTATION","GATUADRESS":"Torget 1, Gävle","BESKR_KORT":"${beskr("Glas")}"}""",
        pt(11000, 11000))))
    val osm = osmDf(Seq(
      // container 50 m from the CENTRE item: recycling_type differs so the
      // MAIN leg can't match it — but the anti leg is UNSCOPED (18:52), so
      // this element must NOT become "possibly closed"
      ("n", 1L, Map("recycling_type" -> "container"), pt(10050, 10000)),
      // container 100 m from the station group -> matched, tag diff
      ("n", 2L, Map("recycling_type" -> "container"), pt(11100, 11000)),
      // container far from everything -> possibly closed
      ("n", 3L, Map("recycling_type" -> "container"), pt(50000, 50000))))

    val dev = DatasetRegistry.byName("atervinning_gavle").deviations(osm, items, munis).collect()

    val missing = dev.filter(_.getAs[String]("title") == "Återvinningsstation saknas")
    assert(missing.length == 1 && ids(missing(0)) == Seq(1L), dev.mkString("\n"))

    val grouped = dev.find(r => ids(r) == Seq(2L, 3L)).get
    assert(grouped.getAs[Long]("osm_element_id") == 2L)
    assert(grouped.getAs[String]("note") ==
      "Sätt `recycling:*=yes` enligt följande: Glas, Papper")
    val gt = grouped.getAs[Map[String, String]]("suggested_tags")
    assert(gt("amenity") == "recycling" && gt("addr:street") == "Torget" &&
      gt("addr:housenumber") == "1" && gt("addr:city") == "Gävle", gt.toString)

    val closed = dev.filter(_.getAs[String]("title") == "Återvinningsstation/-central möjligen stängd")
    assert(closed.length == 1 && closed(0).getAs[Long]("osm_element_id") == 3L,
      "only the far container is possibly-closed (anti leg unscoped by recycling_type): " +
        closed.map(_.getAs[Long]("osm_element_id")).mkString(","))
    assert(closed(0).getAs[String]("note") == "")
  }

  test("busshallplatser: geometry group-collapse, MIN aggregates, 2-ref tier, anti leg") {
    val items = itemsDf(Seq(
      (10L, 18L, """{"HPLNAMN":"Gävle Centralstation","HPLNR":"1001","LAGE":"B","KUR":"J"}""",
        pt(20000, 20000)),
      (11L, 18L, """{"HPLNAMN":"Gävle Centralstation","HPLNR":"1001","LAGE":"A"}""",
        pt(20000, 20000))))
    val osm = osmDf(Seq(
      // 200 m with equal name: name tier (<= 250)
      ("n", 21L, Map("highway" -> "bus_stop", "name" -> "Centralstation"), pt(20200, 20000)),
      // lone far stop -> possibly closed
      ("n", 22L, Map("highway" -> "bus_stop"), pt(60000, 60000))))

    val dev = DatasetRegistry.byName("busshallplatser_gavle").deviations(osm, items, munis).collect()
    val grouped = dev.find(r => ids(r) == Seq(10L, 11L)).get
    assert(grouped.getAs[Long]("osm_element_id") == 21L)
    val gt = grouped.getAs[Map[String, String]]("suggested_tags")
    // MIN over group: local_ref A, shelter no ('no' < 'yes'); name had its
    // 'Gävle ' prefix stripped and matches the element -> not suggested
    assert(gt("local_ref") == "A" && gt("shelter") == "no" && gt("ref") == "1001" &&
      !gt.contains("name"), gt.toString)
    val closed = dev.filter(_.getAs[String]("title") == "Busshållplats möjligen stängd")
    assert(closed.length == 1 && closed(0).getAs[Long]("osm_element_id") == 22L)
  }

  test("grillplatser_uppsala: wood_provided regex CASE + comment note") {
    val items = itemsDf(Seq(
      (1L, 466L, """{"Kommentar":"Grillplats vid sjön. Ved finns."}""", pt(250000, 50000)),
      (2L, 466L, "{}", pt(260000, 50000)),
      (3L, 466L, """{"Kommentar":"Ved finns inte."}""", pt(270000, 50000))))
    val osm = osmDf(Seq(
      ("n", 31L, Map("leisure" -> "firepit", "wood_provided" -> "no"), pt(270010, 50000))))

    val dev = DatasetRegistry.byName("grillplatser_uppsala").deviations(osm, items, munis).collect()
    val byItem = dev.map(r => ids(r).head -> r).toMap
    assert(byItem(1L).getAs[String]("title") == "Grillplats saknas")
    assert(byItem(1L).getAs[String]("note") ==
      "Kommentar från Uppsala kommun: Grillplats vid sjön. Ved finns.")
    assert(byItem(1L).getAs[Map[String, String]]("suggested_tags")("wood_provided") == "yes")
    assert(byItem(2L).getAs[String]("note") == "")
    assert(!byItem(2L).getAs[Map[String, String]]("suggested_tags").contains("wood_provided"))
    // item 3 matched the firepit with wood_provided=no -> firepit alternative
    // leaves an empty diff -> filtered out entirely
    assert(!byItem.contains(3L), byItem.keySet.toString)
  }

  test("topo50 siblings: byggnadsanlaggningspunkt, transformator point/area, anlaggningsomrade") {
    val items = itemsDf(Seq(
      (1L, 143L, """{"objekttyp":"Mast"}""", pt(30000, 30000)),
      (2L, 149L, """{}""", pt(31000, 31000)),
      (3L, 149L, """{}""", pt(32000, 32000)),
      (4L, 146L, """{}""", pt(33000, 33000)),
      (5L, 140L, """{"andamal":"Ospecificerad","objekttyp":"Civilt skjutfält"}""", pt(34000, 34000)),
      (6L, 140L, """{"andamal":"Vintersportanläggning"}""", pt(35000, 35000)),
      (7L, 140L, """{"andamal":"Ospecificerad","objekttyp":"Industriområde"}""", pt(36000, 36000))))
    val osm = osmDf(Seq(
      ("n", 41L, Map("power" -> "substation"), pt(31100, 31000)), // 100 m from item 2
      // 800 m from item 6: inside the category's 1000 m radius
      ("a", 42L, Map("landuse" -> "winter_sports"), pt(35800, 35000))))

    val bg = DatasetRegistry.byName("byggnadsanlaggningspunkt_topo50").deviations(osm, items, munis).collect()
    assert(bg.length == 1 && bg(0).getAs[String]("title") == "Mast saknas" &&
      bg(0).getAs[Long]("layer_id") == 19L)
    assert(bg(0).getAs[String]("description").contains("ska det finnas en mast här"))

    val tp = DatasetRegistry.byName("transformatoromradespunkt_topo50").deviations(osm, items, munis).collect()
    // item 2 matched clean (suppressed); item 3 missing
    assert(tp.length == 1 && ids(tp(0)) == Seq(3L) &&
      tp(0).getAs[String]("title") == "Transformatområde saknas" &&
      tp(0).getAs[Long]("layer_id") == 20L, tp.mkString("\n"))

    val ta = DatasetRegistry.byName("transformatoromrade_topo50").deviations(osm, items, munis).collect()
    assert(ta.length == 1 && ids(ta(0)) == Seq(4L) && ta(0).getAs[Long]("dataset_id") == 146L)

    val ao = DatasetRegistry.byName("anlaggningsomrade_topo50").deviations(osm, items, munis).collect()
    val byItem = ao.map(r => ids(r).head -> r).toMap
    // reference typo 'Skjultfält' preserved; layer CASE group 'Mark'
    assert(byItem(5L).getAs[String]("title") == "Skjultfält saknas")
    assert(byItem(5L).getAs[Long]("layer_id") == 7L)
    assert(byItem(7L).getAs[String]("title") == "Industriområde saknas")
    // item 6 matched within the category's 1000 m radius, empty diff -> no row
    assert(!byItem.contains(6L), byItem.keySet.toString)
  }
}
