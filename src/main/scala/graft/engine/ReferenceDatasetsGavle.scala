package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.tags.Tags
import graft.functions.GeoFunctions._
import graft.operators.SpatialJoin
import graft.engine.MatchEngine.MatchConfig
import graft.engine.DeviationView._
import graft.engine.ReferenceDatasets.{attr, sMap, sMapLit, stripNullsCol}

/**
 * The remaining Gävle/Uppsala dataset views (SURVEY.md §2 coverage; ports of
 * migrations 17, 18, 20-25, 35, 37) — all configuration over the existing
 * MatchEngine/DeviationView blocks, per the r1 plan.
 *
 * Inputs as in ReferenceDatasets: osm (type,id,tags,geom,cx,cy,is_point),
 * items (id,dataset_id,original_attributes JSON,geometry,cx,cy,is_point),
 * munis (code,name,geom WKB).
 */
object ReferenceDatasetsGavle {

  /** ST_Within(geom, municipality 'code') over a driver-collected polygon —
    * every Gävle view's osm_objs CTE (17:2-7 etc.). */
  private def withinMuni(osm: DataFrame, munis: DataFrame, code: String): DataFrame = {
    val wkb = munis.filter(col("code") === code).select("geom")
      .collect().headOption.map(_.getAs[Array[Byte]](0)).orNull
    osm.filter(stWithin(col("geom"), lit(wkb)))
  }

  /** PG REGEXP_SUBSTR/REGEXP_MATCH return NULL on no match; Spark's
    * regexp_extract returns '' — nullif restores the PG behavior. */
  private def regexSubstr(c: Column, pattern: String, group: Int = 0): Column =
    nullif(regexp_extract(c, pattern, group), lit(""))

  /** the GATUADRESS street/housenumber/city split (17:18-20, 18:14-16) */
  private def addrTags(adr: Column): Seq[(String, Column)] = Seq(
    "addr:street" -> trim(regexSubstr(adr, "[^,0-9]+")),
    "addr:housenumber" -> trim(regexSubstr(adr, "[0-9]+[^,]*")),
    "addr:city" -> trim(regexSubstr(adr, ", (.*)", 1)))

  // =========================================================================
  // badplatser_gavle — 17: tag_alternatives + name tier 250/500, no anti leg
  // =========================================================================
  def badplatserMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      col("tags")("leisure").isin("swimming_area", "bathing_place") &&
        col("type").isin("n", "a")), munis, "2180")
    // tag_alternatives(alts, consts) = per alternative strip_nulls(consts||alt)
    def alt(leisure: String): Column = stripNullsCol(sMap(
      "leisure" -> lit(leisure),
      "name" -> trim(attr("NAMN")),
      "website" -> trim(attr("URL")),
      "description:sv" -> trim(regexpReplaceFirstU(attr("BESKR_KORT"),
        lit("Välkommen [^!]+!"), lit(""))),
      "addr:street" -> trim(regexSubstr(attr("GATUADRESS"), "[^,0-9]+")),
      "addr:housenumber" -> trim(regexSubstr(attr("GATUADRESS"), "[0-9]+[^,]*")),
      "addr:city" -> trim(regexSubstr(attr("GATUADRESS"), ", (.*)", 1))))
    val ups = items.filter(col("dataset_id") === 4)
      .withColumn("ids", array(col("id")))
      .withColumn("tag_alts", array(alt("bathing_place"), alt("swimming_area")))
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(Some("name"), Nil, dOther = 250.0, dName = 500.0),
      antiLeg = false,
      tagsVisibleToMatch = false)) // alternatives ARRAY quirk (17:27: ->> on array)
  }

  def badplatserDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 4L, layerId = 11L, viewName = "badplatser_gavle",
      titles = Titles(
        missing = ("Badplats saknas", "Enligt Gävle kommun ska det finnas en badplats här"),
        possiblyClosed = None,
        missingTags = ("Badplats saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på badplatsen här")),
      postFilter = MissingOrDiffNonEmpty))

  // =========================================================================
  // papperskorgar_gavle — 20: distance-only 25 m
  // =========================================================================
  def papperskorgarMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      col("tags")("amenity") === "waste_basket" && col("type") === "n"), munis, "2180")
    val ups = items.filter(col("dataset_id") === 31)
      .withColumn("ids", array(col("id")))
      .withColumn("tags", sMapLit("amenity" -> "waste_basket"))
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 25.0), antiLeg = false))
  }

  def papperskorgarDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 31L, layerId = 16L, viewName = "papperskorgar_gavle",
      titles = Titles(
        missing = ("Papperskorg saknas", "Enligt Gävle kommun ska det finnas en papperskorg här"),
        possiblyClosed = None,
        missingTags = ("Papperskorg saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på papperskorgen här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // parkeringsautomater_gavle — 21: name tier on 'ref' 50/100
  // =========================================================================
  def parkeringsautomaterMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      col("tags")("amenity") === "vending_machine" &&
        col("tags")("vending") === "parking_tickets" && col("type") === "n"), munis, "2180")
    // jsonb_build_object (no strip): a NULL ref stays as a null-valued key
    val ups = items.filter(col("dataset_id") === 33)
      .withColumn("ids", array(col("id")))
      .withColumn("tags", sMap(
        "amenity" -> lit("vending_machine"),
        "vending" -> lit("parking_tickets"),
        "currency:SEK" -> lit("yes"),
        "payment:debit_cards" -> lit("yes"),
        "payment:credit_cards" -> lit("yes"),
        "payment:others" -> lit("no"),
        "ref" -> attr("name")))
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(Some("ref"), Nil, dOther = 50.0, dName = 100.0),
      antiLeg = false))
  }

  def parkeringsautomaterDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 33L, layerId = 16L, viewName = "parkeringsautomater_gavle",
      titles = Titles(
        missing = ("Parkeringsautomat saknas", "Enligt Gävle kommun ska det finnas en parkeringsautomat här"),
        possiblyClosed = None,
        missingTags = ("Parkeringsautomat saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på parkeringsautomaten här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // cykelpumpar_gavle — 22: distance-only 50 m
  // =========================================================================
  def cykelpumparMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      col("tags")("amenity") === "bicycle_repair_station" && col("type") === "n"), munis, "2180")
    val ups = items.filter(col("dataset_id") === 11)
      .withColumn("ids", array(col("id")))
      .withColumn("tags", sMapLit(
        "amenity" -> "bicycle_repair_station",
        "service:bicycle:pump" -> "yes",
        "service:bicycle:tools" -> "unknown"))
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 50.0), antiLeg = false))
  }

  def cykelpumparDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 11L, layerId = 16L, viewName = "cykelpumpar_gavle",
      titles = Titles(
        missing = ("Cykelpump saknas", "Enligt Gävle kommun ska det finnas en cykelpump här"),
        possiblyClosed = None,
        missingTags = ("Cykelpump saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på cykelpumpen här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // parkmobler_gavle — 23: distance-only 5 m, amenity from PRODTYP
  // =========================================================================
  def parkmoblerMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      col("tags")("amenity").isin("bench", "table") && col("type").isin("n", "w")),
      munis, "2180")
    val ups = items.filter(col("dataset_id") === 7 &&
        attr("PRODTYP").isin("Bänk", "Bord"))
      .withColumn("ids", array(col("id")))
      .withColumn("tags", sMap("amenity" ->
        when(attr("PRODTYP") === "Bänk", "bench")
          .when(attr("PRODTYP") === "Bord", "table")))
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 5.0), antiLeg = false))
  }

  def parkmoblerDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 7L, layerId = 16L, viewName = "parkmobler_gavle",
      titles = Titles(
        missing = ("Parkmöbel saknas", "Enligt Gävle kommun ska det finnas en parkmöbel här"),
        possiblyClosed = None,
        missingTags = ("Parkmöbel saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på parkmöbeln här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // cykelparkeringsplatser_gavle — 24: distance-only 10 m + capacity
  // =========================================================================
  def cykelparkeringMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      col("tags")("amenity") === "bicycle_parking" && col("type").isin("n", "a")),
      munis, "2180")
    val ups = items.filter(col("dataset_id") === 21)
      .withColumn("ids", array(col("id")))
      .withColumn("tags", sMap(
        "amenity" -> lit("bicycle_parking"),
        "capacity" -> attr("ANTPLATSER")))
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 10.0), antiLeg = false))
  }

  def cykelparkeringDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 21L, layerId = 16L, viewName = "cykelparkeringsplatser_gavle",
      titles = Titles(
        missing = ("Cykelparkeringsplats saknas", "Enligt Gävle kommun ska det finnas en cykelparkeringsplats här"),
        possiblyClosed = None,
        missingTags = ("Cykelparkeringsplats saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på cykelparkeringsplatsen här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // historiskaskyltar_gavle — 25: alternatives [sign, board], 50 m only
  // =========================================================================
  def historiskaskyltarMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      col("tags")("information").isin("board", "sign") && col("type") === "n"), munis, "2180")
    def alt(information: String): Column = stripNullsCol(sMap(
      "information" -> lit(information), // alt overrides the consts' 'sign'
      "inscription" -> trim(attr("NAMN"))))
    val ups = items.filter(col("dataset_id") === 27)
      .withColumn("ids", array(col("id")))
      .withColumn("tag_alts", array(alt("sign"), alt("board")))
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 50.0),
      antiLeg = false,
      tagsVisibleToMatch = false))
  }

  def historiskaskyltarDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 27L, layerId = 16L, viewName = "historiskaskyltar_gavle",
      titles = Titles(
        missing = ("Skylt saknas", "Enligt Gävle kommun ska det finnas en skylt här"),
        possiblyClosed = None,
        missingTags = ("Skylt saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på skylten här")),
      postFilter = MissingOrDiffNonEmpty))

  // =========================================================================
  // atervinning_gavle — 18: centres ∪ group-collapsed stations, 2-ref
  // overload, recycling_type equi on the MAIN leg only, note passthrough
  // =========================================================================
  def atervinningMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
        col("tags")("recycling_type").isin("centre", "container") &&
          col("type").isin("n", "a")), munis, "2180")
      .withColumn("recycling_type", col("tags")("recycling_type"))

    val base = items.filter(col("dataset_id") === 17)
    val centres = base.filter(attr("KATEGORI") === "ÅTERVINNINGSCENTRAL")
      .select(
        array(col("id")).as("ids"),
        col("geometry"),
        stripNullsCol(sMap(Seq(
          "amenity" -> lit("recycling"),
          "recycling_type" -> lit("centre"),
          "name" -> attr("NAMN")) ++ addrTags(attr("GATUADRESS")): _*)).as("tags"),
        lit("").as("note"),
        lit("centre").as("recycling_type"))
    // stations: GROUP BY (GATUADRESS, geometry); ids + the note's STRING_AGG
    // are order-unspecified in the reference — pinned (id asc / value asc)
    val beskr = trim(regexpReplaceFirstU(
      regexpReplaceFirstU(attr("BESKR_KORT"), lit("Återvinningsstation för:  "), lit("")),
      lit("  Ansvarig för stationen är FTI."), lit("")))
    val stations = base.filter(attr("KATEGORI") === "ÅTERVINNINGSSTATION")
      .groupBy(attr("GATUADRESS").as("__adr"), col("geometry"))
      .agg(sort_array(collect_list(col("id"))).as("ids"),
        concat_ws(", ", sort_array(collect_list(beskr))).as("__fractions"))
      .select(
        col("ids"),
        col("geometry"),
        stripNullsCol(sMap(Seq(
          "amenity" -> lit("recycling"),
          "recycling_type" -> lit("container")) ++ addrTags(col("__adr")): _*)).as("tags"),
        concat(lit("Sätt `recycling:*=yes` enligt följande: "), col("__fractions")).as("note"),
        lit("container").as("recycling_type"))

    val ups = SpatialJoin.withGeoMeta(centres.unionByName(stations), "geometry")
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(Some("addr:street"), Seq("addr:street", "addr:housenumber"),
        dOther = 250.0, dName = 500.0, dRef = 1000.0),
      antiLeg = true,
      extraJoinKeys = Seq("recycling_type"),
      antiExtraJoinKeys = Some(Nil), // 18:52 anti leg has no recycling_type equi
      carryUps = Seq("note")))
  }

  def atervinningDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 17L, layerId = 13L, viewName = "atervinning_gavle",
      titles = Titles(
        missing = ("Återvinningsstation saknas", "Enligt Gävle kommun ska det finnas en återvinningsstation/-central här"),
        possiblyClosed = Some(("Återvinningsstation/-central möjligen stängd", "Enligt Gävle kommun finns det ingen återvinningsstation/-central här, den kan vara stängd")),
        missingTags = ("Återvinningsstation/-central saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på återvinningsstationen/-centralen här")),
      postFilter = DiffNonEmptyOrEitherNull,
      noteCol = Some(coalesce(col("note"), lit(""))))) // anti leg note = '' (18:48)

  // =========================================================================
  // busshallplatser_gavle — 35: group-collapse by geometry + 2-ref overload
  // (name, local_ref) 50/250/500 — the only production 2-ref view
  // =========================================================================
  def busshallplatserMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    // NB: no element-type restriction in the reference (35:6)
    val osmObjs = withinMuni(osm.filter(col("tags")("highway") === "bus_stop"), munis, "2180")
    val kur = attr("KUR")
    val shelter = when(kur.isin("N", "NULL", "") || kur.isNull, "no").otherwise("yes")
    val ups0 = items.filter(col("dataset_id") === 18)
      .groupBy(col("geometry"))
      .agg(
        sort_array(collect_list(col("id"))).as("ids"),
        min(attr("HPLNAMN")).as("__namn"),
        min(attr("HPLNR")).as("__nr"),
        min(attr("LAGE")).as("__lage"),
        min(attr("HPLBILDURL")).as("__bild"),
        min(shelter).as("__kur"))
      // jsonb_build_object, no strip: null values are kept as null-valued keys
      .select(col("ids"), col("geometry"), sMap(
        "highway" -> lit("bus_stop"),
        "public_transport" -> lit("platform"),
        "bus" -> lit("yes"),
        "name" -> regexp_replace(col("__namn"), lit("Gävle "), lit("")),
        "ref" -> col("__nr"),
        "local_ref" -> col("__lage"),
        "image" -> col("__bild"),
        "shelter" -> col("__kur")).as("tags"))
    val ups = SpatialJoin.withGeoMeta(ups0, "geometry")
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(Some("name"), Seq("name", "local_ref"),
        dOther = 50.0, dName = 250.0, dRef = 500.0),
      antiLeg = true))
  }

  def busshallplatserDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 18L, layerId = 17L, viewName = "busshallplatser_gavle",
      titles = Titles(
        missing = ("Busshållplats saknas", "Enligt Gävle kommun ska det finnas en busshållplats här"),
        possiblyClosed = Some(("Busshållplats möjligen stängd", "Enligt Gävle kommun finns det ingen busshållplats här, den kan vara stängd")),
        missingTags = ("Busshållplats saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på busshållplatsen här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // grillplatser_uppsala — 37: alternatives + regex-CASE wood_provided,
  // comment passthrough into the note
  // =========================================================================
  def grillplatserMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val osmObjs = withinMuni(osm.filter(
      (col("tags")("amenity") === "bbq" || col("tags")("leisure") === "firepit") &&
        col("type") === "n"), munis, "0380")
    val kommentar = attr("Kommentar")
    val wood = when(kommentar.rlike("Ved finns\\."), "yes")
      .when(kommentar.rlike("Ved finns inte\\."), "no")
      .otherwise(lit(null).cast("string"))
    def alt(kv: (String, String)): Column = stripNullsCol(sMap(
      kv._1 -> lit(kv._2), "wood_provided" -> wood))
    val ups = items.filter(col("dataset_id") === 466)
      .withColumn("ids", array(col("id")))
      .withColumn("tag_alts", array(alt("amenity" -> "bbq"), alt("leisure" -> "firepit")))
      .withColumn("comment", kommentar)
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 25.0),
      antiLeg = false,
      tagsVisibleToMatch = false,
      carryUps = Seq("comment")))
  }

  def grillplatserDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 466L, layerId = 18L, viewName = "grillplatser_uppsala",
      titles = Titles(
        missing = ("Grillplats saknas", "Enligt Uppsala kommun ska det finnas en grillplats här"),
        possiblyClosed = None,
        missingTags = ("Grillplats saknar taggar", "Följande taggar, härledda ur från Uppsala kommuns data, saknas på grillplatsen här")),
      postFilter = MissingOrDiffNonEmpty,
      noteCol = Some(when(col("comment").isNotNull,
        concat(lit("Kommentar från Uppsala kommun: "), col("comment"))).otherwise(lit("")))))
}
