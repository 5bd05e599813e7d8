package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.tags.Tags
import graft.functions.GeoFunctions._
import graft.operators.SpatialJoin
import graft.engine.MatchEngine.MatchConfig
import graft.engine.DeviationView._

/**
 * The three representative reference dataset pipelines, ported 1:1
 * (SURVEY.md §7.2): trees_gavle (distance-only), preschools_scb (name tier +
 * municipality WHERE-guard + tag alternatives), schools_skolverket
 * (group-collapse + ref tier + per-municipality lateral decorrelated into an
 * extra join key). The remaining 17 reference views are combinations of the
 * same building blocks — configuration, not new code.
 *
 * Inputs: osm (type,id,tags,geom,cx,cy,is_point),
 *         items (id,dataset_id,original_attributes JSON,geometry,cx,cy,is_point),
 *         munis (code,name,geom WKB).
 */
object ReferenceDatasets {

  private[engine] def attr(k: String): Column =
    get_json_object(col("original_attributes"), s"$$['$k']")

  private[engine] def sMap(kv: (String, Column)*): Column =
    map(kv.flatMap { case (k, v) => Seq(lit(k), v) }: _*)

  private[engine] def sMapLit(kv: (String, String)*): Column =
    map(kv.flatMap { case (k, v) =>
      Seq(lit(k), if (v == null) lit(null).cast("string") else lit(v))
    }: _*)

  private[engine] def stripNullsCol(m: Column): Column = map_filter(m, (_, v) => v.isNotNull)

  private[engine] def broadcastMunis(munis: DataFrame): org.apache.spark.broadcast.Broadcast[MuniIndex] =
    MuniIndex.broadcastFrom(munis)

  // =========================================================================
  // trees_gavle — 14-v_deviation_trees_gavle.sql
  // =========================================================================
  def treesGavleMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val gavleWkb = munis.filter(col("code") === "2180").select("geom")
      .collect().headOption.map(_.getAs[Array[Byte]](0)).orNull
    val osmObjs = osm.filter(
      col("tags")("natural") === "tree" && col("type") === "n" &&
        stWithin(col("geom"), lit(gavleWkb)))

    // the species CASE ladder (14:10-25) — note the reference reads 'NAME'
    // for Acer species rows but 'NAMN' for Tilia rows (quirk preserved)
    val slakte = attr("SLAKTE"); val name = attr("NAME"); val namn = attr("NAMN")
    val species =
      when(slakte === "Acer" && name === "Acer campestre",
        sMapLit("natural" -> "tree", "genus" -> "Acer", "species" -> "Acer campestre", "species:wikidata" -> "Q158785"))
      .when(slakte === "Acer" && name.startsWith("Acer tataricum"),
        sMapLit("natural" -> "tree", "genus" -> "Acer", "species" -> "Acer tataricum", "species:wikidata" -> "Q162728"))
      .when(slakte === "Acer", sMapLit("natural" -> "tree", "genus" -> "Acer", "genus:wikidata" -> "Q42292"))
      .when(slakte === "Malus", sMapLit("natural" -> "tree", "genus" -> "Malus", "genus:wikidata" -> "Q104819"))
      .when(slakte === "Pinus", sMapLit("natural" -> "tree", "genus" -> "Pinus", "genus:wikidata" -> "Q12024"))
      .when(slakte === "Sorbus", sMapLit("natural" -> "tree", "genus" -> "Sorbus", "genus:wikidata" -> "Q157964"))
      .when(slakte === "Tilia" && namn === "Tilius cordata",
        sMapLit("natural" -> "tree", "genus" -> "Tilia", "species" -> "Tilia cordata", "species:wikidata" -> "Q158746"))
      .when(slakte === "Tilia" && namn === "Tilius platyphyllos",
        sMapLit("natural" -> "tree", "genus" -> "Tilia", "species" -> "Tilia platyphyllos", "species:wikidata" -> "Q156831"))
      .when(slakte === "Tilia" && namn === "Tilius tomentosa",
        sMapLit("natural" -> "tree", "genus" -> "Tilia", "species" -> "Tilia tomentosa", "species:wikidata" -> "Q161382"))
      .when(slakte === "Tilia" && namn.startsWith("Tilius x europaea"),
        sMapLit("natural" -> "tree", "genus" -> "Tilia", "species" -> "Tilia x europaea", "species:wikidata" -> "Q163760"))
      .when(slakte === "Tilia", sMapLit("natural" -> "tree", "genus" -> "Tilia", "genus:wikidata" -> "Q127849"))
      .when(slakte === "Ulmus", sMapLit("natural" -> "tree", "genus" -> "Ulmus", "genus:wikidata" -> "Q131113"))
      .otherwise(sMapLit("natural" -> "tree"))

    val ups = items.filter(col("dataset_id") === 5)
      .withColumn("ids", array(col("id")))
      .withColumn("tags", species)
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 5.0),
      antiLeg = false))
  }

  def treesGavleDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 5L, layerId = 16L, viewName = "trees_gavle",
      titles = Titles(
        missing = ("Träd saknas", "Enligt Gävle kommun ska det finnas ett träd här"),
        possiblyClosed = None,
        missingTags = ("Träd saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på trädet här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // lifesaving_gavle — 16-v_deviation_lifesaving_gavle.sql: multi-value tag
  // predicate (emergency ;-list overlap), distance-only 5 m, no anti leg
  // =========================================================================
  def lifesavingGavleMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val gavleWkb = munis.filter(col("code") === "2180").select("geom")
      .collect().headOption.map(_.getAs[Array[Byte]](0)).orNull
    val osmObjs = osm.filter(
      map_contains_key(col("tags"), lit("emergency")) &&
        arrays_overlap(split(col("tags")("emergency"), ";"),
          array(lit("life_ring"), lit("rescue_boat"), lit("rescue_ladder"))) &&
        col("type") === "n" && stWithin(col("geom"), lit(gavleWkb)))
    val typ = attr("TYP")
    val tags =
      when(typ === "Livräddningsboj", sMapLit("emergency" -> "life_ring"))
      .when(typ === "Livräddningsstege", sMapLit("emergency" -> "rescue_ladder"))
      .when(typ === "Livräddningspost", sMapLit("emergency" -> "life_ring;rescue_ladder"))
      .when(typ === "Livräddningsbåt", sMapLit("emergency" -> "rescue_boat"))
      .otherwise(map().cast("map<string,string>"))
    val ups = items.filter(col("dataset_id") === 8)
      .withColumn("ids", array(col("id")))
      .withColumn("tags", tags)
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = 5.0), antiLeg = false))
  }

  def lifesavingGavleDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 8L, layerId = 16L, viewName = "lifesaving_gavle",
      titles = Titles(
        missing = ("Livräddningsutrustning saknas", "Enligt Gävle kommun ska det finnas livräddningsutrustning här"),
        possiblyClosed = None,
        missingTags = ("Livräddningsutrustning saknar taggar", "Följande taggar, härledda ur från Gävle kommuns data, saknas på livräddningsutrustningen här")),
      postFilter = DiffNonEmptyOrEitherNull))

  // =========================================================================
  // vindbrukskollen_turbines — 36-v_deviation_vindbrukskollen_turbines.sql:
  // ref-as-name tier (25/100 m), muni guard in the JOIN CONDITION (left
  // extension survives; anti leg unscoped), float/date tag mapping, and the
  // keep-all-three-states post-filter
  // =========================================================================
  def turbinesMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val bMunis = broadcastMunis(munis)
    val osmObjs = MatchEngine.withMunicipality(
      osm.filter(col("tags")("power") === "generator" &&
        col("tags")("generator:method") === "wind_turbine" && col("type") === "n"), bMunis)
    val uppfort = attr("UPPFORT")
    val tags = stripNullsCol(sMap(
      "power" -> lit("generator"),
      "generator:method" -> lit("wind_turbine"),
      "generator:source" -> lit("wind"),
      "generator:type" -> lit("horizontal_axis"),
      "manufacturer" -> trim(attr("FABRIKAT")),
      "generator:output:electricity" ->
        concat(regexp_replace(attr("MAXEFFEKT"), ",", "."), lit(" MW")),
      "model" -> when(trim(attr("MODELL")).isin("", "-"), lit(null).cast("string"))
        .otherwise(regexp_replace(trim(attr("MODELL")), ",", ".")),
      "height:hub" -> attr("NAVHOJD"),
      "operator" -> when(lower(trim(attr("ORGNAMN"))).startsWith("projektör ej registrerad"),
        lit(null).cast("string")).otherwise(trim(attr("ORGNAMN"))),
      "rotor:diameter" -> attr("ROTDIAMETE"),
      "height" -> attr("TOTALHOJD"),
      "start_date" -> when(uppfort.isNotNull && uppfort =!= "19000101" &&
          uppfort.rlike("^\\d{8}$"),
        date_format(to_date(uppfort, "yyyyMMdd"), "yyyy-MM-dd"))
        .otherwise(lit(null).cast("string")),
      "ref" -> attr("VERKID")))
    val ups = MatchEngine.withMunicipality(
      items.filter(col("dataset_id") === 462 &&
          attr("ARENDESTATUS") === "4" && attr("STATUS") === "Uppfört")
        .withColumn("ids", array(col("id")))
        .withColumn("tags", tags), bMunis)
    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      // the 3-arg "name" overload with name_key = 'ref' (36:35)
      matchSpec = Tags.MatchSpec(Some("ref"), Nil, dOther = 25.0, dName = 100.0),
      antiLeg = true,
      muniGuardCondition = true))
  }

  def turbinesDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 462L, layerId = 22L, viewName = "vindbrukskollen_turbines",
      titles = Titles(
        missing = ("Vindkraftverk saknas", "Enligt Vindbrukskollen ska det finnas ett vindkraftverk här"),
        possiblyClosed = Some(("Vindkraftverk möjligen rivet", "Enligt Vindbrukskollen finns det inget vindkraftverk här, det kan ha rivits")),
        missingTags = ("Vindkraftverk saknar taggar", "Följande taggar, härledda från Vindbrukskollen, saknas på vindkraftverket här")),
      postFilter = MissingOrClosedOrDiffNonEmpty))

  // =========================================================================
  // preschools_scb — 12-v-deviation_preschools_scb.sql
  // =========================================================================
  def preschoolsMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val bMunis = broadcastMunis(munis)
    val osmObjs = MatchEngine.withMunicipality(
      osm.filter(col("tags")("amenity").isin("kindergarten", "childcare") &&
        col("type").isin("n", "a")), bMunis)

    // tag_alternatives([{amenity:kindergarten},{amenity:childcare}], consts)
    // = per alternative strip_nulls(consts || alt) (03:191-196)
    def alt(amenity: String): Column = stripNullsCol(sMap(
      "amenity" -> lit(amenity),
      "name" -> fixNameU(attr("Firmabenämning")),
      "operator" -> fixNameU(attr("Företagsnamn"))))
    val ups = MatchEngine.withMunicipality(
      items.filter(col("dataset_id") === 110)
        .withColumn("ids", array(col("id")))
        .withColumn("tag_alts", array(alt("kindergarten"), alt("childcare"))),
      bMunis)

    MatchEngine.matchView(osmObjs, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(Some("name"), Nil, dOther = 100.0, dName = 500.0),
      antiLeg = true,
      tagsVisibleToMatch = false, // alternatives ARRAY quirk (12:27)
      muniGuardWhere = true))     // WHERE osm.code = ups.code (12:28)
  }

  def preschoolsDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 110L, layerId = 15L, viewName = "preschools_scb",
      titles = Titles(
        missing = ("Förskola saknas", "Enligt SCBs register ska det finnas en förskola här"),
        possiblyClosed = Some(("Förskola möjligen stängd", "Enligt SCBs register finns det ingen förskola här, den kan vara stängd")),
        missingTags = ("Förskola saknar taggar", "Följande taggar, härledda ur från SCBs register, saknas på förskolan här")),
      postFilter = MissingOrDiffNonEmpty))

  // =========================================================================
  // schools_skolverket — 13-v-deviation_schools_skolverket.sql
  // =========================================================================
  private val processSchoolTagsU =
    udf((units: Seq[Map[String, String]]) =>
      Tags.processSchoolTags(units.filter(_ != null)))

  def schoolsMatch(osm: DataFrame, items: DataFrame, munis: DataFrame): DataFrame = {
    val bMunis = broadcastMunis(munis)
    // per-municipality LATERAL (13:17-73) decorrelated: PiP-stamp the OSM
    // side, attribute-code the upstream side, equi-key the match on it
    val osmObjs = MatchEngine.withMunicipality(
      osm.filter((col("tags")("amenity") === "school" ||
          col("tags")("disused:amenity") === "school" ||
          col("tags")("planned:amenity") === "school") &&
        col("type").isin("n", "a")), bMunis)
      .filter(col("muni_code").isNotNull)

    val status = attr("Status")
    val statusMap =
      when(status === "Aktiv", sMapLit(
        "amenity" -> "school", "disused:amenity" -> null, "planned:amenity" -> null))
      .when(status === "Vilande", map_concat(
        sMapLit("disused:amenity" -> "school", "amenity" -> null, "planned:amenity" -> null),
        sMap("end_date" -> attr("Nedlaggningsdatum"))))
      .when(status === "Planerad", map_concat(
        sMapLit("planned:amenity" -> "school", "amenity" -> null, "disused:amenity" -> null),
        sMap("opening_date" -> attr("Startdatum"))))
      .otherwise(lit(null).cast("map<string,string>"))

    val huvudmanNamn = get_json_object(col("original_attributes"), "$['Huvudman']['Namn']")
    val huvudmanTyp = get_json_object(col("original_attributes"), "$['Huvudman']['Typ']")
    val adress = get_json_object(col("original_attributes"), "$['Besoksadress']['Adress']")
    val inner = stripNullsCol(sMap(
      "name" -> trim(attr("SkolaNamn")),
      "operator" -> fixNameU(huvudmanNamn),
      "operator:type" ->
        when(huvudmanTyp.isin("Kommun", "Region", "Stat"), "government")
          .when(lower(huvudmanNamn).contains("förening") ||
                lower(huvudmanNamn).contains("ek för"), "cooperative")
          .when(lower(huvudmanNamn).contains("stiftelse"), "ngo")
          .otherwise("private"),
      "ref:se:skolverket" -> attr("Skolenhetskod"),
      "addr:housenumber" -> nullif(trim(regexp_extract(adress, "[0-9]+.*$", 0)), lit("")),
      "addr:street" -> nullif(trim(regexp_extract(adress, "^[^0-9]+", 0)), lit("")),
      "addr:city" -> trim(get_json_object(col("original_attributes"), "$['Besoksadress']['Ort']")),
      "addr:postcode" -> trim(get_json_object(col("original_attributes"), "$['Besoksadress']['Postnr']")),
      "contact:website" -> trim(attr("Webbadress")),
      "contact:phone" -> fixPhoneU(attr("Telefon")),
      // reference quirk (13:48): an email containing '.' before '@' is
      // DROPPED, others kept — preserved verbatim
      "contact:email" -> when(trim(attr("Epost")).like("%.%@%"), lit(null).cast("string"))
        .otherwise(trim(attr("Epost")))))
    val waldorf = when(attr("Inriktningstyp") === "Waldorf",
      sMapLit("pedagogy" -> "waldorf")).otherwise(map().cast("map<string,string>"))
    val unitMap = when(statusMap.isNull, lit(null).cast("map<string,string>"))
      .otherwise(map_concat(statusMap, inner, waldorf))

    // group-collapse A1: GROUP BY (geometry, TRIM(Webbadress)); unit order is
    // unspecified in the reference (ARRAY_AGG) — pinned here to item id
    val ups = items.filter(col("dataset_id") === 109)
      .join(munis.select(col("code")),
        get_json_object(col("original_attributes"), "$['Kommun']['Kommunkod']") === col("code"),
        "inner")
      .withColumn("unit", unitMap)
      .groupBy(col("geometry"), trim(attr("Webbadress")).as("__web"), col("code").as("muni_code"))
      .agg(collect_list(struct(col("id"), col("unit"))).as("units"))
      // pin unit order by item id (collect_list order is nondeterministic,
      // as is the reference's ARRAY_AGG) — explicit comparator because maps
      // inside the struct aren't orderable
      .withColumn("units", array_sort(col("units"), (l, r) =>
        when(l("id") < r("id"), -1).when(l("id") > r("id"), 1).otherwise(0)))
      .withColumn("ids", transform(col("units"), u => u("id")))
      .withColumn("tags", processSchoolTagsU(transform(col("units"), u => u("unit"))))
      .drop("units", "__web")
    val upsGeo = SpatialJoin.withGeoMeta(ups, "geometry")

    MatchEngine.matchView(osmObjs, upsGeo, MatchConfig(
      matchSpec = Tags.MatchSpec(Some("name"), Seq("ref:se:skolverket"),
        dOther = 50.0, dName = 500.0, dRef = 1000.0),
      cellSize = 1000.0,
      antiLeg = true,
      extraJoinKeys = Seq("muni_code")))
  }

  def schoolsDeviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 109L, layerId = 5L, viewName = "schools_skolverket",
      titles = Titles(
        missing = ("Skola saknas", "Enligt Skolverkets register ska det finnas en skola här"),
        possiblyClosed = Some(("Skola möjligen stängd", "Enligt Skolverkets register finns det ingen skola här, den kan vara stängd")),
        missingTags = ("Skola saknar taggar", "Följande taggar, härledda ur från Skolverkets register, saknas på skolan här")),
      // 13:103-105: standard either-null-or-diff filter AND never suggest
      // adding a disused school
      postFilter = CustomFilter(
        (col("osm_tags").isNull || col("ups_tags").isNull || size(col("suggested_tags")) > 0) &&
          !(col("ups_tags")("disused:amenity").isNotNull && col("osm_element_id").isNull))))
}
