package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.tags.Tags
import graft.engine.MatchEngine.MatchConfig
import graft.engine.DeviationView._

/**
 * The topo50 family (26-v_deviation_anlaggningsomradespunkt_topo50.sql and
 * siblings 27/28/29/31): one dataset fans out into PER-CATEGORY sub-queries —
 * each an upstream attribute filter + an OSM tag predicate inside the join
 * condition + a tag-alternatives set + a per-category note — UNION ALL'ed,
 * with layer id, title and description computed from the carried attribute.
 * Each reference sub-query is one Category row; the engine is shared.
 */
object Topo50 {

  /** @param filterVals   values of `filterKey` selecting the category's items
    *                     (empty = whole dataset, views 28/29)
    * @param alsoObjekttyp additional ->>'objekttyp' equality (31:204,215:
    *                     andamal='Ospecificerad' rows split by objekttyp)
    * @param carryKey     attribute carried as `andamal` into the projection
    *                     (views 31 q16-q18 carry objekttyp instead) */
  final case class Category(
      filterVals: Seq[String],
      osmPred: Column,
      alternatives: Seq[Map[String, String]],
      constants: Map[String, String] = Map.empty,
      note: String = "",
      distance: Double = 500.0,
      filterKey: String = "andamal",
      alsoObjekttyp: Option[String] = None,
      carryKey: String = "andamal")

  /** all 11 sub-queries of anlaggningsomradespunkt_topo50 (26:2-130). */
  val anlaggningsomradespunkt: Seq[Category] = Seq(
    Category( // q1 (26:2-10)
      filterVals = Seq("Idrottsanläggning"),
      osmPred = col("tags")("leisure").isin("stadium", "pitch", "sports_centre", "sports_hall"),
      alternatives = Seq(Map("leisure" -> "sports_centre"), Map("leisure" -> "stadium"),
        Map("leisure" -> "pitch"), Map("leisure" -> "sports_hall")),
      note = "Kan även vara en `leisure=stadium`, `leisure=pitch` eller `leisure=sports_hall`, jämför med flygbild eller andra källor"),
    Category( // q2
      filterVals = Seq("Skjutbana, mindre", "Skjutbana"),
      osmPred = col("tags")("leisure") === "pitch" && col("tags")("sport") === "shooting",
      alternatives = Seq(Map("leisure" -> "pitch", "sport" -> "shooting"))),
    Category( // q3
      filterVals = Seq("Badplats"),
      osmPred = col("tags")("leisure").isin("bathing_place", "swimming_area"),
      alternatives = Seq(Map("leisure" -> "bathing_place"), Map("leisure" -> "swimming_area"))),
    Category( // q4 (26:41-49)
      filterVals = Seq("Travbana", "Galoppbana"),
      osmPred = col("tags")("leisure").isin("track", "sports_centre", "pitch") &&
        col("tags")("sport").isin("horse_racing", "equestrian"),
      alternatives = Seq(Map("leisure" -> "track"), Map("leisure" -> "sports_centre"),
        Map("leisure" -> "pitch")),
      constants = Map("sport" -> "horse_racing")),
    Category( // q5
      filterVals = Seq("Sjöräddningsstation"),
      osmPred = col("tags")("emergency").isin("water_rescue", "rescue_station"),
      alternatives = Seq(Map("emergency" -> "water_rescue"), Map("emergency" -> "rescue_station"))),
    Category( // q6
      filterVals = Seq("Småbåtshamn"),
      osmPred = col("tags")("leisure") === "marina",
      alternatives = Seq(Map("leisure" -> "marina"))),
    Category( // q7
      filterVals = Seq("Gästhamn"),
      osmPred = (col("tags")("man_made").isin("pier", "quay") ||
        col("tags")("leisure") === "marina") && col("tags")("mooring").like("%guest%"),
      alternatives = Seq(Map("leisure" -> "marina"), Map("man_made" -> "pier"),
        Map("man_made" -> "quay")),
      constants = Map("mooring" -> "guest")),
    Category( // q8
      filterVals = Seq("Bollplan"),
      osmPred = col("tags")("leisure") === "pitch",
      alternatives = Seq(Map("leisure" -> "pitch"))),
    Category( // q9
      filterVals = Seq("Fotbollsplan"),
      osmPred = col("tags")("leisure") === "pitch" && col("tags")("sport") === "soccer",
      alternatives = Seq(Map("leisure" -> "pitch", "sport" -> "soccer"))),
    Category( // q10
      filterVals = Seq("Hamn"),
      osmPred = col("tags")("industrial") === "port" || map_contains_key(col("tags"), lit("harbour")),
      alternatives = Seq(Map("industrial" -> "port")),
      note = "Se även taggen `harbour=*`"),
    Category( // q11
      filterVals = Seq("Campingplats"),
      osmPred = col("tags")("tourism").isin("camp_site", "caravan_site"),
      alternatives = Seq(Map("tourism" -> "camp_site"), Map("tourism" -> "caravan_site"))))

  /** byggnadsanlaggningspunkt_topo50 (27:2-20): Mast / Skorsten, 250 m. */
  val byggnadsanlaggningspunkt: Seq[Category] = Seq(
    Category(Seq("Mast"), col("tags")("man_made") === "mast",
      Seq(Map("man_made" -> "mast")), distance = 250.0,
      filterKey = "objekttyp", carryKey = "objekttyp"),
    Category(Seq("Skorsten"), col("tags")("man_made") === "chimney",
      Seq(Map("man_made" -> "chimney")), distance = 250.0,
      filterKey = "objekttyp", carryKey = "objekttyp"))

  /** transformatoromradespunkt (28) / transformatoromrade (29): whole-dataset
    * power=substation at 250 m. */
  val transformator: Seq[Category] = Seq(
    Category(Nil, col("tags")("power") === "substation",
      Seq(Map("power" -> "substation")), distance = 250.0))

  /** all 15 active sub-queries of anlaggningsomrade_topo50 (31:2-217;
    * Testbana/Rengärde/Trafikövningsplats/Kulturanläggning are commented out
    * in the reference). */
  val anlaggningsomrade: Seq[Category] = Seq(
    Category( // q1 — NB 1000 m, the family's only wider radius (31:8)
      filterVals = Seq("Vintersportanläggning"),
      osmPred = col("tags")("landuse") === "winter_sports" ||
        (col("tags")("landuse") === "recreation_ground" && col("tags")("sport") === "skiing") ||
        (col("tags")("leisure") === "sports_centre" && col("tags")("sport") === "skiing"),
      alternatives = Seq(Map("landuse" -> "winter_sports"),
        Map("landuse" -> "recreation_ground", "sport" -> "skiing"),
        Map("leisure" -> "sports_centre", "sport" -> "skiing")),
      distance = 1000.0),
    Category( // q2
      filterVals = Seq("Civilt skjutfält"),
      osmPred = col("tags")("leisure") === "pitch" && col("tags")("sport") === "shooting",
      alternatives = Seq(Map("leisure" -> "pitch", "sport" -> "shooting")),
      filterKey = "objekttyp", carryKey = "objekttyp"),
    Category( // q3
      filterVals = Seq("Motorsportanläggning"),
      osmPred = col("tags")("leisure").isin("stadium", "sports_centre") &&
        col("tags")("sport").isin("motor", "karting", "motocross"),
      alternatives = Seq(
        Map("sport" -> "motor", "leisure" -> "stadium"),
        Map("sport" -> "karting", "leisure" -> "stadium"),
        Map("sport" -> "motocross", "leisure" -> "stadium"),
        Map("sport" -> "motor", "leisure" -> "sports_centre"),
        Map("sport" -> "karting", "leisure" -> "sports_centre"),
        Map("sport" -> "motocross", "leisure" -> "sports_centre"))),
    Category(Seq("Kriminalvårdsanstalt"), col("tags")("amenity") === "prison",
      Seq(Map("amenity" -> "prison"))),
    Category(Seq("Täkt"), col("tags")("landuse") === "quarry",
      Seq(Map("landuse" -> "quarry"))),
    Category(Seq("Besökspark"),
      col("tags")("tourism").isin("theme_park", "water_park", "zoo"),
      Seq(Map("tourism" -> "theme_park"), Map("tourism" -> "water_park"),
        Map("tourism" -> "zoo"))),
    Category(Seq("Begravningsplats"),
      col("tags")("landuse") === "cemetery" || col("tags")("amenity") === "grave_yard",
      Seq(Map("landuse" -> "cemetery"), Map("amenity" -> "grave_yard"))),
    Category(Seq("Energiproduktion"), col("tags")("power") === "plant",
      Seq(Map("power" -> "plant"))),
    Category(Seq("Sjukhusområde"), col("tags")("amenity") === "hospital",
      Seq(Map("amenity" -> "hospital"))),
    Category(Seq("Avfallsanläggning"),
      col("tags")("amenity") === "recycling" ||
        (col("tags")("landuse") === "industrial" &&
          col("tags")("industrial").isin("auto_wrecker", "scrap_yard")),
      Seq(Map("amenity" -> "recycling"),
        Map("landuse" -> "industrial", "industrial" -> "auto_wrecker"),
        Map("landuse" -> "industrial", "industrial" -> "scrap_yard"))),
    Category(Seq("Gruvområde"),
      col("tags")("landuse") === "industrial" && col("tags")("industrial") === "mine",
      Seq(Map("landuse" -> "industrial", "industrial" -> "mine"))),
    Category(Seq("Golfbana"), col("tags")("leisure") === "golf_course",
      Seq(Map("leisure" -> "golf_course"))),
    Category(Seq("Koloniområde"), col("tags")("landuse") === "allotments",
      Seq(Map("landuse" -> "allotments"))),
    Category(Seq("Skolområde"), col("tags")("landuse") === "education",
      Seq(Map("landuse" -> "education"))),
    Category(Seq("Aktivitetspark"),
      col("tags")("tourism").isin("theme_park", "water_park"),
      Seq(Map("tourism" -> "theme_park"), Map("tourism" -> "water_park"))),
    Category( // q17 (31:198-204): andamal carried from objekttyp.
      // 'wasterwater_plant' [sic] is the REFERENCE's own misspelling of the
      // OSM tag (31:199 + 31:203, verbatim) — preserved like 'Skjultfält'
      filterVals = Seq("Ospecificerad"),
      osmPred = col("tags")("landuse").isin("commercial", "institutional") ||
        col("tags")("man_made").isin("water_works", "wasterwater_plant"),
      alternatives = Seq(Map("landuse" -> "commercial"), Map("landuse" -> "institutional"),
        Map("man_made" -> "water_works"), Map("man_made" -> "wasterwater_plant")),
      alsoObjekttyp = Some("Samhällsfunktion"), carryKey = "objekttyp"),
    Category( // q18 (31:208-217)
      filterVals = Seq("Ospecificerad"),
      osmPred = col("tags")("landuse") === "industrial",
      alternatives = Seq(Map("landuse" -> "industrial")),
      alsoObjekttyp = Some("Industriområde"), carryKey = "objekttyp"))

  private def mapLit(m: Map[String, String]): Column =
    if (m.isEmpty) map().cast("map<string,string>")
    else map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  val DatasetId = 139L

  private def attrOf(k: String): Column =
    get_json_object(col("original_attributes"), s"$$['$k']")

  /**
   * FUSED match: all categories go through ONE cell-bucketed join keyed by
   * (cell, __cat) instead of one join + window per category — at 10^12 rows
   * the per-leg version is `|cats|` shuffles of the same OSM table (17 for
   * anlaggningsomrade); this is one. Items carry their category id (the
   * per-category filters are disjoint); OSM elements explode to every
   * category whose predicate they satisfy; the per-category radius is
   * enforced by an extra candidate filter on the carried `__dmax`, with the
   * bucket radius set to the widest category. Output is row-identical to
   * the per-leg form (parity-tested in Topo50Spec).
   */
  def matchView(osm: DataFrame, items: DataFrame,
                cats: Seq[Category] = anlaggningsomradespunkt,
                datasetId: Long = DatasetId): DataFrame = {
    val maxDist = cats.map(_.distance).max
    // ONE scan of items, not |cats| filtered scans unioned: the per-category
    // filters are DISJOINT (filterVals / alsoObjekttyp partition the
    // dataset), so a first-match when-chain assigns each item its category
    // id in a single pass — at 10^12 rows the union form re-read and
    // re-JSON-parsed the items table 17 times for anlaggningsomrade.
    // Identical get_json_object calls across the branches are deduplicated
    // by Spark's subexpression elimination inside the one Project.
    // Row-identity with the per-leg form stays parity-tested (Topo50Spec)
    // and oracle-checked (q_ds_topo50_oracle + the per-view oracles).
    val itemCat: Column = cats.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((cat, i), acc) =>
        val cond0 =
          if (cat.filterVals.isEmpty) lit(true)
          else attrOf(cat.filterKey).isin(cat.filterVals: _*)
        val cond = cat.alsoObjekttyp match {
          case Some(o) => cond0 && attrOf("objekttyp") === o
          case None    => cond0
        }
        when(cond, lit(i)).otherwise(acc)
    }
    def perCat(f: Category => Column): Column =
      element_at(array(cats.map(f): _*), col("__cat") + 1)
    val ups = items.filter(col("dataset_id") === datasetId)
      .withColumn("__cat", itemCat)
      .filter(col("__cat").isNotNull)
      .withColumn("ids", array(col("id")))
      .withColumn("tag_alts", perCat(cat => array(cat.alternatives.map(a =>
        mapLit(Tags.stripNulls(cat.constants ++ a))): _*)))
      .withColumn("andamal", perCat(cat => attrOf(cat.carryKey)))
      .withColumn("note_c", perCat(cat => lit(cat.note)))
      .withColumn("__dmax", perCat(cat => lit(cat.distance)))
    // an OSM element joins every category whose predicate it satisfies
    val catArr = array(cats.zipWithIndex.map { case (cat, i) =>
      when(cat.osmPred, lit(i)).otherwise(lit(null).cast("int"))
    }: _*)
    val osmCat = osm
      .withColumn("__cat", explode(filter(catArr, _.isNotNull)))
    MatchEngine.matchView(osmCat, ups, MatchConfig(
      matchSpec = Tags.MatchSpec(None, Nil, dOther = maxDist),
      antiLeg = false, tagsVisibleToMatch = false,
      extraJoinKeys = Seq("__cat"),
      extraCandidateFilter = Some(col("dist") <= col("p___dmax")),
      carryUps = Seq("andamal", "note_c")))
    // no drop needed: matchView's output projection emits only its fixed
    // columns + carryUps — __cat/__dmax never leave the join
  }

  /** per-category legs (the literal reference shape) — kept as the parity
    * reference for the fused join above. */
  def matchViewPerLeg(osm: DataFrame, items: DataFrame,
                      cats: Seq[Category] = anlaggningsomradespunkt,
                      datasetId: Long = DatasetId): DataFrame = {
    val legs = cats.map { cat =>
      val base = items.filter(col("dataset_id") === datasetId)
      val filtered0 =
        if (cat.filterVals.isEmpty) base
        else base.filter(attrOf(cat.filterKey).isin(cat.filterVals: _*))
      val filtered = cat.alsoObjekttyp match {
        case Some(o) => filtered0.filter(attrOf("objekttyp") === o)
        case None    => filtered0
      }
      val ups = filtered
        .withColumn("ids", array(col("id")))
        .withColumn("tag_alts", array(cat.alternatives.map(a =>
          mapLit(Tags.stripNulls(cat.constants ++ a))): _*))
        .withColumn("andamal", attrOf(cat.carryKey))
      val osmC = osm.filter(cat.osmPred)
      MatchEngine.matchView(osmC, ups, MatchConfig(
          matchSpec = Tags.MatchSpec(None, Nil, dOther = cat.distance),
          antiLeg = false, tagsVisibleToMatch = false,
          carryUps = Seq("andamal")))
        .withColumn("note_c", lit(cat.note))
    }
    legs.reduce(_ unionByName _)
  }

  // =========================================================================
  // deviation projections
  // =========================================================================

  private val lmMissing = "Enligt Lantmäteriets 1:50 000 karta ska det finnas "
  private val lmTags = "Följande taggar, härledda ur Lantmäteriets 1:50 000 karta, saknas här"

  def deviations(matchDf: DataFrame): DataFrame = {
    val head = regexp_extract(col("andamal"), "^[^, ]+", 0)
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = DatasetId, layerId = 0L, viewName = "anlaggningsomradespunkt_topo50",
      titles = Titles(("", ""), None, ("", "")), // overridden below
      postFilter = MissingOrDiffNonEmpty,
      layerCol = Some(
        when(col("andamal").isin("Campingplats", "Gästhamn", "Småbåtshamn", "Sjöräddningsstation"), 18L)
          .when(col("andamal") === "Hamn", 19L)
          .when(col("andamal").isin("Fotbollsplan", "Bollplan", "Travbana", "Galoppbana",
            "Skjutbana, mindre", "Skjutbana", "Idrottsanläggning"), 9L)
          .when(col("andamal") === "Badplats", 11L)),
      titleCols = Some((
        when(col("osm_element_id").isNull, concat(head, lit(" saknas")))
          .otherwise(concat(head, lit(" saknar taggar"))),
        when(col("osm_element_id").isNull,
          concat(lit(lmMissing + "en "), lower(head), lit(" här")))
          .otherwise(lit(lmTags))))))
      // NB: the reference deviation view emits '' AS note (26:154) — the
      // per-category note lives only on the match rows (note_c here).
  }

  /** 27: titles keyed on the suggested man_made value. */
  def byggnadsanlaggningspunktDeviations(matchDf: DataFrame): DataFrame = {
    val mm = col("ups_tags")("man_made")
    val obj = when(mm === "mast", "Mast").when(mm === "chimney", "Skorsten")
    val objLower = when(mm === "mast", "mast").when(mm === "chimney", "skorsten")
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 143L, layerId = 19L, viewName = "byggnadsanlaggningspunkt_topo50",
      titles = Titles(("", ""), None, ("", "")),
      postFilter = DiffNonEmptyOrEitherNull,
      titleCols = Some((
        when(col("osm_element_id").isNull, concat(obj, lit(" saknas")))
          .otherwise(concat(obj, lit(" saknar taggar"))),
        when(col("osm_element_id").isNull,
          concat(lit(lmMissing + "en "), objLower, lit(" här")))
          .otherwise(lit(lmTags))))))
  }

  private def transformatorDeviations(matchDf: DataFrame, datasetId: Long,
                                      viewName: String): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = datasetId, layerId = 20L, viewName = viewName,
      titles = Titles(
        // 'Transformatområde' [sic]: the reference's own title misspelling
        // (28:27-28 and 29:27-28, verbatim) — preserved like 'Skjultfält'
        missing = ("Transformatområde saknas", lmMissing + "ett transformatorområde här"),
        possiblyClosed = None,
        missingTags = ("Transformatområde saknar taggar", lmTags)),
      postFilter = DiffNonEmptyOrEitherNull))

  /** 28: point layer (dataset 149). */
  def transformatoromradespunktDeviations(matchDf: DataFrame): DataFrame =
    transformatorDeviations(matchDf, 149L, "transformatoromradespunkt_topo50")

  /** 29: area layer (dataset 146). */
  def transformatoromradeDeviations(matchDf: DataFrame): DataFrame =
    transformatorDeviations(matchDf, 146L, "transformatoromrade_topo50")

  /** 31: layer CASE over five groups + title CASE (reference typo
    * 'Skjultfält' preserved, 31:244). */
  def anlaggningsomradeDeviations(matchDf: DataFrame): DataFrame = {
    val renamed = when(col("andamal") === "Civilt skjutfält", "Skjultfält")
      .when(col("andamal") === "Samhällsfunktion", "Samhällsfunktionsområde")
      .otherwise(col("andamal"))
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = 140L, layerId = 0L, viewName = "anlaggningsomrade_topo50",
      titles = Titles(("", ""), None, ("", "")),
      postFilter = MissingOrDiffNonEmpty,
      layerCol = Some(
        when(col("andamal").isin("Vintersportanläggning", "Civilt övningsfält",
          "Motorsportanläggning", "Besökspark", "Golfbana", "Kulturanläggning",
          "Aktivitetspark"), 18L)
          .when(col("andamal").isin("Civilt skjutfält", "Samhällsfunktion",
            "Industriområde"), 7L)
          .when(col("andamal").isin("Skolområde", "Koloniområde", "Sjukhusområde",
            "Rengärde", "Begravningsplats"), 7L)
          .when(col("andamal").isin("Kriminalvårdsanstalt", "Testbana",
            "Trafikövningsplats"), 21L)
          .when(col("andamal").isin("Avfallsanläggning", "Energiproduktion",
            "Täkt", "Gruvområde"), 19L)),
      titleCols = Some((
        concat(renamed, when(col("osm_element_id").isNull, lit(" saknas"))
          .otherwise(lit(" saknar taggar"))),
        when(col("osm_element_id").isNull,
          lit(lmMissing + "ett objekt med de föreslagna taggarna här"))
          .otherwise(lit(lmTags))))))
  }
}
