package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.tags.Tags
import graft.engine.MatchEngine.MatchConfig
import graft.engine.DeviationView._

/**
 * The topo50 family (26-v_deviation_anlaggningsomradespunkt_topo50.sql and
 * siblings): one dataset fans out into PER-CATEGORY sub-queries — each an
 * upstream attribute filter + an OSM tag predicate inside the join condition
 * + a tag-alternatives set + a per-category note — UNION ALL'ed, with layer
 * id, title and description computed from the carried `andamal` attribute.
 * Here each reference sub-query is one Category row; the engine is shared.
 */
object Topo50 {

  final case class Category(
      andamal: Seq[String],
      osmPred: Column,
      alternatives: Seq[Map[String, String]],
      constants: Map[String, String] = Map.empty,
      note: String = "")

  /** first categories of anlaggningsomradespunkt_topo50 (26:2-40); the
    * remaining sub-queries are rows in this table, not new code. */
  val anlaggningsomradespunkt: Seq[Category] = Seq(
    Category(
      andamal = Seq("Idrottsanläggning"),
      osmPred = col("tags")("leisure").isin("stadium", "pitch", "sports_centre", "sports_hall"),
      alternatives = Seq(Map("leisure" -> "sports_centre"), Map("leisure" -> "stadium"),
        Map("leisure" -> "pitch"), Map("leisure" -> "sports_hall")),
      note = "Kan även vara en `leisure=stadium`, `leisure=pitch` eller `leisure=sports_hall`, jämför med flygbild eller andra källor"),
    Category(
      andamal = Seq("Skjutbana, mindre", "Skjutbana"),
      osmPred = col("tags")("leisure") === "pitch" && col("tags")("sport") === "shooting",
      alternatives = Seq(Map("leisure" -> "pitch", "sport" -> "shooting"))),
    Category(
      andamal = Seq("Badplats"),
      osmPred = col("tags")("leisure").isin("bathing_place", "swimming_area"),
      alternatives = Seq(Map("leisure" -> "bathing_place"), Map("leisure" -> "swimming_area"))))

  private def mapLit(m: Map[String, String]): Column =
    if (m.isEmpty) map().cast("map<string,string>")
    else map(m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  val DatasetId = 139L

  /** union of per-category distance-only (500 m) best matches; carries
    * `note` and `andamal` for the deviation projection. */
  def matchView(osm: DataFrame, items: DataFrame,
                cats: Seq[Category] = anlaggningsomradespunkt): DataFrame = {
    val legs = cats.map { cat =>
      val ups = items.filter(col("dataset_id") === DatasetId &&
          get_json_object(col("original_attributes"), "$['andamal']").isin(cat.andamal: _*))
        .withColumn("ids", array(col("id")))
        .withColumn("tag_alts", array(cat.alternatives.map(a =>
          mapLit(Tags.stripNulls(cat.constants ++ a))): _*))
        .withColumn("andamal", get_json_object(col("original_attributes"), "$['andamal']"))
      val osmC = osm.filter(cat.osmPred)
      // re-attach the carried attrs after the match (single-item ids here)
      val m = MatchEngine.matchView(osmC, ups, MatchConfig(
        matchSpec = Tags.MatchSpec(None, Nil, dOther = 500.0),
        antiLeg = false, tagsVisibleToMatch = false))
      m.join(ups.select(element_at(col("ids"), 1).as("__iid"), col("andamal")),
          element_at(col("upstream_item_ids"), 1) === col("__iid"), "left")
        .drop("__iid")
        .withColumn("note_c", lit(cat.note))
    }
    legs.reduce(_ unionByName _)
  }

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
          concat(lit("Enligt Lantmäteriets 1:50 000 karta ska det finnas en "), lower(head), lit(" här")))
          .otherwise(lit("Följande taggar, härledda ur Lantmäteriets 1:50 000 karta, saknas här"))))))
      // NB: the reference deviation view emits '' AS note (26:154) — the
      // per-category note lives only on the match rows (note_c here).
  }
}
