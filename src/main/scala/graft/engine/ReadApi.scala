package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin

/**
 * Read-side API surface (SURVEY.md §2.1 S10): the PostgREST-exposed
 * aggregates and lookups over the deviation store.
 */
object ReadApi {

  /** api.deviation_title (10-api-deviation_title.sql:1-11):
    * COUNT(*) per (title, municipality_code, layer_id, dataset_id). */
  def deviationTitle(devs: DataFrame): DataFrame =
    devs.groupBy("title", "municipality_code", "layer_id", "dataset_id")
      .agg(count(lit(1)).as("count"))

  /** api.extent analog (08-api-base.sql:12-17): bbox of deviation centers
    * per dataset — ST_Extent as min/max aggregates over centroid coords. */
  def datasetExtent(devs: DataFrame): DataFrame =
    SpatialJoin.withGeoMeta(devs.filter(col("center").isNotNull), "center")
      .groupBy("dataset_id")
      .agg(min(col("cx")).as("min_x"), min(col("cy")).as("min_y"),
           max(col("cx")).as("max_x"), max(col("cy")).as("max_y"))

  /** api.extent(api.municipality) (08-api-base.sql:29-34): bbox of the
    * municipality's OWN geometry — the PG overload is IMMUTABLE over one
    * row, so this is a per-row envelope, not an aggregate. Shuffle-free. */
  def municipalityExtent(munis: DataFrame, geomCol: String = "geom"): DataFrame =
    munis
      // one WKB decode per row: the struct is named once, fields projected out
      .withColumn("__env", graft.functions.GeoFunctions.stEnvelope(col(geomCol)))
      .select(munis.columns.map(col) ++ Seq(
        col("__env._1").as("min_x"), col("__env._2").as("min_y"),
        col("__env._3").as("max_x"), col("__env._4").as("max_y")): _*)

  /** api.region seed (08c-regions.sql) — the 21 Swedish regions; data values
    * the region_name lookup semantics require (like the operator-translation
    * table, equivalent to a golden fixture). Codes 02/11/15/16 are unassigned
    * in the national scheme, exactly as in the reference. */
  val regionRows: Seq[(String, String)] = Seq(
    "01" -> "Stockholms län", "03" -> "Uppsala län", "04" -> "Södermanlands län",
    "05" -> "Östergötlands län", "06" -> "Jönköpings län", "07" -> "Kronobergs län",
    "08" -> "Kalmar län", "09" -> "Gotlands län", "10" -> "Blekinge län",
    "12" -> "Skåne län", "13" -> "Hallands län", "14" -> "Västra Götalands län",
    "17" -> "Värmlands län", "18" -> "Örebro län", "19" -> "Västmanlands län",
    "20" -> "Dalarnas län", "21" -> "Gävleborgs län", "22" -> "Västernorrlands län",
    "23" -> "Jämtlands län", "24" -> "Västerbottens län", "25" -> "Norrbottens län")

  def regions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    regionRows.toDF("code", "name")
  }

  /** api.region_name(municipality) (08-api-base.sql:35-39): region of a
    * municipality = LEFT(code, 2) lookup into the 21-row dim — broadcast,
    * so the stamp is shuffle-free at any municipality-table size. */
  def withRegionName(munis: DataFrame, regions: DataFrame): DataFrame =
    munis.join(
      broadcast(regions.select(col("code").as("__rcode"), col("name").as("region_name"))),
      substring(col("code"), 1, 2) === col("__rcode"), "left")
      .drop("__rcode")

  /** api.municipality_layer rows as the frontend reads them
    * (municipality.tsx:28: last_checked + the layer dim embedded):
    * progress metadata per (municipality, layer). Input schema mirrors
    * 08-api-base.sql:47-53. */
  def municipalityLayer(munLayer: DataFrame, layers: DataFrame): DataFrame =
    munLayer.join(
      broadcast(layers.select(col("id").as("layer_id"), col("name").as("layer_name"),
        col("is_major"))),
      Seq("layer_id"), "left")

  /** api.municipality_dataset (08-api-base.sql:54-63) embedded with its
    * dataset + provider dims, as the municipality page requests
    * (municipality.tsx:28: dataset_type, project_link, dataset(name,
    * provider(name))). All dims broadcast. */
  def municipalityDataset(munDataset: DataFrame, datasets: DataFrame,
                          providers: DataFrame): DataFrame =
    munDataset
      .join(broadcast(datasets.select(col("id").as("dataset_id"),
        col("name").as("dataset_name"), col("provider_id"))), Seq("dataset_id"), "left")
      .join(broadcast(providers.select(col("id").as("provider_id"),
        col("name").as("provider_name"))), Seq("provider_id"), "left")
      .drop("provider_id")

  /** api.osm_geom(deviation) (09-api-deviation.sql:46-50): current OSM
    * geometry of the deviation's element — equi join into osm.element on
    * (type, id); left, so deviations without an element keep a NULL geom. */
  def osmGeom(devs: DataFrame, elements: DataFrame): DataFrame =
    devs.join(
      elements.select(col("type").as("osm_element_type"),
        col("id").as("osm_element_id"), col("geom").as("osm_geom")),
      Seq("osm_element_type", "osm_element_id"), "left")

  /** api.upstream_item(deviation) (09-api-deviation.sql:52-56): SETOF
    * upstream items per deviation (`id = ANY(upstream_item_ids)`) —
    * explode the ids array and equi-join, the distributed form of the
    * reference's per-row subquery. `devKey` identifies the deviation rows. */
  def upstreamItems(devs: DataFrame, items: DataFrame, devKey: String): DataFrame =
    devs.select(col(devKey), explode(col("upstream_item_ids")).as("id"))
      .join(items, Seq("id"), "inner")

  /** api.nearby (09-api-deviation.sql:58-68): the 10 nearest other
    * deviations within 250 m of each deviation — k-ring kNN self-join.
    * `keyCol` must uniquely identify rows (e.g. a surrogate id). */
  def nearby(devs: DataFrame, keyCol: String, k: Int = 10, radius: Double = 250.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withC = SpatialJoin.withGeoMeta(devs.filter(col("center").isNotNull), "center")
    // k+1 then RE-RANK after self-exclusion: with co-located deviations the
    // dist-0 tie-break by key can sort self BEHIND another row, so the naive
    // `rank - 1` would misnumber (0, 2, 3, ...) for such probes
    val w = Window.partitionBy(col(s"p_$keyCol"))
      .orderBy(col("dist"), col(s"b_$keyCol"))
    SpatialJoin.knn(
        build = withC, probe = withC,
        buildGeom = "center", probeGeom = "center",
        probeKey = keyCol, buildKey = keyCol,
        k = k + 1, radius = radius, cellSize = math.max(radius, 250.0))
      .filter(col(s"p_$keyCol") =!= col(s"b_$keyCol")) // exclude self
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
