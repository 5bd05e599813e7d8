package graft.engine

import org.apache.spark.sql.DataFrame
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

  /** api.nearby (09-api-deviation.sql:58-68): the 10 nearest other
    * deviations within 250 m of each deviation — k-ring kNN self-join.
    * `keyCol` must uniquely identify rows (e.g. a surrogate id). */
  def nearby(devs: DataFrame, keyCol: String, k: Int = 10, radius: Double = 250.0): DataFrame = {
    val withC = SpatialJoin.withGeoMeta(devs.filter(col("center").isNotNull), "center")
    SpatialJoin.knn(
        build = withC, probe = withC,
        buildGeom = "center", probeGeom = "center",
        probeKey = keyCol, buildKey = keyCol,
        k = k + 1, radius = radius, cellSize = math.max(radius, 250.0))
      .filter(col(s"p_$keyCol") =!= col(s"b_$keyCol")) // exclude self
      .withColumn("rank", col("rank") - 1)
      .filter(col("rank") <= k)
  }
}
