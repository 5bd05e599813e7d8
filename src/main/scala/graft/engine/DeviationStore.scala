package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.broadcast.Broadcast
import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * The api.deviation table as a versioned-snapshot parquet store with the
 * reference's merge semantics (upstream.sync_deviations,
 * 15-recalculation.sql:95-124):
 *
 *  - upsert keyed on the `uniq` tuple (dataset_id, layer_id,
 *    upstream_item_ids, osm_element_id, osm_element_type, title, view_name)
 *    with NULLS NOT DISTINCT (09-api-deviation.sql:21-23) — null-safe `<=>`
 *    joins;
 *  - matched rows update ONLY suggested_geom/suggested_tags/description/note;
 *    action, action_at, center and municipality_code are preserved (the
 *    BEFORE-INSERT trigger computes center/muni only on the insert path);
 *  - rows of this view no longer produced are deleted unless user-actioned
 *    (action other than NULL/'deferred' is kept);
 *  - returns (upserted, deleted) counts.
 *
 * Checkpointing (north rule): every sync writes a new snapshot directory
 * `v=N` plus `_metrics/N.json` carrying per-partition row counts and input
 * lineage, and flips the `_latest` pointer last — so any failed run is
 * invisible and any cell-range can be recomputed idempotently by re-running
 * the sync (same inputs -> same snapshot content). No Iceberg jar ships in
 * this environment, so the snapshot/pointer protocol is hand-rolled; on a
 * real cluster this maps 1:1 onto Iceberg MERGE + snapshot metadata.
 */
class DeviationStore(spark: SparkSession, path: String) {
  import DeviationStore._

  private def latestVersion: Option[Int] = {
    val p = Paths.get(path, "_latest")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toInt) else None
  }

  def latest(): DataFrame = latestVersion match {
    case Some(v) => spark.read.parquet(s"$path/v=$v")
    case None    => spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  def currentVersion: Int = latestVersion.getOrElse(0)

  /** Write a full table state as the next snapshot (with metrics), flip pointer. */
  def commit(df: DataFrame, lineage: String): Int = {
    val v = currentVersion + 1
    val out = df.select(schema.fieldNames.map(col): _*).cache()
    out.write.mode(SaveMode.Overwrite).parquet(s"$path/v=$v")
    // per-partition lineage + row counts (scales: one small agg)
    val counts = out.groupBy(spark_partition_id().as("pid")).count()
      .collect().map(r => s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)}}""")
    Files.createDirectories(Paths.get(path, "_metrics"))
    Files.write(Paths.get(path, "_metrics", s"$v.json"),
      s"""{"version":$v,"lineage":${q(lineage)},"partitions":[${counts.mkString(",")}]}"""
        .getBytes("UTF-8"))
    Files.write(Paths.get(path, "_latest"), v.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    out.unpersist()
    v
  }

  private def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /**
   * sync_deviations(view): merge `newDevs` (output of DeviationView.deviations,
   * columns up to `center`) into the store. `munis` stamps municipality_code
   * on inserted rows (closest-polygon fallback, 32:1-14).
   */
  def sync(viewName: String, newDevs: DataFrame,
           munis: Option[Broadcast[Array[(String, Array[Byte])]]] = None): (Long, Long) = {
    import graft.operators.SpatialJoin
    val old = latest().cache()
    val oldView = old.filter(col("view_name") === viewName)
    val oldOthers = old.filter(col("view_name") =!= viewName || col("view_name").isNull)

    val nw = newDevs.withColumn("view_name", lit(viewName)).cache()
    val nwK = keyed(nw, "n_")
    val oldK = keyed(oldView, "o_")
    val joinCond = keyCols.map(k => col(s"n_$k") <=> col(s"o_$k")).reduce(_ && _)

    // full outer merge on the uniq key
    val merged = nwK.join(oldK, joinCond, "full_outer")

    val withMeta = munis match {
      case Some(b) =>
        val g = SpatialJoin.withGeoMeta(
          merged.withColumn("__cw", coalesce(col("n_center"), col("o_center"))), "__cw")
        g.withColumn("__muni",
            MatchEngine.municipalityCodeUdf(b, closestFallback = true)(col("cx"), col("cy")))
          .drop("__cw", "cx", "cy", "is_point")
      case None => merged.withColumn("__muni", lit(null).cast("string"))
    }

    val actioned = col("o_action").isNotNull && col("o_action") =!= "deferred"
    val isNew = col("n_title_present")
    val isOld = col("o_title_present")

    val result = withMeta
      // old-only rows survive only if user-actioned (deletion rule)
      .filter(isNew || (isOld && actioned))
      .select(
        coalesce(col("n_dataset_id"), col("o_dataset_id")).as("dataset_id"),
        coalesce(col("n_layer_id"), col("o_layer_id")).as("layer_id"),
        coalesce(col("n_upstream_item_ids"), col("o_upstream_item_ids")).as("upstream_item_ids"),
        when(isNew, col("n_suggested_geom")).otherwise(col("o_suggested_geom")).as("suggested_geom"),
        when(isNew, col("n_suggested_tags")).otherwise(col("o_suggested_tags")).as("suggested_tags"),
        coalesce(col("n_osm_element_id"), col("o_osm_element_id")).as("osm_element_id"),
        coalesce(col("n_osm_element_type"), col("o_osm_element_type")).as("osm_element_type"),
        coalesce(col("n_title"), col("o_title")).as("title"),
        when(isNew, col("n_description")).otherwise(col("o_description")).as("description"),
        when(isNew, col("n_note")).otherwise(col("o_note")).as("note"),
        lit(viewName).as("view_name"),
        // center/municipality: computed on insert, preserved on update
        when(isOld, col("o_center")).otherwise(col("n_center")).as("center"),
        when(isOld, col("o_municipality_code")).otherwise(col("__muni")).as("municipality_code"),
        col("o_action").as("action"),
        col("o_action_at").as("action_at"))

    val upserted = nw.count()
    val deleted = oldK.join(nwK, joinCond, "left_anti").filter(!actionedO).count()
    commit(oldOthers.unionByName(result, allowMissingColumns = true),
      s"sync:$viewName")
    old.unpersist(); nw.unpersist()
    (upserted, deleted)
  }

  private val actionedO = col("o_action").isNotNull && col("o_action") =!= "deferred"

  /** prefix all columns and add a presence marker (for full-outer bookkeeping) */
  private def keyed(df: DataFrame, p: String): DataFrame = {
    val base = schema.fieldNames.foldLeft(df) { (d, c) =>
      if (d.columns.contains(c)) d.withColumnRenamed(c, p + c)
      else d.withColumn(p + c, lit(null).cast(schema(c).dataType))
    }
    base.withColumn(s"${p}title_present", lit(true))
  }
}

object DeviationStore {
  val keyCols: Seq[String] = Seq("dataset_id", "layer_id", "upstream_item_ids",
    "osm_element_id", "osm_element_type", "title")

  val schema: StructType = StructType(Seq(
    StructField("dataset_id", LongType),
    StructField("layer_id", LongType),
    StructField("upstream_item_ids", ArrayType(LongType, containsNull = false)),
    StructField("suggested_geom", BinaryType),
    StructField("suggested_tags", MapType(StringType, StringType, valueContainsNull = true)),
    StructField("osm_element_id", LongType),
    StructField("osm_element_type", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("note", StringType),
    StructField("view_name", StringType),
    StructField("center", BinaryType),
    StructField("municipality_code", StringType),
    StructField("action", StringType),
    StructField("action_at", TimestampType)))
}
