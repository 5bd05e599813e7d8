package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * upstream.item maintenance (SURVEY.md §2.1 S3, port of
 * dags/osm_bjk/fetch_dataframe_operator.py:33-163): a fetched dataset batch
 * is merged into the item table either as
 *
 *  - FULL REFRESH (no stable original_id): the dataset's partition is
 *    replaced wholesale (the reference DELETEs all + re-inserts); or
 *  - KEYED UPSERT on (dataset_id, original_id): existing rows update
 *    geometry/attributes/updated_at, new rows insert, and rows absent from
 *    the batch are pruned ("prune-deleted").
 *
 * Ids are stable across upserts: an existing row keeps its id; new rows get
 * deterministic ids (63-bit xxhash of (dataset_id, original_id) — the full
 * hash space, not a 10^12 slice, so birthday collisions stay negligible even
 * at 10^9 items), so re-running a fetch is idempotent. The reference uses a
 * DB sequence which cannot collide; since a hash can, every sync AUDITS the
 * written partition and fails loudly on an id collision instead of silently
 * merging two items. The table is stored as dataset_id-partitioned parquet
 * snapshots — the LIST-partitioning analog (07-upstream-base.sql:29-44), one
 * partition overwritten per sync.
 */
class UpstreamSync(spark: SparkSession, path: String) {

  /** deterministic 63-bit non-negative id from (dataset_id, original_id). */
  private def itemId(datasetId: Long) =
    xxhash64(lit(datasetId), col("original_id")).bitwiseAND(lit(Long.MaxValue))

  /** fail loudly if two distinct original_ids hash to one id (ADVICE r1). */
  private def auditIds(fresh: DataFrame): Unit = {
    val dup = fresh.groupBy("id")
      .agg(countDistinct(col("original_id")).as("n")).filter(col("n") > 1).count()
    require(dup == 0, s"upstream item id collision on $dup ids — re-key the dataset")
  }

  private def latestVersion: Option[Int] = {
    val p = Paths.get(path, "_latest")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p)).trim.toInt) else None
  }

  def items(): DataFrame = latestVersion match {
    // partition-dir values re-infer as int — pin the schema's long
    case Some(v) => spark.read.parquet(s"$path/v=$v")
      .withColumn("dataset_id", col("dataset_id").cast("long"))
    case None =>
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "id LONG, dataset_id LONG, original_id STRING, geometry BINARY, " +
          "original_attributes STRING, updated_at TIMESTAMP"))
  }

  private def commit(df: DataFrame): Unit = {
    val v = latestVersion.getOrElse(0) + 1
    df.write.mode("overwrite").partitionBy("dataset_id").parquet(s"$path/v=$v")
    Files.write(Paths.get(path, "_latest"), v.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** full refresh: replace one dataset partition wholesale. */
  def fullRefresh(datasetId: Long, batch: DataFrame): Unit = {
    val others = items().filter(col("dataset_id") =!= datasetId)
    val fresh = batch
      .withColumn("dataset_id", lit(datasetId))
      .withColumn("id", itemId(datasetId))
    auditIds(fresh)
    commit(others.unionByName(fresh.select(items().columns.map(col): _*)))
  }

  /** keyed upsert + prune-deleted on (dataset_id, original_id). */
  def upsert(datasetId: Long, batch: DataFrame): (Long, Long, Long) = {
    val others = items().filter(col("dataset_id") =!= datasetId)
    val existing = items().filter(col("dataset_id") === datasetId).cache()
    val b = batch.withColumn("dataset_id", lit(datasetId)).cache()

    val updated = existing.as("e").join(b.as("v"), Seq("dataset_id", "original_id"), "inner")
      .select(col("e.id"), col("dataset_id"), col("original_id"),
        col("v.geometry").as("geometry"),
        col("v.original_attributes").as("original_attributes"),
        col("v.updated_at").as("updated_at"))
    val inserted = b.join(existing.select("dataset_id", "original_id"),
        Seq("dataset_id", "original_id"), "left_anti")
      .withColumn("id", itemId(datasetId))
    val pruned = existing.join(b.select("dataset_id", "original_id"),
      Seq("dataset_id", "original_id"), "left_anti")

    val cols = items().columns.map(col)
    val (nU, nI, nP) = (updated.count(), inserted.count(), pruned.count())
    auditIds(updated.select(cols: _*).unionByName(inserted.select(cols: _*)))
    commit(others.unionByName(updated.select(cols: _*))
      .unionByName(inserted.select(cols: _*)))
    existing.unpersist(); b.unpersist()
    (nU, nI, nP)
  }
}
