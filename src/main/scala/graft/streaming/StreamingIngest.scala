package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Structured-Streaming front end (SURVEY.md §2.10): the reference emulates
 * streaming with 10-minute Airflow micro-batches + triggers; here the same
 * semantics run as readStream -> foreachBatch over the pages table, each
 * micro-batch being one replication batch:
 *
 *   pages stream -> extract features -> per-dataset match + deviation view
 *   -> DeviationStore.sync (idempotent upsert keyed on the uniq tuple, so
 *   replays are safe — the sequence-number checkpoint of osm_replication.py
 *   maps onto Spark's checkpointLocation offsets).
 *
 * Plus a classic watermarked tumbling-window aggregate over the events
 * stream (the T8 capability the reference lacks but a Spark engine should
 * expose).
 */
object StreamingIngest {

  /** watermarked tumbling hourly aggregate over an events directory. */
  def eventsHourly(spark: SparkSession, eventsDir: String): DataFrame = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).parquet(eventsDir)
      // the driver parquet stores ts as TIMESTAMP_NTZ; event-time semantics
      // need the instant type
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  def startEventsHourly(spark: SparkSession, eventsDir: String, queryName: String): StreamingQuery =
    eventsHourly(spark, eventsDir).writeStream
      .outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /**
   * Incremental deviation maintenance as a pages stream: every micro-batch
   * of new/updated pages re-extracts the affected features and syncs the
   * benchmark dataset's deviations into `store`. Restartable from
   * `checkpointDir` (offsets) on top of the store's own idempotent merge.
   */
  def startDeviationSync(spark: SparkSession, pagesDir: String, checkpointDir: String,
                         store: graft.engine.DeviationStore): StreamingQuery = {
    val schema = spark.read.parquet(pagesDir).schema
    spark.readStream.schema(schema).parquet(pagesDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one replication batch: recompute the view over ALL pages seen so
        // far (the store merge makes this idempotent); at scale this narrows
        // to the dirty frontier (Incremental.applyEdits) — same store API.
        val allPages = spark.read.parquet(pagesDir)
        val m = graft.engine.BenchPipeline.matchRows(allPages)
        val dev = graft.engine.BenchPipeline.deviations(m)
        store.sync("bench_pois", dev)
        ()
      }
      .start()
  }
}
