package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{DeviationStore, SparkTestBase}
import graft.sources.Pages

class StreamingSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("watermarked tumbling-window aggregate matches the batch equivalent") {
    // readStream needs a directory; the driver table is a single file
    val evDir = java.nio.file.Files.createTempDirectory("events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(evDir, "events.parquet"))
    val q = StreamingIngest.startEventsHourly(spark, evDir, "ev_stream")
    q.awaitTermination()
    val streamed = spark.sql("SELECT * FROM ev_stream")
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
    assert(streamed.count() == batch.count())
    val joined = streamed.as("s").join(batch.as("b"),
      col("s.hour") === col("b.hour") && col("s.event_type") === col("b.event_type"))
    assert(joined.filter(col("s.n_events") =!= col("b.n_events")).count() == 0)
  }

  test("foreachBatch deviation sync is incremental and replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("stream_pages").toString
    val storeDir = java.nio.file.Files.createTempDirectory("stream_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val store = new DeviationStore(spark, storeDir)

    // batch 1: 300 sites
    Pages.synthesize(spark, 300L).write.mode("append").parquet(dir)
    val q1 = StreamingIngest.startDeviationSync(spark, dir, ckpt, store)
    q1.awaitTermination()
    val n1 = store.latest().count()
    assert(n1 > 0)

    // batch 2: append a disjoint site-id range
    Pages.synthesize(spark, 300L, siteOffset = 10000L).write.mode("append").parquet(dir)
    val q2 = StreamingIngest.startDeviationSync(spark, dir, ckpt, store)
    q2.awaitTermination()
    val n2 = store.latest().count()
    assert(n2 > n1, s"appended pages must add deviations ($n1 -> $n2)")

    // replay with a FRESH checkpoint (reprocess everything): idempotent
    val ckpt2 = java.nio.file.Files.createTempDirectory("stream_ckpt2").toString
    val q3 = StreamingIngest.startDeviationSync(spark, dir, ckpt2, store)
    q3.awaitTermination()
    assert(store.latest().count() == n2, "replay must not duplicate rows")
  }
}
