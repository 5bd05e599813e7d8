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

  test("session_window streaming aggregate matches the batch form per session") {
    val evDir = java.nio.file.Files.createTempDirectory("events_sess").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(evDir, "events.parquet"))
    // complete mode: finite AvailableNow replay into a memory sink — the
    // final table is the full session set, directly comparable to batch
    val q = StreamingIngest.startSessions(spark, evDir, "sess_stream",
      outputMode = "complete")
    q.awaitTermination()
    val streamed = spark.sql("SELECT * FROM sess_stream")
    val batch = StreamingIngest.sessionsAgg(
      spark.read.parquet(s"$evDir/events.parquet"), "user_id", "ts", "30 minutes")
    assert(streamed.count() == batch.count(), "session counts differ")
    val joined = streamed.as("s").join(batch.as("b"),
      col("s.user_id") === col("b.user_id") &&
        col("s.session_start") === col("b.session_start"))
    assert(joined.count() == batch.count(), "session starts differ")
    assert(joined.filter(col("s.n_events") =!= col("b.n_events") ||
      col("s.session_end") =!= col("b.session_end")).count() == 0)
  }

  test("streaming density raster matches the batch rasterization per (window, pixel)") {
    val evDir = java.nio.file.Files.createTempDirectory("events_d").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(evDir, "events.parquet"))
    def lon = lit(11.0) + pmod(col("event_id"), lit(50L)) * 0.1 +
      pmod(col("event_id") * 7919L, lit(8L)) * 0.0005
    def lat = lit(55.0) + pmod(col("event_id"), lit(50L)) * 0.2 +
      pmod(col("event_id") * 104729L, lit(8L)) * 0.0005
    val q = StreamingIngest.startStreamingDensity(spark, evDir, "dens_stream",
      lon, lat, z = 14, res = 16)
    q.awaitTermination()
    val streamed = spark.sql("SELECT * FROM dens_stream")
    val batch = graft.SparkEntry.queries("q_stream_density")(spark, "/root/testdata/sf0.001")
    assert(streamed.count() == batch.count() && streamed.count() > 0)
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("hour", "tile_x", "tile_y", "px", "py"), "full_outer")
    assert(joined.filter(col("s.density") =!= col("b.density") ||
      col("s.density").isNull || col("b.density").isNull).count() == 0,
      "every (window, pixel) cell must agree between stream and batch")
  }

  test("update-mode density across two micro-batches: last update per key == batch") {
    // complete mode would disable watermark eviction (state grows with every
    // window ever seen); this drives the PRODUCTION default — update mode,
    // two time-ordered micro-batches — and checks the re-emitted aggregates
    // converge on the batch answer (density is a count, so the final value
    // per key is the max over its update emissions)
    val evDir = java.nio.file.Files.createTempDirectory("events_u").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartitionByRange(2, col("ts")) // part-0 = early rows, part-1 = late
      .write.mode("overwrite").parquet(evDir)
    def lon = lit(11.0) + pmod(col("event_id"), lit(50L)) * 0.1
    def lat = lit(55.0) + pmod(col("event_id"), lit(50L)) * 0.2
    val schema = spark.read.parquet(evDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(evDir)
    val q = StreamingIngest.streamingDensity(stream, "ts", lon, lat, z = 14, res = 16)
      .writeStream.outputMode("update")
      .format("memory").queryName("dens_upd")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.map(_.batchId).distinct.length >= 2,
      "the file split must actually produce two micro-batches")
    val streamed = spark.sql("SELECT * FROM dens_upd")
      .groupBy("hour", "tile_x", "tile_y", "px", "py")
      .agg(max(col("density")).as("density"))
    val batch = graft.operators.Raster.withPixel(
        spark.read.parquet(evDir), lon, lat, 14, 16)
      .groupBy(window(col("ts"), "1 hour").as("w"),
        col("tile_x"), col("tile_y"), col("px"), col("py"))
      .agg(count(lit(1)).as("density"))
      .select(col("w.start").as("hour"), col("tile_x"), col("tile_y"),
        col("px"), col("py"), col("density"))
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("hour", "tile_x", "tile_y", "px", "py"), "full_outer")
    assert(joined.filter(col("s.density") =!= col("b.density") ||
      col("s.density").isNull || col("b.density").isNull).count() == 0,
      "update-mode final state must equal the batch rasterization")
  }

  test("streaming WARC ingest: parseWarc over micro-batched archives == batch parse") {
    // the ingestion edge as Structured Streaming: archive blobs arrive as
    // files, each micro-batch walks its records — parseWarc is a
    // deterministic per-row projection, so stream==batch must be exact
    val warcDir = java.nio.file.Files.createTempDirectory("warc_s").toString
    val blobs = spark.range(200).select(
      concat(lit("http://a"), pmod(col("id"), lit(10L)), lit(".x/arch/"),
        col("id"), lit(".warc")).as("url"),
      concat(
        lit("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nsw: g\r\n\r\n"),
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a.x/p/"),
        pmod(col("id"), lit(7L)).cast("string"),
        lit("\r\nContent-Length: "),
        length(concat(lit("<html>b"), pmod(col("id"), lit(3L)).cast("string"))).cast("string"),
        lit("\r\n\r\n<html>b"), pmod(col("id"), lit(3L)).cast("string"),
        lit("\r\n\r\n")).cast("binary").as("blob"))
    blobs.repartition(3).write.mode("overwrite").parquet(warcDir)
    val schema = spark.read.parquet(warcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(warcDir)
    val q = graft.sources.Warc.parseWarc(stream, "url", "blob")
      .select(col("warc_file"), col("rec_ord"), col("record_type"),
        col("target_uri"), col("payload_len"))
      .writeStream.outputMode("append")
      .format("memory").queryName("warc_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.map(_.batchId).distinct.length >= 3,
      "file split must produce multiple micro-batches")
    val streamed = spark.sql("SELECT * FROM warc_stream")
    val batch = graft.sources.Warc.parseWarc(
        spark.read.parquet(warcDir), "url", "blob")
      .select(col("warc_file"), col("rec_ord"), col("record_type"),
        col("target_uri"), col("payload_len"))
    assert(streamed.count() == 400)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming parse must equal the batch walk row-for-row")
  }

  test("foreachBatch deviation sync is incremental (frontier-scoped) and replay-idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("stream_pages").toString
    val storeDir = java.nio.file.Files.createTempDirectory("stream_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt").toString
    val state = java.nio.file.Files.createTempDirectory("stream_state").toString
    val store = new DeviationStore(spark, storeDir)

    // batch 1: 300 sites (bulk path — dirty frontier spans the map)
    Pages.synthesize(spark, 300L).write.mode("append").parquet(dir)
    val q1 = StreamingIngest.startDeviationSync(spark, dir, ckpt, store, state)
    q1.awaitTermination()
    val n1 = store.latest().count()
    assert(n1 > 0)

    // canonical far-row snapshot (everything further than 30 km from the
    // batch-2 point must be untouched by the frontier-scoped batch)
    val px = 300000.0; val py = 7400000.0
    def farRows() = store.latest()
      .withColumn("c", graft.functions.GeoFunctions.stCentroid(col("center")))
      .filter(abs(col("c._1") - px) > 30000.0 || abs(col("c._2") - py) > 30000.0)
      .select(col("dataset_id"), col("layer_id"),
        concat_ws(",", transform(col("upstream_item_ids"), _.cast("string"))).as("ids"),
        col("osm_element_id"), col("osm_element_type"), col("title"),
        col("description"), col("action"))
      .collect().map(_.toString).sorted.toSeq

    val farBefore = farRows()

    // batch 2: ONE new upstream item at a quiet point, no OSM nearby ->
    // exactly one new "missing" deviation; everything far away untouched
    val page = Seq((
      "https://data.example.sv/bench/item/990001",
      java.sql.Timestamp.valueOf("2026-01-02 00:00:00"),
      "<html/>".getBytes("UTF-8"),
      s"""UPSTREAM 1 s990001 $px $py {"name":"POI 990001","kind":"bench"}""",
      "sv")).toDF("url", "warc_ts", "html", "text", "lang")
    page.write.mode("append").parquet(dir)
    val q2 = StreamingIngest.startDeviationSync(spark, dir, ckpt, store, state)
    q2.awaitTermination()

    val n2 = store.latest().count()
    assert(n2 == n1 + 1, s"one localized item must add exactly one deviation ($n1 -> $n2)")
    assert(farRows() == farBefore, "frontier-scoped batch touched far-away rows")
    val nw = store.latest().filter(array_contains(col("upstream_item_ids"), 1000000990001L))
      .collect()
    assert(nw.length == 1 && nw(0).getAs[String]("title") == "POI saknas")

    // replay with a FRESH checkpoint + state (reprocess everything): idempotent
    val ckpt2 = java.nio.file.Files.createTempDirectory("stream_ckpt2").toString
    val state2 = java.nio.file.Files.createTempDirectory("stream_state2").toString
    val q3 = StreamingIngest.startDeviationSync(spark, dir, ckpt2, store, state2)
    q3.awaitTermination()
    assert(store.latest().count() == n2, "replay must not duplicate rows")
  }

  test("flatMapGroupsWithState dedup: later copies suppressed across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("fsd").toString
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "tss")
        .select(col("doc_id"), col("text"), col("tss").cast("timestamp").as("ts"))
        .repartition(1).write.mode("append").parquet(dir)
    // batch 1 carries an IN-BATCH duplicate (ids 1 and 2, same text): the
    // deterministic winner is min (ts, doc_id) = 1, not iterator order
    write(Seq(
      (1L, "alpha body", "2026-01-01 00:00:00"),
      (2L, "alpha body", "2026-01-01 00:00:01"),
      (3L, "beta body", "2026-01-01 00:00:00")))
    // batch 2: a cross-batch duplicate of alpha -> state suppresses it
    write(Seq((9L, "alpha body", "2026-01-01 00:10:00")))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingDedup.firstSeenDedup(stream, "doc_id", "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("fsd_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.map(_.batchId).distinct.length >= 2)
    val out = spark.sql("SELECT doc_id FROM fsd_out").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 3L), s"got ${out.toSeq}")
  }

  test("flatMapGroupsWithState dedup: event-time TTL evicts state, key re-emits after") {
    val dir = java.nio.file.Files.createTempDirectory("fsd_ttl").toString
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "tss")
        .select(col("doc_id"), col("text"), col("tss").cast("timestamp").as("ts"))
        .repartition(1).write.mode("append").parquet(dir)
    // b1: first alpha (timeout set to ts+1h). b2: filler 4h later (after this
    // batch the watermark = 03:00 > timeout). b3: filler only -> alpha's key
    // has NO data this trigger, so its timeout invocation fires and removes
    // the state. b4: alpha copy -> first-seen again (the documented TTL
    // trade for bounded state).
    write(Seq((1L, "alpha body", "2026-01-01 00:00:00")))
    write(Seq((50L, "filler b", "2026-01-01 04:00:00")))
    write(Seq((51L, "filler c", "2026-01-01 04:00:01")))
    write(Seq((100L, "alpha body", "2026-01-01 05:00:00")))
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = StreamingDedup.firstSeenDedup(stream, "doc_id", "text", "ts",
        watermarkDelay = "1 hour", stateTtlMs = 3600000L)
      .writeStream.outputMode("append").format("memory").queryName("fsd_ttl_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.map(_.batchId).distinct.length >= 4)
    val alphas = spark.sql("SELECT doc_id FROM fsd_ttl_out")
      .collect().map(_.getLong(0)).filter(id => id == 1L || id == 100L).sorted
    assert(alphas.toSeq == Seq(1L, 100L),
      s"state must evict after the TTL and re-admit the key: got ${alphas.toSeq}")
  }

  test("streaming host-graph sync: micro-batched merge == batch graph; replay reads below") {
    val dir = java.nio.file.Files.createTempDirectory("stream_hg_pages").toString
    val store = java.nio.file.Files.createTempDirectory("stream_hg_store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_hg_ckpt").toString
    val pages = spark.range(600).select(
      concat(lit("http://s"), pmod(col("id"), lit(20L)), lit(".x/p/"),
        col("id")).as("url"),
      concat(lit("<a href=\"https://h"), pmod(col("id"), lit(7L)),
        lit(".x/t\">l</a>")).cast("binary").as("html"))
    pages.repartition(3).write.mode("overwrite").parquet(dir)
    val q = StreamingCrawl.startHostGraphSync(spark, dir, ckpt, store,
      maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    assert(q.recentProgress.map(_.batchId).distinct.length >= 3,
      "file split must produce multiple micro-batches")
    val streamed = StreamingCrawl.latestGraph(spark, store).get
    val batch = graft.operators.WebGraph.hostGraph(
      graft.operators.WebGraph.extractLinks(
        spark.read.parquet(dir), "url", "html"), "src_url", "dst_url")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "merged stream state must equal the batch host graph edge-for-edge")
    // replay safety: the state visible to a re-run of batch id B excludes
    // B's own (possibly partial) output
    val n = StreamingCrawl.latestGraph(spark, store).get.count()
    val ids = new java.io.File(store).listFiles().map(_.getName)
      .filter(_.startsWith("batch_")).map(_.stripPrefix("batch_").toLong).sorted
    val belowTop = StreamingCrawl.latestGraph(spark, store, below = Some(ids.max))
    assert(belowTop.isDefined && belowTop.get.count() <= n)
    assert(StreamingCrawl.latestGraph(spark, store, below = Some(ids.min)).isEmpty)
  }

  test("firstSeenDedup fails loudly on a non-integral id column") {
    import spark.implicits._
    // cast("long") on a UUID/string id nulls EVERY row and the null-drop
    // would silently emit an empty result — the schema check must throw
    val docs = Seq(("uuid-1", "body", java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("doc_id", "text", "ts")
    val ex = intercept[IllegalArgumentException] {
      StreamingDedup.firstSeenDedup(docs, "doc_id", "text", "ts", expireState = false)
    }
    assert(ex.getMessage.contains("integral"), ex.getMessage)
  }
}
