package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/**
 * Plan-quality gates (SURVEY.md §4): the declarative queries must produce
 * the physical plans a 100 TB deployment needs — pushed parquet filters,
 * broadcast joins for dims, whole-stage codegen on the hot path. Guards
 * against regressions that silently de-optimize (e.g. a UDF slipping into a
 * filter and killing pushdown).
 */
class PlanQualitySpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  private def plan(q: String): String =
    finalPlan(SparkEntry.queries(q)(spark, dir))

  test("q6 selective scan pushes filters into the parquet reader") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("l_shipdate") && p.contains("l_quantity"))
  }

  test("q2 joins dims via broadcast, not shuffle") {
    val p = plan("q2_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q1 aggregates with map-side partial aggregation inside codegen") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p.take(2000))
    // formatted mode marks codegen'd operators with [codegen id : N]
    assert(p.contains("codegen id"), p.take(2000))
  }

  test("fused topo50 match plans ONE bucketed join for all categories") {
    import org.apache.spark.sql.functions._
    import graft.operators.SpatialJoin
    import spark.implicits._
    val items = SpatialJoin.withGeoMeta(Seq(
      (1L, 140L, """{"andamal":"Golfbana"}""", graft.core.geom.Geom.toWkb(graft.core.geom.Geom.point(1000, 1000))),
      (2L, 140L, """{"andamal":"Täkt"}""", graft.core.geom.Geom.toWkb(graft.core.geom.Geom.point(2000, 2000))))
      .toDF("id", "dataset_id", "original_attributes", "geometry"), "geometry")
    val osm = SpatialJoin.withGeoMeta(Seq(
      ("n", 1L, Map("leisure" -> "golf_course"), graft.core.geom.Geom.toWkb(graft.core.geom.Geom.point(1100, 1000))))
      .toDF("type", "id", "tags", "geom"), "geom")
    val p = finalPlan(Topo50.matchView(osm, items, Topo50.anlaggningsomrade, 140L))
    // 15 categories, but exactly ONE shuffle/broadcast join for candidates
    // (the per-leg shape had |cats| joins + |cats| rank windows); count via
    // the formatted-details node headers (the tree repeats operator names)
    // count operators in the FINAL adaptive tree only (the formatted output
    // also lists the pre-AQE initial plan's nodes)
    val tree = {
      val from = p.indexOf("== Final Plan ==")
      val to = p.indexOf("== Initial Plan ==")
      if (from >= 0 && to > from) p.substring(from, to) else p
    }
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(tree).size
    assert(joins == 1, s"expected 1 candidate join, got $joins\n$tree")
    // default rank form is the window (A/B showed it beats the min_by
    // aggregation's per-row payload copy; SPARK_GRAFT_RANK_MINBY opts into
    // the aggregation for extreme-skew deployments)
    val windows = "(?m)\\bWindow \\(".r.findAllIn(tree).size
    assert(windows == 1, s"expected 1 rank window, got $windows\n$tree")
  }

  test("export top-1000 plans as distributed TakeOrdered, not a global window") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // >1000 input rows: with fewer, Spark proves maxRows <= limit and
    // eliminates the limit itself (which is also fine — but not this test)
    val devs = (1 to 2500).map(i => (1L, 1L, s"T$i", i.toLong, "n", "0180", Seq(i.toLong)))
      .toDF("dataset_id", "layer_id", "title", "osm_element_id",
        "osm_element_type", "municipality_code", "upstream_item_ids")
    val p = finalPlan(Exports.filteredDeviations(devs, Exports.DevFilter()))
    assert(p.contains("TakeOrderedAndProject"), p.take(1200))
  }

  test("match candidate refinement stays native (no UDF filter)") {
    val pages = graft.sources.Pages.synthesize(spark, 100L)
    val m = BenchPipeline.matchRows(pages, cacheInputs = false)
    val p = finalPlan(m)
    // the dist refinement + match condition must appear as native SQRT /
    // map-key expressions (Catalyst rewrites map_contains_key to
    // array_contains(map_keys)); the only allowed UDF is the non-point
    // distance fallback branch inside the CASE
    assert(p.contains("SQRT"), "point distance should be native arithmetic")
    assert(p.contains("array_contains(map_keys") || p.contains("map_contains_key"),
      "tag predicate should be native map access")
    assert(p.contains("lower("), "name tier should be native lower() equality")
  }

  test("ReadApi dim lookups broadcast, never shuffle (S10)") {
    import spark.implicits._
    // region_name: a fact-sized municipality table joined to the 21-row dim
    // must plan as a BroadcastHashJoin — shuffling the fact side by a 2-char
    // prefix would be the scale bug
    val munis = (0 until 300).map(i => (f"${i % 26}%02d${i % 100}%02d", s"M$i"))
      .toDF("code", "name")
    val p1 = finalPlan(ReadApi.withRegionName(munis, ReadApi.regions(spark)))
    assert(p1.contains("BroadcastHashJoin"), p1.take(1500))
    assert(!p1.contains("SortMergeJoin"), "region dim must not shuffle the fact side")
    val layers = Seq((5L, "Skolor", true)).toDF("id", "name", "is_major")
    val ml = Seq((1L, "2180", 5L, "2024-01-01")).toDF(
      "id", "municipality_code", "layer_id", "last_checked")
    val p2 = finalPlan(ReadApi.municipalityLayer(ml, layers))
    assert(p2.contains("BroadcastHashJoin") && !p2.contains("SortMergeJoin"))
  }

  test("rasterize is one codegen'd hash aggregation over a pruned scan") {
    val p = plan("q_raster_density")
    // map-side partial + final HashAggregate, all pixel math in codegen
    assert(p.contains("HashAggregate"), p.take(1500))
    assert(p.contains("codegen id"), p.take(1500))
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("SortAggregate"))
    // projection pruning: the scan must read ONLY the key column
    val rs = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(rs.exists(s => s.contains("c_custkey") && !s.contains("c_name")),
      s"scan should read only c_custkey, got $rs")
  }

  test("alternatives pick window partitions by scalar keys, not the ids ARRAY") {
    import spark.implicits._
    // hashing an ARRAY<LONG> per row for the rank shuffle was VERDICT r2 #7;
    // the fix keys the window on (first id, osm id, osm type) — assert no
    // ArrayType expression survives in any window partitionSpec
    val g = graft.core.geom.Geom.toWkb(graft.core.geom.Geom.point(100, 100))
    val matchDf = Seq(
      (Seq(10L), Seq(Map("amenity" -> "x"), Map("amenity" -> "y")),
        Map("amenity" -> "x"), Option(1L), Option("n"), g, g))
      .toDF("upstream_item_ids", "upstream_tags", "osm_tags",
        "osm_element_id", "osm_element_type", "upstream_geom", "osm_geom")
    val out = DeviationView.deviations(matchDf, DeviationView.DeviationConfig(
      datasetId = 1L, layerId = 1L, viewName = "t",
      titles = BenchPipeline.titles))
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty, "alternatives path should plan a rank window")
    for (w <- windows; e <- w.partitionSpec)
      assert(!e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
        s"window partition key must be scalar, got ${e.sql}")
  }

  test("multimodal decode family prunes the documents scan to (doc_id, text)") {
    // mapPartitions deserializes its INPUT projection, not the table — the
    // parquet scan under asFakeMedia -> resize must still read only the two
    // columns the fake-media header needs
    val p = plan("q_mm_resize")
    val rs = "ReadSchema: \\S+".r.findFirstIn(p).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("text"), rs)
    assert(!rs.contains("source") && !rs.contains("lang"), s"scan over-reads: $rs")
  }

  test("PII redaction is one shuffle-free codegen pass over a pruned scan") {
    val p = plan("q_txt_pii")
    assert(!p.contains("Exchange"), "redaction must not shuffle")
    assert(p.contains("codegen id"), p.take(2000))
    val rs = "ReadSchema: \\S+".r.findFirstIn(p).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("text") && !rs.contains("source"),
      s"scan over-reads: $rs")
  }

  test("tfidf prunes the documents scan and joins df without nested loops") {
    val p = plan("q_txt_tfidf")
    val rs = "ReadSchema: \\S+".r.findFirstIn(p).getOrElse("")
    assert(rs.contains("doc_id") && rs.contains("text") && !rs.contains("lang"),
      s"scan over-reads: $rs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the single broadcast of the 1-row corpus count is the only allowed
    // nested-loop; the tf x df join itself must be an equi join. Count in
    // the final-plan tree only — AQE's formatted output re-numbers the same
    // operators in the initial-plan tree and the detail section.
    val finalTree = p.substring(0, math.max(p.indexOf("== Initial Plan =="), 0) match {
      case 0 => p.length; case i => i
    })
    assert("BroadcastNestedLoopJoin".r.findAllIn(finalTree).size <= 1, p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "tf x df must hash-join")
  }

  test("quantiles window runs over the histogram aggregate, not raw rows") {
    val p = plan("q_txt_quantiles")
    // the (group, value) hash aggregate must sit below the running-sum window
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0, p.take(2000))
    assert(!p.contains("CartesianProduct"), "rank probe went cartesian")
    val rs = "ReadSchema: \\S+".r.findFirstIn(p).getOrElse("")
    assert(rs.contains("lang") && rs.contains("n_chars") && !rs.contains("text"),
      s"scan over-reads: $rs")
  }

  test("ngram dedup pairs via shingle equi-join — no cartesian, no nested-loop") {
    val p = plan("q_dedup_ngram")
    assert(!p.contains("CartesianProduct"), "pair generation went cartesian")
    assert(!p.contains("BroadcastNestedLoop"), "pair generation went nested-loop")
  }

  test("ANN top-k joins corpus and probes on the bucket key, never nested-loop") {
    val p = plan("q_emb_ann")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "LSH bucket join must be an equi join")
  }

  test("brute-force cosine baseline broadcasts the query side (intended O(corpus x queries))") {
    // the exact baseline is deliberately all-pairs — but the small side must
    // be BROADCAST, not a shuffled cartesian
    val p = plan("q_emb_cospairs")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), "query side must broadcast")
  }

  test("cosine scorer uses the native dot expression, not interpreted higher-order funcs") {
    // aggregate(zip_with(...)) is CodegenFallback — per-pair interpreted
    // eval; the scorer must be the codegen'd VecDot
    val p = plan("q_emb_cospairs")
    assert(p.contains("vecdot"), p.take(1500))
    assert(!p.contains("zip_with"), "scorer fell back to higher-order functions")
  }

  test("IVF top-k joins inverted lists on the cell key, never nested-loop") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = finalPlan(graft.operators.Similarity.ivfTopK(
      e, e.filter(pmod(col("vec_id"), lit(100L)) === 0),
      "vec_id", "embedding", k = 3, nlist = 8, nprobe = 2))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "IVF must equi-join on the cell id")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(1500))
  }

  test("block scoring and main-content reassembly are shuffle-free single passes") {
    val p1 = plan("q_txt_blocks")
    assert(!p1.contains("Exchange"), "contentBlocks must not shuffle the page scan")
    val p2 = plan("q_txt_maincontent")
    assert(!p2.contains("Exchange"), "mainContent must not shuffle the page scan")
    // the fixture synthesizes html from doc_id only — the scan must prune
    val rs = "ReadSchema: \\S+".r.findFirstIn(p2).getOrElse("")
    assert(rs.contains("doc_id") && !rs.contains("text"), s"scan over-reads: $rs")
  }

  test("bloom decontamination filters the corpus BEFORE any shuffle") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // AQE wraps stages in AdaptiveSparkPlanExec whose tree traversal stops
    // at stage boundaries — audit the static plan instead
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = SparkEntry.queries("q_dedup_bloom_oracle")(spark, dir)
        .queryExecution.executedPlan
      val udfFilters = exec.collectWithSubqueries {
        case f: FilterExec if f.condition.toString.toLowerCase.contains("udf") => f
      }
      assert(udfFilters.nonEmpty,
        s"bloom membership filter missing from the plan\n$exec")
      udfFilters.foreach { f =>
        // the fixture's explicit input repartition (REPARTITION_BY_NUM) is
        // allowed below the filter; no PLANNED shuffle may be
        val planned = f.collect {
          case s: ShuffleExchangeExec
            if s.shuffleOrigin.toString == "ENSURE_REQUIREMENTS" => s
        }
        assert(planned.isEmpty,
          s"bloom filter must run on the scan side, upstream of every planned shuffle: $planned")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("bigram surprisal scores off the checkpointed pair table — one text scan total") {
    // the corpus text is consumed while BUILDING the checkpointed inst
    // table; the FINAL plan must touch parquet only for the doc_id spine
    val p = plan("q_txt_surprisal")
    assert(p.contains("ExistingRDD"), "inst table not checkpoint-truncated")
    val schemas = "ReadSchema: \\S+".r.findAllIn(p).toList
    assert(schemas.nonEmpty && schemas.forall(!_.contains("text")),
      s"final plan re-reads text: $schemas")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
  }

  test("DSIR scoring broadcasts the target model and never nested-loops") {
    val p = plan("q_sample_dsir")
    assert(p.contains("ExistingRDD"), "inst table not checkpoint-truncated")
    assert(p.contains("BroadcastHashJoin"), "target model should broadcast")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
  }

  // ---- web-graph / crawl plan gates (VERDICT r4 #4: the DriveWebGraph
  // audits as failing tests, not manual dev drivers). Exchange counts use
  // SpatialLayout.exchangeNodes — the AQE-aware executed-plan walk — never
  // formatted-string counting (which double-counts across plan sections).

  private def webPages(n: Long) = {
    import org.apache.spark.sql.functions._
    spark.range(n).select(
      concat(lit("http://site"), pmod(col("id"), lit(500L)), lit(".example/p/"),
        col("id")).as("url"),
      concat(lit("<a href=\"https://hub"), pmod(col("id"), lit(97L)),
        lit(".example/x\">l</a><a href=\"/local/"), pmod(col("id"), lit(9L)),
        lit("\">r</a>")).cast("binary").as("html"))
  }

  private def audited(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // finalize AQE on df's own plan before walking it
    (graft.operators.SpatialLayout.exchangeNodes(df),
      graft.operators.SpatialLayout.planNodeNames(df))
  }

  /** run `body` with auto-broadcast OFF so any BroadcastHashJoin the asserts
    * require can only come from an explicit broadcast() hint — deleting the
    * hint fails the test instead of being silently patched by size stats. */
  private def noAutoBroadcast[A](body: => A): A = {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("web parsers/extractors are zero-Exchange single passes") {
    import org.apache.spark.sql.functions._
    import graft.operators.WebGraph
    val pages = webPages(2000)
    val warcs = spark.range(500).select(
      concat(lit("f"), col("id")).as("url"),
      concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://h"),
        pmod(col("id"), lit(97L)),
        lit(".example/p\r\nContent-Length: 6\r\n\r\nabcdef\r\n\r\n"))
        .cast("binary").as("blob"))
    val maps = spark.range(500).select(
      concat(lit("f"), col("id")).as("url"),
      concat(lit("<urlset><url><loc>http://h"), pmod(col("id"), lit(97L)),
        lit(".example/p</loc></url></urlset>")).cast("binary").as("xml"))
    for ((name, df) <- Seq(
        "extractLinks" -> WebGraph.extractLinks(pages, "url", "html"),
        "extractAnchors" -> WebGraph.extractAnchors(pages, "url", "html"),
        "extractText" -> graft.operators.WebText.extractText(pages, "url", "html"),
        "parseWarc" -> graft.sources.Warc.parseWarc(warcs, "url", "blob"),
        "parseSitemaps" -> WebGraph.parseSitemaps(maps, "url", "xml"))) {
      val (ex, _) = audited(df)
      assert(ex.isEmpty, s"$name must be shuffle-free, planned: $ex")
    }
  }

  test("hostGraph is ONE map-side-combined Exchange; merge is an equi full-outer") {
    import graft.operators.WebGraph
    val links = WebGraph.extractLinks(webPages(2000), "url", "html")
    val hg = WebGraph.hostGraph(links, "src_url", "dst_url")
    val (ex, _) = audited(hg)
    assert(ex.size == 1, s"hostGraph must shuffle exactly once, planned: $ex")
    val (_, mergeNodes) = audited(WebGraph.mergeHostGraphs(hg, hg))
    assert(!mergeNodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
      s"merge must stay an equi join: $mergeNodes")
  }

  test("fixed-point graph loops never plan all-pairs; trustRank seeds broadcast explicitly") {
    import org.apache.spark.sql.functions._
    import graft.operators.WebGraph
    noAutoBroadcast {
      val hg = WebGraph.hostGraph(
        WebGraph.extractLinks(webPages(2000), "url", "html"), "src_url", "dst_url")
        .localCheckpoint()
      val seeds = spark.range(10).select(
        concat(lit("hub"), col("id") * 9L, lit(".example")).as("host"))
      for ((name, df) <- Seq(
          "pageRank" -> WebGraph.pageRankFixedPoint(hg, "src_host", "dst_host", iters = 3),
          "trustRank" -> WebGraph.trustRank(hg, "src_host", "dst_host", seeds, "host", iters = 3),
          "hits" -> WebGraph.hitsFixedPoint(hg, "src_host", "dst_host", iters = 2))) {
        val (_, nodes) = audited(df)
        assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
          s"$name planned all-pairs: $nodes")
      }
      val (_, tn) = audited(WebGraph.trustRank(hg, "src_host", "dst_host",
        seeds, "host", iters = 1))
      assert(tn.exists(_.contains("BroadcastHashJoin")),
        s"trustRank's seed join must be the explicit broadcast: $tn")
    }
  }

  test("hostBlocklist distincts hosts first and broadcasts the blocklist explicitly") {
    import org.apache.spark.sql.functions._
    import graft.operators.WebGraph
    noAutoBroadcast {
      val frontier = spark.range(5000).select(
        concat(lit("http://h"), pmod(col("id"), lit(200L)),
          lit(".example/p/"), col("id")).as("url"))
      val bl = spark.range(50).select(
        concat(lit("h"), col("id"), lit(".example")).as("domain"))
      val df = WebGraph.hostBlocklist(frontier, "url", bl, "domain")
      val (ex, nodes) = audited(df)
      assert(nodes.exists(_.contains("BroadcastHashJoin")),
        s"blocklist join must be the explicit broadcast: $nodes")
      assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")))
      // the suffix explode runs over DISTINCT hosts: the distinct shuffle +
      // the two join-back sides are the only SHUFFLE Exchanges (the
      // BroadcastExchange is the blocklist itself) — the 5x-exploded
      // suffix table never shuffles (the session-7 regression this
      // audit caught live)
      assert(ex.count(!_.contains("Broadcast")) <= 3,
        s"suffix explode is shuffling: $ex")
    }
  }

  test("packSequences windows are bucket-partitioned; the bucket base broadcasts") {
    import org.apache.spark.sql.functions._
    noAutoBroadcast {
      val docs = spark.range(2000).select(col("id").as("doc_id"),
        concat(lit("w"), pmod(col("id"), lit(500L)), lit(" w"),
          pmod(col("id") * 7L, lit(500L)), lit(" the")).as("text"))
      val df = graft.operators.TextAnalysis.packSequences(
        docs, "doc_id", "text", seqLen = 512, bucketSize = 100L)
      df.collect()
      // every corpus-sized window must be PARTITIONED (the per-bucket
      // running sum); only the bucket-TOTALS window (N/bucketSize rows) may
      // order globally — a global orderBy window over the corpus is the
      // 10^12-row single-task funnel
      val windows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
      assert(windows.size == 2, s"expected intra-bucket + bucket-total windows, got ${windows.size}")
      assert(windows.count(_.partitionSpec.nonEmpty) >= 1,
        "the corpus prefix-sum window lost its bucket partitioning")
      val (_, nodes) = audited(df)
      assert(nodes.exists(_.contains("BroadcastHashJoin")),
        s"bucket-base join must be the explicit broadcast: $nodes")
    }
  }

  test("bannedWords and mixtureAllocate broadcast their small sides explicitly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    noAutoBroadcast {
      val docs = spark.range(2000).select(col("id").as("doc_id"),
        concat(lit("w"), pmod(col("id"), lit(50L)), lit(" bad w"),
          pmod(col("id") * 7L, lit(50L))).as("text"))
      val (_, bn) = audited(graft.operators.WebText.bannedWords(
        docs, "doc_id", "text", Seq("bad", "w3").toDF("w"), "w", maxHits = 0L))
      assert(bn.exists(_.contains("BroadcastHashJoin")),
        s"banned list must broadcast: $bn")
      assert(!bn.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")))
      val dom = docs.withColumn("dom",
        concat(lit("d"), pmod(col("doc_id"), lit(5L))))
      val (_, mx) = audited(graft.operators.Sampling.mixtureAllocate(
        dom, "doc_id", "dom", "text",
        weightsPpm = Seq("d0" -> 500000L, "d1" -> 500000L),
        budgetTokens = 1000L, salt = 3L))
      assert(mx.exists(_.contains("BroadcastHashJoin")),
        s"weight/rate tables must broadcast: $mx")
      assert(!mx.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")))
    }
  }

  test("crawlChurn's rank window and pivot share ONE url shuffle") {
    import org.apache.spark.sql.functions._
    val crawls = spark.range(2000).select(
      concat(lit("http://s.example/p/"), pmod(col("id"), lit(200L))).as("url"),
      col("id").as("ts"),
      concat(lit("head\nL"), pmod(col("id"), lit(7L)), lit("\ntail")).as("text"))
    val df = graft.operators.WebText.crawlChurn(crawls, "url", "ts", "text")
    val (ex, _) = audited(df)
    assert(ex.size <= 1, s"churn must reuse the url partitioning, planned: $ex")
  }

  test("bpe merge loop keeps the vocab plan O(1) per round (checkpoint truncation)") {
    val (merges, vocab) = graft.operators.TextAnalysis.bpeTrain(
      spark.read.parquet(s"$dir/documents.parquet"), "text", numMerges = 4)
    // merges are driver-built rows; vocab reads the checkpointed RDD, not a
    // 4-merge-deep lineage over the corpus scan
    val vp = vocab.queryExecution.executedPlan.toString
    assert(vp.contains("ExistingRDD"), vp.take(1500))
    assert(!vp.toLowerCase.contains("parquet"),
      "vocab lineage still reaches the corpus scan — checkpoint truncation lost")
    assert(merges.queryExecution.executedPlan.toString.contains("LocalTableScan"))
  }

  test("semDedup pairs equi-join on the cell key, never all-pairs") {
    val p = plan("q_emb_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "cell-scoped pair search must be an equi join on the cell id")
  }

  test("pqEncode is a zero-Exchange projection pass") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val (ex, _) = audited(graft.operators.EmbedCurate.pqEncode(
      e, "vec_id", "embedding", m = 8, ksub = 8))
    assert(ex.isEmpty, s"encoding must not shuffle, planned: $ex")
  }

  test("pqTopK broadcasts the query LUTs (intended compressed-domain linear scan)") {
    val p = plan("q_emb_pqadc")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    assert(!p.contains("CartesianProduct"), "query LUT side must broadcast")
  }

  test("IVF-PQ equi-joins inverted lists on the cell with the probe side broadcast") {
    import org.apache.spark.sql.functions._
    noAutoBroadcast {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val df = graft.operators.EmbedCurate.ivfPqTopK(
        e, e.filter(pmod(col("vec_id"), lit(100L)) === 0),
        "vec_id", "embedding", k = 3, nlist = 8, nprobe = 2, m = 8, ksub = 8)
      val (_, nodes) = audited(df)
      assert(nodes.exists(_.contains("BroadcastHashJoin")),
        s"probe side must be the explicit broadcast: $nodes")
      assert(!nodes.exists(n => n.contains("NestedLoop") || n.contains("Cartesian")),
        s"IVF-PQ must never plan all-pairs: $nodes")
    }
  }

  test("bm25 broadcasts query terms; the only nested-loop is the 1-row totals") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    noAutoBroadcast {
      val docs = spark.range(2000).select(col("id").as("doc_id"),
        concat(lit("w"), pmod(col("id"), lit(40L)), lit(" q w"),
          pmod(col("id") * 3L, lit(40L))).as("text"))
      val q = Seq((1L, "q"), (1L, "w5")).toDF("query_id", "term")
      val (_, nodes) = audited(graft.operators.TextAnalysis.bm25TopK(
        docs, "doc_id", "text", q, k = 5))
      assert(nodes.exists(_.contains("BroadcastHashJoin")),
        s"query terms must be the explicit broadcast: $nodes")
      assert(nodes.count(_.contains("BroadcastNestedLoopJoin")) <= 2,
        s"only the 1-row totals build + attach may nested-loop: $nodes")
      assert(!nodes.exists(_.contains("Cartesian")), nodes.mkString(","))
    }
  }
}
