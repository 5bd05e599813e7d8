package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.WebGraph

/** Plan-shape probe for the web-graph operators: extractLinks must be
  * shuffle-free (pure projection+explode), hostGraph exactly one Exchange
  * with a map-side partial aggregate under it, pageRank one Exchange pair
  * per iteration (join + agg) with no BroadcastNestedLoop anywhere.
  * Usage: runMain graft.tools.DriveWebGraph [nPages] */
object DriveWebGraph {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val pages = spark.range(n).select(
      concat(lit("http://site"), pmod(col("id"), lit(5000L)), lit(".example/p/"),
        col("id")).as("url"),
      concat(lit("<a href=\"https://hub"), pmod(col("id"), lit(997L)),
        lit(".example/x\">l</a><a href=\"/local/"), pmod(col("id"), lit(9L)),
        lit("\">r</a>")).cast("binary").as("html"))

    def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(count(lit(1))).collect()
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      println(s"== $name: exchanges=" + "Exchange".r.findAllIn(p).length +
        " bnl=" + "BroadcastNestedLoop".r.findAllIn(p).length +
        " wscg_spans=" + "WholeStageCodegen".r.findAllIn(p).length)
      p.split("\n").filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Aggregate") || l.contains("Generate")).take(24).foreach(println)
    }

    val links = WebGraph.extractLinks(pages, "url", "html")
    audit("extractLinks", links)
    val hg = WebGraph.hostGraph(links, "src_url", "dst_url")
    audit("hostGraph", hg)
    val pr = WebGraph.pageRankFixedPoint(hg, "src_host", "dst_host", iters = 3)
    audit("pageRank(3)", pr)
    println("TOP=" + pr.orderBy(col("rank").desc).limit(3).collect().mkString(" "))

    // session-4 operators: anchors shuffle-free; anchorStats bounded by
    // (host, anchor) vocabulary; hits 2 join+agg Exchange pairs/iteration;
    // crawlDelta window+groupBy sharing ONE url shuffle; invertedIndex df
    // branch served by ReuseExchange (no second token scan)
    audit("extractAnchors", WebGraph.extractAnchors(pages, "url", "html"))
    audit("anchorStats", WebGraph.anchorStats(
      WebGraph.extractAnchors(pages, "url", "html"), "dst_url", "anchor"))
    audit("hits(2)", WebGraph.hitsFixedPoint(hg, "src_host", "dst_host", iters = 2))
    val crawl = spark.range(n).select(
      concat(lit("http://s.example/p/"), pmod(col("id"), lit(50000L))).as("url"),
      timestamp_seconds(lit(1767225600L) + col("id") * 37L).as("warc_ts"),
      concat(lit("t"), pmod(col("id"), lit(3L))).as("text"))
    audit("crawlDelta", graft.operators.WebText.crawlDelta(crawl, "url", "warc_ts", "text"))
    val docs = spark.range(n / 10).select(col("id").as("doc_id"),
      concat(lit("w"), pmod(col("id"), lit(5000L)), lit(" w"),
        pmod(col("id") * 7L, lit(5000L)), lit(" the")).as("text"))
    audit("invertedIndex", graft.operators.TextAnalysis.invertedIndex(
      docs, "doc_id", "text", k = 3, dfCap = 500L))

    // session-5 operators: extractText shuffle-free projection;
    // weakComponents = CC propagation (Exchange count grows with rounds —
    // audit is the NO-BNL/no-cartesian assert); containmentPairs = one
    // shared-shingle equi-join + sizes from the CACHED shingle table (the
    // explode emits both directions without a self-union re-scan)
    audit("extractText", graft.operators.WebText.extractText(pages, "url", "html"))
    audit("weakComponents", WebGraph.weakComponents(hg, "src_host", "dst_host"))
    val cdocs = spark.range(n / 20).select(col("id").as("doc_id"),
      concat(lit("w"), pmod(col("id"), lit(400L)), lit(" w"),
        pmod(col("id") * 7L, lit(400L)), lit(" w"),
        pmod(col("id") * 11L, lit(400L)), lit(" w"),
        pmod(col("id") * 13L, lit(400L))).as("text"))
    audit("containmentPairs", graft.operators.Dedup.containmentPairs(
      cdocs, "doc_id", "text", n = 3, threshold = 0.5, maxDocFreq = 200L))

    // session-7 operators: packSequences — the corpus window must be
    // PARTITIONED (by bucket), never a global orderBy window, and the
    // bucket-base join a BroadcastHashJoin; hostBlocklist — blocklist side
    // broadcast, no BNL
    audit("packSequences", graft.operators.TextAnalysis.packSequences(
      docs, "doc_id", "text", seqLen = 512, bucketSize = 1000L))
    val bl = spark.range(200).select(
      concat(lit("spam"), col("id"), lit(".com")).as("domain"))
    audit("hostBlocklist", WebGraph.hostBlocklist(
      crawl, "url", bl, "domain"))

    // session-9 operators: parseWarc/parseSitemaps shuffle-free (UDF/array
    // exprs + explode only); trustRank same per-iteration Exchange pair as
    // pageRank with the seed table broadcast (no BNL); bigramSurprisal —
    // corpus scanned ONCE into the checkpointed inst table, model apertures
    // (pair/left counts) and the scoring join all read the materialization
    val warcs = spark.range(n / 10).select(
      concat(lit("f"), col("id")).as("url"),
      concat(lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://h"),
        pmod(col("id"), lit(997L)), lit(".example/p\r\nContent-Length: 6\r\n\r\nabcdef\r\n\r\n"))
        .cast("binary").as("blob"))
    audit("parseWarc", graft.sources.Warc.parseWarc(warcs, "url", "blob"))
    val maps = spark.range(n / 10).select(
      concat(lit("f"), col("id")).as("url"),
      concat(lit("<urlset><url><loc>http://h"), pmod(col("id"), lit(997L)),
        lit(".example/p</loc></url></urlset>")).cast("binary").as("xml"))
    audit("parseSitemaps", WebGraph.parseSitemaps(maps, "url", "xml"))
    val seeds = spark.range(40).select(concat(lit("hub"), col("id") * 25L,
      lit(".example")).as("host"))
    audit("trustRank(3)", WebGraph.trustRank(hg, "src_host", "dst_host",
      seeds, "host", iters = 3))
    audit("bigramSurprisal", graft.operators.TextAnalysis.bigramSurprisal(
      docs, "doc_id", "text"))
    // crawlChurn: rank window and pivot groupBy share the url hash
    // partitioning — expect ONE Exchange total
    val churnCrawls = spark.range(n / 10).select(
      concat(lit("http://s.example/p/"), pmod(col("id"), lit(20000L))).as("url"),
      col("id").as("ts"),
      concat(lit("head\nL"), pmod(col("id"), lit(7L)), lit("\ntail")).as("text"))
    audit("crawlChurn", graft.operators.WebText.crawlChurn(
      churnCrawls, "url", "ts", "text"))
    // mergeHostGraphs: one full-outer SMJ on the edge key; degreedist:
    // two degree aggs off the hostgraph + histogram-under-window quantiles
    audit("mergeHostGraphs", WebGraph.mergeHostGraphs(hg, hg))
    val outDeg = hg.groupBy(col("src_host").as("host"))
      .agg(sum("n_links").as("deg")).withColumn("dir", lit("out"))
    val inDeg = hg.groupBy(col("dst_host").as("host"))
      .agg(sum("n_links").as("deg")).withColumn("dir", lit("in"))
    audit("degreeQuantiles", graft.operators.WebText.valueQuantiles(
      outDeg.unionByName(inDeg), "dir", "deg", Seq(10, 50, 90, 99)))
    spark.stop()
  }
}
