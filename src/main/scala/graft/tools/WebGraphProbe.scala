package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{WebGraph, WebText}

/** Two-parallelism throughput probe for the web-graph family (the north
  * rule's N→4N scaling evidence, on the crawl-frontier axis): synthesizes
  * nPages Common-Crawl-shaped pages with HASH-MIXED hosts (xxhash64 — an
  * arithmetic host id would make per-host link counts a trivial cycle),
  * then times extractLinks → hostGraph → pageRank(3) and extractAnchors →
  * anchorStats and frontierSchedule end to end at each requested core
  * count (sequential sessions, the ScalingProbe discipline — NEVER two
  * timed Spark JVMs at once).
  *
  * Usage: runMain graft.tools.WebGraphProbe [nPages] [cores,cores,...]
  */
object WebGraphProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"webgraph-probe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def pages(s: SparkSession, n: Long): DataFrame = {
    val id = col("id")
    s.range(n).select(
      concat(lit("http://site"),
        pmod(xxhash64(id), lit(50000L)).cast("string"),
        lit(".example/p/"), id.cast("string")).as("url"),
      concat(
        lit("<a href=\"https://hub"),
        pmod(xxhash64(id, lit(1)), lit(2000L)).cast("string"),
        lit(".example/x\">hub link "),
        pmod(xxhash64(id, lit(2)), lit(40L)).cast("string"),
        lit("</a><a HREF=\"/local/"),
        pmod(id, lit(9L)).cast("string"),
        lit("\">local</a><a href=\"https://site"),
        pmod(xxhash64(id, lit(3)), lit(50000L)).cast("string"),
        lit(".example/q\">cross link</a>")).cast("binary").as("html"))
  }

  private def timed(name: String, cores: Int, n: Long)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = body
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"WGPROBE stage=$name cores=$cores n=$n sec=$sec%.2f rows=$rows " +
      f"pages_per_sec=${n / sec}%.0f")
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val coreList = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
                   else Seq(8, 32)
    for (cores <- coreList) {
      val s = session(cores)
      val p = pages(s, n)
      // warm-up: JIT + codegen caches on a small slice
      WebGraph.hostGraph(
        WebGraph.extractLinks(pages(s, 20000L), "url", "html"),
        "src_url", "dst_url").count()

      timed("links_hostgraph", cores, n) {
        WebGraph.hostGraph(WebGraph.extractLinks(p, "url", "html"),
          "src_url", "dst_url").count()
      }
      timed("pagerank3", cores, n) {
        WebGraph.pageRankFixedPoint(
          WebGraph.hostGraph(WebGraph.extractLinks(p, "url", "html"),
            "src_url", "dst_url"),
          "src_host", "dst_host", iters = 3)
          .agg(sum("rank")).collect()
        n
      }
      timed("anchorstats", cores, n) {
        WebGraph.anchorStats(WebGraph.extractAnchors(p, "url", "html"),
          "dst_url", "anchor").count()
      }
      timed("frontier", cores, n) {
        WebGraph.frontierSchedule(
          p.select(col("url"), pmod(xxhash64(col("url")), lit(1000L)).as("priority")),
          "url", "priority", slotsPerWave = 4)
          .agg(max("wave")).collect()
        n
      }
      timed("urldedup", cores, n) {
        WebText.urlDedup(
          p.select(col("url"),
            timestamp_seconds(lit(1767225600L) + xxhash64(col("url")) % 100000L)
              .as("warc_ts")),
          "url", "warc_ts").filter(col("kept")).count()
      }
      s.stop()
    }
  }
}
