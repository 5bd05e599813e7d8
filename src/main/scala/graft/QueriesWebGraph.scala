package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.WebGraph

/**
 * Web-graph gate entries (crawl-frontier side of a training-data pipeline):
 * href extraction, host-graph collapse, and the BIGINT fixed-point PageRank —
 * all on modular-arithmetic synthesis from `documents.doc_id` so DuckDB can
 * re-derive the inputs exactly. [[WebGraph.HrefPattern]] is shared VERBATIM
 * with the oracle SQL (the q_txt_pii precedent) — keep both in sync.
 */
object QueriesWebGraph {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Common-Crawl-style pages (url, html:binary). Variant classes:
    *  %6  → https scheme;      %5 → mixed-case host (lowercasing);
    *  %4  → explicit :8443 port (kept through root-relative resolution);
    *  %2  → a root-relative href (HREF uppercase — case-insensitive matcher);
    *  %7  → mailto/#fragment/relative hrefs (all dropped);
    *  %11 → a duplicated absolute href (link multiplicity preserved).
    * Reproduced verbatim in all three q_web_* oracles. */
  private def webCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      concat(
        when(pmod(col("doc_id"), lit(6L)) === 0, "https").otherwise("http"),
        lit("://"),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          concat(lit("Site"), pmod(col("doc_id"), lit(7L)).cast("string"),
            lit(".Example.ORG")))
          .otherwise(concat(lit("site"), pmod(col("doc_id"), lit(7L)).cast("string"),
            lit(".example.org"))),
        when(pmod(col("doc_id"), lit(4L)) === 0, ":8443").otherwise(""),
        lit("/p/"), pmod(col("doc_id"), lit(20L)).cast("string")).as("url"),
      concat(
        lit("<html><a href=\"https://Hub"), pmod(col("doc_id"), lit(3L)).cast("string"),
        lit(".example.org/x\">l</a>"),
        when(pmod(col("doc_id"), lit(2L)) === 0,
          concat(lit("<a HREF=\"/local/"), pmod(col("doc_id"), lit(9L)).cast("string"),
            lit("\">r</a>"))).otherwise(""),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          "<a href=\"mailto:x@y\">m</a><a href=\"#top\">f</a><a href=\"rel/p\">rel</a>")
          .otherwise(""),
        when(pmod(col("doc_id"), lit(11L)) === 0,
          concat(lit("<a href=\"https://Hub"), pmod(col("doc_id"), lit(3L)).cast("string"),
            lit(".example.org/x\">dup</a>"))).otherwise(""),
        lit("</html>")).cast("binary").as("html"))

  /** Directed host edges straight from doc_id: src ∈ h0..h96, dst ∈ h0..h100
    * — hosts h97..h100 have no out-edges (dangling-mass leak exercised);
    * accidental self-loops are real input (pageRank does not drop them). */
  private def edgeCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("h"), pmod(col("doc_id"), lit(97L)).cast("string")).as("src_host"),
      concat(lit("h"), pmod(col("doc_id") * 5L + 3L, lit(101L)).cast("string"))
        .as("dst_host"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_web_links" -> ((s, dir) =>
      WebGraph.extractLinks(webCorpus(s, dir), "url", "html")),

    "q_web_hostgraph" -> ((s, dir) =>
      WebGraph.hostGraph(
        WebGraph.extractLinks(webCorpus(s, dir), "url", "html"),
        "src_url", "dst_url")),

    // `rank` aliased to pr: DuckDB reserves RANK in more positions than Spark
    "q_web_pagerank" -> ((s, dir) =>
      WebGraph.pageRankFixedPoint(edgeCorpus(s, dir), "src_host", "dst_host",
        iters = 3)
        .select(col("host"), col("rank").as("pr"))))

  /** The url/html CASE ladder mirrors webCorpus; the href matcher is
    * [[WebGraph.HrefPattern]] verbatim (RE2-subset, inline (?i) works in
    * both engines); host/scheme regexes mirror extractLinks/hostOf.
    * MARGIN-BEARING fragment — stripMargin happens ONCE in the consumer
    * (stripping an already-stripped fragment re-eats the first `|` of
    * every `||` concat). */
  private val oraclePages: String =
    """SELECT doc_id,
      |  (CASE WHEN doc_id % 6 = 0 THEN 'https' ELSE 'http' END) || '://'
      |  || (CASE WHEN doc_id % 5 = 0
      |       THEN 'Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.ORG'
      |       ELSE 'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' END)
      |  || (CASE WHEN doc_id % 4 = 0 THEN ':8443' ELSE '' END)
      |  || '/p/' || CAST(doc_id % 20 AS VARCHAR) AS url,
      |  '<html><a href="https://Hub' || CAST(doc_id % 3 AS VARCHAR)
      |  || '.example.org/x">l</a>'
      |  || (CASE WHEN doc_id % 2 = 0
      |       THEN '<a HREF="/local/' || CAST(doc_id % 9 AS VARCHAR) || '">r</a>'
      |       ELSE '' END)
      |  || (CASE WHEN doc_id % 7 = 0
      |       THEN '<a href="mailto:x@y">m</a><a href="#top">f</a><a href="rel/p">rel</a>'
      |       ELSE '' END)
      |  || (CASE WHEN doc_id % 11 = 0
      |       THEN '<a href="https://Hub' || CAST(doc_id % 3 AS VARCHAR)
      |            || '.example.org/x">dup</a>'
      |       ELSE '' END)
      |  || '</html>' AS html FROM documents"""

  /** Margin-bearing for the same reason as [[oraclePages]]. */
  private val oracleLinks: String =
    s"""WITH p AS ($oraclePages),
      |x AS (SELECT url,
      |  LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |  LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
      |  UNNEST(REGEXP_EXTRACT_ALL(html, '(?i)href="([^"]*)"', 1)) AS href FROM p)
      |SELECT src_url, dst_url FROM (
      |  SELECT url AS src_url,
      |    CASE WHEN REGEXP_MATCHES(href, '^[Hh][Tt][Tt][Pp][Ss]?://') THEN href
      |         WHEN href LIKE '/%' AND scheme <> ''
      |           THEN scheme || '://' || hostport || href
      |    END AS dst_url
      |  FROM x) WHERE dst_url IS NOT NULL"""

  val oracle: Map[String, String] = Map(
    "q_web_links" -> oracleLinks.stripMargin,

    "q_web_hostgraph" ->
      s"""WITH links AS ($oracleLinks)
        |SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links FROM (
        |  SELECT
        |    LOWER(REGEXP_EXTRACT(src_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS src_host,
        |    LOWER(REGEXP_EXTRACT(dst_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS dst_host
        |  FROM links)
        |WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
        |GROUP BY src_host, dst_host""".stripMargin,

    // 3 unrolled synchronous iterations; `//` is DuckDB BIGINT floor division
    // = Spark `div` on the same non-negative Longs → bit-identical ranks.
    // base = ((100-85)*1000000)//100 = 150000.
    "q_web_pagerank" ->
      """WITH e AS (SELECT DISTINCT
        |    'h' || CAST(doc_id % 97 AS VARCHAR) AS src,
        |    'h' || CAST((doc_id * 5 + 3) % 101 AS VARCHAR) AS dst FROM documents),
        |nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
        |outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM e GROUP BY src),
        |r0 AS (SELECT host, CAST(1000000 AS BIGINT) AS pr FROM nodes),
        |i1 AS (SELECT e.dst AS host, SUM(r0.pr // o.odeg) AS inc
        |       FROM e JOIN r0 ON r0.host = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.host,
        |       CAST(150000 + (85 * COALESCE(i1.inc, 0)) // 100 AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN i1 USING (host)),
        |i2 AS (SELECT e.dst AS host, SUM(r1.pr // o.odeg) AS inc
        |       FROM e JOIN r1 ON r1.host = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.host,
        |       CAST(150000 + (85 * COALESCE(i2.inc, 0)) // 100 AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN i2 USING (host)),
        |i3 AS (SELECT e.dst AS host, SUM(r2.pr // o.odeg) AS inc
        |       FROM e JOIN r2 ON r2.host = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.host,
        |       CAST(150000 + (85 * COALESCE(i3.inc, 0)) // 100 AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN i3 USING (host))
        |SELECT host, pr FROM r3""".stripMargin)
}
