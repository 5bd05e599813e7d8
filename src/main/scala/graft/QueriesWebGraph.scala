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
    *  %11 → a duplicated absolute href (link multiplicity preserved);
    *  %13 → a whitespace-only anchor body (trims to '' — link mass but not
    *        anchor vocabulary in anchorStats).
    * Reproduced verbatim in all the q_web_* oracles. */
  private[graft] def webCorpus(s: SparkSession, dir: String): DataFrame =
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
        when(pmod(col("doc_id"), lit(13L)) === 0,
          "<a href=\"https://blank.example.org/b\">  </a>").otherwise(""),
        lit("</html>")).cast("binary").as("html"))

  /** Directed host edges straight from doc_id: src ∈ h0..h96, dst ∈ h0..h100
    * — hosts h97..h100 have no out-edges (dangling-mass leak exercised);
    * accidental self-loops are real input (pageRank does not drop them). */
  private def edgeCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("h"), pmod(col("doc_id"), lit(97L)).cast("string")).as("src_host"),
      concat(lit("h"), pmod(col("doc_id") * 5L + 3L, lit(101L)).cast("string"))
        .as("dst_host"))

  /** Host edges with 10 DISJOINT components by construction (the c<k>
    * prefix partitions the node space); inside a component, nodes n0..n22
    * and modular edges (doc_id*3 %23 → doc_id*5+1 %23) give irregular
    * structure — some prefixes connect fully, sparse ones fragment into
    * real sub-components, and accidental self-loops exist. The oracle
    * computes ground truth by recursive reachability, so the exact shape
    * is irrelevant — only that both engines see the same edges. */
  private def componentEdges(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("c"), pmod(col("doc_id"), lit(10L)).cast("string"), lit("n"),
        pmod(col("doc_id") * 3L, lit(23L)).cast("string")).as("src_host"),
      concat(lit("c"), pmod(col("doc_id"), lit(10L)).cast("string"), lit("n"),
        pmod(col("doc_id") * 5L + 1L, lit(23L)).cast("string")).as("dst_host"))

  /** robots.txt bodies for hosts h0..h9.example — shared by q_web_robots
    * and q_web_crawlpipe; classes documented at the q_web_robots entry. */
  private def robotsCorpus(s: SparkSession, dir: String): DataFrame = {
    val h = docs(s, dir).select(pmod(col("doc_id"), lit(10L)).as("h")).distinct()
    h.select(
      concat(lit("h"), col("h").cast("string"), lit(".example")).as("host"),
      concat(
        when(pmod(col("h"), lit(3L)) === 0,
          "User-agent: bot\nDisallow: /\nCrawl-delay: 99\n")
          .otherwise(""),
        when(pmod(col("h"), lit(5L)) === 0, "User-agent: a\n").otherwise(""),
        lit("User-agent: *\nDisallow: /private\n"),
        when(pmod(col("h"), lit(2L)) === 0, "Allow: /private/ok\n").otherwise(""),
        when(pmod(col("h"), lit(2L)) === 1,
          concat(lit("Crawl-delay: "), (col("h") + 1).cast("string"), lit("\n")))
          .otherwise(""),
        when(pmod(col("h"), lit(7L)) === 0, "crawl-delay: fast\n").otherwise(""),
        when(pmod(col("h"), lit(4L)) === 0, "Disallow:\n# note\n").otherwise(""))
        .as("body"))
  }

  /** UT1-style blocklist: ads<k>.example.org on k%3==0, spam<k>.com
    * otherwise (k=1 mixed-case — the operator lowercases), PLUS
    * www.spam2.com so one host matches two domains (longest wins). */
  private def blockCorpus(s: SparkSession, dir: String): DataFrame = {
    val ks = docs(s, dir)
      .select(pmod(col("doc_id"), lit(10L)).as("k")).distinct()
    ks.select(
      when(pmod(col("k"), lit(3L)) === 0,
        concat(lit("ads"), col("k").cast("string"), lit(".example.org")))
        .when(col("k") === 1, "Spam1.Com")
        .otherwise(concat(lit("spam"), col("k").cast("string"), lit(".com")))
        .as("domain"))
      .unionByName(ks.filter(col("k") === 2)
        .select(lit("www.spam2.com").as("domain")))
  }

  /** frontier for hostBlocklist — CASE order is semantic (%13 before %7
    * before %5 before %11 before %17), mirrored in the oracle: unparseable
    * pass-through, www-subdomain under a spam domain (blocked only when
    * k%3!=0 — on k%3==0 the blocklist holds ads<k>, not spam<k>), exact
    * host, deep subdomain under ads<k>, and the contains-but-NOT-suffix
    * trap spam<k>.com.evil.net (must pass: label-boundary matching). */
  private def blockFrontier(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      when(pmod(col("doc_id"), lit(13L)) === 0,
        concat(lit("not a url "), col("doc_id").cast("string")))
        .when(pmod(col("doc_id"), lit(7L)) === 0,
          concat(lit("http://www.spam"), pmod(col("doc_id"), lit(10L)).cast("string"),
            lit(".com/p/"), col("doc_id").cast("string")))
        .when(pmod(col("doc_id"), lit(5L)) === 0,
          concat(lit("https://spam"), pmod(col("doc_id"), lit(10L)).cast("string"),
            lit(".com/x")))
        .when(pmod(col("doc_id"), lit(11L)) === 0,
          concat(lit("http://sub.ads"), pmod(col("doc_id"), lit(10L)).cast("string"),
            lit(".example.org/y")))
        .when(pmod(col("doc_id"), lit(17L)) === 0,
          concat(lit("http://spam"), pmod(col("doc_id"), lit(10L)).cast("string"),
            lit(".com.evil.net/z")))
        .otherwise(concat(lit("http://ok"), pmod(col("doc_id"), lit(20L)).cast("string"),
          lit(".net/p/"), col("doc_id").cast("string"))).as("url"))

  /** sitemap-xml corpus: two url entries per page (whitespace-padded loc on
    * %2 — the trim class; lastmod on %3), a sitemapindex child on %4, a
    * loc-less structural entry on %5 (dropped), a comment-wrapped FAKE
    * entry on %7 (must vanish with the comment), a CDATA-wrapped loc on
    * %11 (generator convention — the wrapper must strip, not drop the
    * entry). Reproduced verbatim in the q_web_sitemap oracle. */
  private def sitemapCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("http://s"), pmod(col("doc_id"), lit(100L)).cast("string"),
        lit(".example/sitemap"), col("doc_id").cast("string"), lit(".xml")).as("url"),
      concat(
        lit("<?xml version=\"1.0\"?><urlset>"),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          "<!--<url><loc>http://fake.example/x</loc></url>-->").otherwise(""),
        lit("<url><loc>"),
        when(pmod(col("doc_id"), lit(2L)) === 0, " ").otherwise(""),
        lit("http://s"), pmod(col("doc_id"), lit(100L)).cast("string"),
        lit(".example/page/"), pmod(col("doc_id"), lit(10L)).cast("string"),
        when(pmod(col("doc_id"), lit(2L)) === 0, " ").otherwise(""),
        lit("</loc>"),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          concat(lit("<lastmod>2026-01-0"),
            (pmod(col("doc_id"), lit(9L)) + 1).cast("string"),
            lit("</lastmod>"))).otherwise(""),
        lit("</url>"),
        lit("<url><loc>"),
        when(pmod(col("doc_id"), lit(11L)) === 0, "<![CDATA[").otherwise(""),
        lit("http://s"), pmod(col("doc_id"), lit(100L)).cast("string"),
        lit(".example/page/"), (pmod(col("doc_id"), lit(10L)) + 1).cast("string"),
        when(pmod(col("doc_id"), lit(11L)) === 0, "]]>").otherwise(""),
        lit("</loc></url>"),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          "<url><priority>0.5</priority></url>").otherwise(""),
        when(pmod(col("doc_id"), lit(4L)) === 0,
          concat(lit("<sitemap><loc>http://s"),
            pmod(col("doc_id"), lit(100L)).cast("string"),
            lit(".example/sitemap-child.xml</loc></sitemap>"))).otherwise(""),
        lit("</urlset>")).cast("binary").as("xml"))

  /** WARC archive corpus: one blob per doc, [warcinfo on %5] + response +
    * [request on %3], with the traps the Content-Length walk must survive:
    *  %7  → `\r\nWARC/1.0\r\n\r\n` INSIDE the response payload (split-on-
    *        magic parsers shear here);
    *  %2  → lowercase `content-length:`/`warc-type:` header names;
    *  %9  → request record without a WARC-Date header;
    *  %11 → an extra WARC-Record-ID header (ignored);
    *  %13 → single-CRLF record separator after the response (tolerated);
    *  %17 → trailing truncated record (magic + partial header, no blank
    *        line) — the walk stops, keeping everything before it.
    * The oracle NEVER parses: it predicts the records in closed form from
    * the same modular classes. */
  private def warcCorpus(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def m(k: Long) = pmod(id, lit(k))
    val uri = concat(lit("http://w"), m(50).cast("string"),
      lit(".example/p/"), m(20).cast("string"))
    val dt = concat(lit("2026-01-0"), (m(9) + 1).cast("string"), lit("T00:00:00Z"))
    val respPayload = concat(lit("<html>"),
      when(m(7) === 0, "\r\nWARC/1.0\r\n\r\n").otherwise(""),
      lit("<a href=\"/p/"), m(10).cast("string"), lit("\">x</a>"))
    val reqPayload = concat(lit("GET /p/"), m(10).cast("string"), lit(" HTTP/1.1"))
    val infoPayload = concat(lit("software: graftbot "), m(9).cast("string"))
    val clenName = when(m(2) === 0, "content-length: ").otherwise("Content-Length: ")
    val typeName = when(m(2) === 0, "warc-type: ").otherwise("WARC-Type: ")
    val infoRec = concat(lit("WARC/1.0\r\n"), typeName, lit("warcinfo\r\n"),
      lit("WARC-Date: "), dt, lit("\r\n"),
      clenName, length(infoPayload).cast("string"), lit("\r\n\r\n"),
      infoPayload, lit("\r\n\r\n"))
    val respRec = concat(lit("WARC/1.0\r\n"), typeName, lit("response\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit("WARC-Date: "), dt, lit("\r\n"),
      when(m(11) === 0, concat(lit("WARC-Record-ID: <urn:uuid:"),
        id.cast("string"), lit(">\r\n"))).otherwise(""),
      clenName, length(respPayload).cast("string"), lit("\r\n\r\n"),
      respPayload,
      when(m(13) === 0, "\r\n").otherwise("\r\n\r\n"))
    val reqRec = concat(lit("WARC/1.0\r\n"), typeName, lit("request\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      when(m(9) === 0, "").otherwise(concat(lit("WARC-Date: "), dt, lit("\r\n"))),
      clenName, length(reqPayload).cast("string"), lit("\r\n\r\n"),
      reqPayload, lit("\r\n\r\n"))
    docs(s, dir).select(
      concat(lit("http://w"), m(50).cast("string"), lit(".example/archive/"),
        id.cast("string"), lit(".warc")).as("url"),
      concat(
        when(m(5) === 0, infoRec).otherwise(""),
        respRec,
        when(m(3) === 0, reqRec).otherwise(""),
        when(m(17) === 0, "WARC/1.0\r\nWARC-Type: resp").otherwise(""))
        .cast("binary").as("blob"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_web_warc" -> ((s, dir) =>
      graft.sources.Warc.parseWarc(warcCorpus(s, dir), "url", "blob")
        .select(col("warc_file"), col("rec_ord"), col("record_type"),
          col("target_uri"), col("warc_date"), col("payload_len"),
          col("payload").cast("string").as("payload_str"))),

    // THE INGEST COMPOSITION — the north rule's "byte-identical extracted
    // text per url" invariant evidenced FROM ARCHIVE BYTES: WARC walk →
    // response payloads as pages → the production extractText. Oracle =
    // closed-form response html fed through the shared 9-stage chain.
    "q_web_ingestpipe" -> ((s, dir) => {
      val pages = graft.sources.Warc.parseWarc(warcCorpus(s, dir), "url", "blob")
        .filter(col("record_type") === "response")
        .select(col("target_uri").as("url"), col("payload").as("html"))
      graft.operators.WebText.extractText(pages, "url", "html")
    }),

    "q_web_sitemap" -> ((s, dir) =>
      WebGraph.parseSitemaps(sitemapCorpus(s, dir), "url", "xml")),

    // sitemap-driven recrawl triage: the REAL parser output joined against
    // a crawl store whose coverage (j = doc%7 < the sitemap's j 0..10) and
    // dates make all three statuses occur; the oracle is closed-form
    "q_web_recrawl" -> ((s, dir) => {
      val entries = WebGraph.parseSitemaps(sitemapCorpus(s, dir), "url", "xml")
      val crawled = docs(s, dir).select(
        concat(lit("http://s"), pmod(col("doc_id"), lit(100L)).cast("string"),
          lit(".example/page/"), pmod(col("doc_id"), lit(7L)).cast("string"))
          .as("url"),
        concat(lit("2026-01-0"),
          (pmod(pmod(col("doc_id"), lit(100L)) + pmod(col("doc_id"), lit(7L)),
            lit(9L)) + 1).cast("string")).as("crawl_date"))
      WebGraph.sitemapRecrawl(entries, crawled, "url", "crawl_date")
    }),

    // THE DISCOVERY LEG of the crawl loop (complements q_web_crawlpipe's
    // recrawl leg): links extracted from the current crawl, canonicalized,
    // minus already-crawled canonical urls (anti join), minus blocklisted
    // hosts, scheduled into politeness waves. Priority is the portable
    // LENGTH*7 % 100 function of the url.
    "q_web_discover" -> ((s, dir) => {
      import s.implicits._
      val pages = webCorpus(s, dir)
      val cand = WebGraph.extractLinks(pages, "url", "html")
        .select(graft.operators.WebText.canonicalUrl(col("dst_url")).as("url"))
        .distinct()
      val seen = pages
        .select(graft.operators.WebText.canonicalUrl(col("url")).as("url"))
        .distinct()
      val fresh = cand.join(seen, Seq("url"), "left_anti")
      val ok = WebGraph.hostBlocklist(fresh, "url",
        Seq("hub1.example.org", "blank.example.org").toDF("domain"), "domain")
        .filter(!col("blocked")).select("url")
      WebGraph.frontierSchedule(
        ok.withColumn("priority", pmod(length(col("url")) * 7, lit(100))),
        "url", "priority", slotsPerWave = 3)
        .select("url", "host", "host_rank", "wave")
    }),

    "q_web_components" -> ((s, dir) =>
      WebGraph.weakComponents(componentEdges(s, dir), "src_host", "dst_host")),

    "q_web_blocklist" -> ((s, dir) =>
      WebGraph.hostBlocklist(blockFrontier(s, dir), "url",
        blockCorpus(s, dir), "domain")),

    // THE CRAWL-SIDE COMPOSITION (the dedupPipeline idea on the frontier
    // axis): canonicalUrl → latest-crawl-wins urlDedup → robots compliance
    // on the canonical form → politeness waves. Fixture classes: %5
    // mixed-case host + fragment, %4 default :80 port (canon drops it),
    // %3/%7/%11 path classes over doc_id%40 page slots (real re-crawls per
    // canonical url), 3 query-param spellings folding to one. Priority is
    // an engine-portable function of the canonical url (LENGTH*7 % 100).
    "q_web_crawlpipe" -> ((s, dir) => {
      val pages = docs(s, dir).select(
        concat(
          lit("http://"),
          when(pmod(col("doc_id"), lit(5L)) === 0,
            concat(lit("H"), pmod(col("doc_id"), lit(10L)).cast("string"),
              lit(".Example")))
            .otherwise(concat(lit("h"), pmod(col("doc_id"), lit(10L)).cast("string"),
              lit(".example"))),
          when(pmod(col("doc_id"), lit(4L)) === 0, ":80").otherwise(""),
          when(pmod(col("doc_id"), lit(11L)) === 0, "")
            .when(pmod(col("doc_id"), lit(3L)) === 0,
              concat(lit("/private/ok/"), pmod(col("doc_id"), lit(40L)).cast("string")))
            .when(pmod(col("doc_id"), lit(7L)) === 0,
              concat(lit("/private/"), pmod(col("doc_id"), lit(40L)).cast("string")))
            .otherwise(concat(lit("/pub/"), pmod(col("doc_id"), lit(40L)).cast("string"))),
          when(pmod(col("doc_id"), lit(3L)) === 0, "?utm_source=x&b=2&a=1")
            .when(pmod(col("doc_id"), lit(3L)) === 1, "?a=1&b=2")
            .otherwise("?b=2&a=1"),
          when(pmod(col("doc_id"), lit(5L)) === 0, "#frag").otherwise("")).as("url"),
        timestamp_seconds(lit(1767225600L) + col("doc_id") * lit(37L)).as("warc_ts"))
      val kept = graft.operators.WebText.urlDedup(pages, "url", "warc_ts")
        .filter(col("kept")).select(col("canon_url").as("url"))
      val decided = WebGraph.robotsFilter(kept, "url",
        WebGraph.parseRobots(robotsCorpus(s, dir), "host", "body"))
      WebGraph.frontierSchedule(
        decided.filter(col("robots_allowed"))
          .select(col("url"), (length(col("url")) * 7 % 100).as("priority")),
        "url", "priority", slotsPerWave = 3)
        .select("url", "host", "host_rank", "wave")
    }),

    // 10 hosts with modular robots.txt classes (%3 a specific-agent group
    // first, %5 a stacked UA run, %2 a longer Allow carve-out, %4 an empty
    // Disallow + comment line) against a 4-class frontier (%11 no path →
    // '/', %3 the allowed carve-out, %7 the disallowed subtree, else /pub).
    // CASE order matters and is mirrored in the oracle verbatim.
    "q_web_robots" -> ((s, dir) => {
      val robots = robotsCorpus(s, dir)
      val frontier = docs(s, dir).select(
        concat(lit("http://h"), pmod(col("doc_id"), lit(10L)).cast("string"),
          lit(".example"),
          when(pmod(col("doc_id"), lit(11L)) === 0, "")
            .when(pmod(col("doc_id"), lit(3L)) === 0,
              concat(lit("/private/ok/"), col("doc_id").cast("string")))
            .when(pmod(col("doc_id"), lit(7L)) === 0,
              concat(lit("/private/"), col("doc_id").cast("string")))
            .otherwise(concat(lit("/pub/"), col("doc_id").cast("string")))).as("url"))
        .distinct()
      WebGraph.robotsFilter(frontier, "url",
        WebGraph.parseRobots(robots, "host", "body"))
    }),

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
        .select(col("host"), col("rank").as("pr"))),

    // Crawl-delay extraction: %2==1 hosts carry a *-group delay h+1; the
    // bot-group 99 (%3==0) and the non-numeric 'fast' (%7==0) must NOT
    // surface
    "q_web_crawldelay" -> ((s, dir) =>
      WebGraph.crawlDelays(robotsCorpus(s, dir), "host", "body")),

    // host degree distribution (out- and in-link mass quantiles — the
    // power-law profile a crawl planner budgets against), composing
    // hostGraph with the nearest-rank quantile operator
    "q_web_degreedist" -> ((s, dir) => {
      val hg = WebGraph.hostGraph(
        WebGraph.extractLinks(webCorpus(s, dir), "url", "html"),
        "src_url", "dst_url")
      val out = hg.groupBy(col("src_host").as("host"))
        .agg(sum("n_links").as("deg")).withColumn("dir", lit("out"))
      val in = hg.groupBy(col("dst_host").as("host"))
        .agg(sum("n_links").as("deg")).withColumn("dir", lit("in"))
      graft.operators.WebText.valueQuantiles(
        out.unionByName(in), "dir", "deg", Seq(10, 50, 90, 99))
    }),

    // incremental maintenance: the corpus split %2 into two crawl batches,
    // each collapsed independently, merged — the oracle is the FULL-corpus
    // host graph (q_web_hostgraph's SQL verbatim), so the entry hashes the
    // convergence property itself
    "q_web_hostmerge" -> ((s, dir) => {
      val pages = webCorpus(s, dir)
      def half(k: Long) = WebGraph.hostGraph(
        WebGraph.extractLinks(
          pages.filter(pmod(col("doc_id"), lit(2L)) === k), "url", "html"),
        "src_url", "dst_url")
      WebGraph.mergeHostGraphs(half(0L), half(1L))
    }),

    // seeds = every 10th host id; h100 is dangling-dst-only, h10.. are mid
    // graph, so trust 0 / seed-only / propagated cases all occur
    "q_web_trustrank" -> ((s, dir) => {
      import s.implicits._
      WebGraph.trustRank(edgeCorpus(s, dir), "src_host", "dst_host",
        Seq.range(0, 101, 10).map(k => s"h$k").toDF("host"), "host",
        iters = 3)
    }),

    "q_web_anchors" -> ((s, dir) =>
      WebGraph.extractAnchors(webCorpus(s, dir), "url", "html")),

    "q_web_anchorstats" -> ((s, dir) =>
      WebGraph.anchorStats(
        WebGraph.extractAnchors(webCorpus(s, dir), "url", "html"),
        "dst_url", "anchor")),

    "q_web_hits" -> ((s, dir) =>
      WebGraph.hitsFixedPoint(edgeCorpus(s, dir), "src_host", "dst_host",
        iters = 2)),

    // 11 hosts (~45 urls each at 500 docs), cycling priorities so ties are
    // real (url ASC tiebreak pinned); %13 unparseable urls bucket to host ''
    "q_web_frontier" -> ((s, dir) =>
      WebGraph.frontierSchedule(
        docs(s, dir).select(
          when(pmod(col("doc_id"), lit(13L)) === 0,
            concat(lit("not a url "), col("doc_id").cast("string")))
            .otherwise(concat(lit("http://host"),
              pmod(col("doc_id"), lit(11L)).cast("string"),
              lit(".example/p/"), col("doc_id").cast("string"))).as("url"),
          pmod(col("doc_id") * 7L, lit(1000L)).as("priority")),
        "url", "priority", slotsPerWave = 4)
        .select("url", "host", "host_rank", "wave")))

  /** The url/html CASE ladder mirrors webCorpus; the href matcher is
    * [[WebGraph.HrefPattern]] verbatim (RE2-subset, inline (?i) works in
    * both engines); host/scheme regexes mirror extractLinks/hostOf.
    * MARGIN-BEARING fragment — stripMargin happens ONCE in the consumer
    * (stripping an already-stripped fragment re-eats the first `|` of
    * every `||` concat). */
  private[graft] val oraclePages: String =
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
      |  || (CASE WHEN doc_id % 13 = 0
      |       THEN '<a href="https://blank.example.org/b">  </a>'
      |       ELSE '' END)
      |  || '</html>' AS html FROM documents"""

  /** Margin-bearing for the same reason as [[oraclePages]]. */
  private[graft] val oracleLinks: String =
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

  /** Anchor extraction: whole `<a>` elements first (group 0), then group
    * 1/2 per element — [[WebGraph.AnchorPattern]] verbatim. Margin-bearing
    * like [[oraclePages]]. */
  private val oracleAnchors: String =
    s"""WITH p AS ($oraclePages),
      |x AS (SELECT url,
      |  LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |  LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
      |  UNNEST(REGEXP_EXTRACT_ALL(html, '(?i)<a\\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 0)) AS a
      |  FROM p),
      |y AS (SELECT url, scheme, hostport,
      |  REGEXP_EXTRACT(a, '(?i)<a\\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 1) AS href,
      |  TRIM(REGEXP_EXTRACT(a, '(?i)<a\\s[^>]*href="([^"]*)"[^>]*>([^<]*)</a>', 2)) AS anchor
      |  FROM x)
      |SELECT src_url, dst_url, anchor FROM (
      |  SELECT url AS src_url,
      |    CASE WHEN REGEXP_MATCHES(href, '^[Hh][Tt][Tt][Pp][Ss]?://') THEN href
      |         WHEN href LIKE '/%' AND scheme <> ''
      |           THEN scheme || '://' || hostport || href
      |    END AS dst_url, anchor
      |  FROM y) WHERE dst_url IS NOT NULL"""

  /** robots.txt parse as a CTE chain `hs…rules` mirroring
    * [[WebGraph.parseRobots]] (comment strip → UA-run groups via
    * lag + running sum → *-groups' non-empty Allow/Disallow). MARGIN-BEARING
    * fragment composed by PLAIN-STRING concatenation (never s-interpolation:
    * the patterns carry `$`); strip once at the final consumer. Shared by
    * q_web_robots and q_web_crawlpipe. */
  private val oracleRobotsRules: String =
    """hs AS (SELECT DISTINCT doc_id % 10 AS h FROM documents),
      |bod AS (SELECT 'h' || CAST(h AS VARCHAR) || '.example' AS host,
      |    (CASE WHEN h % 3 = 0
      |       THEN 'User-agent: bot' || chr(10) || 'Disallow: /' || chr(10)
      |            || 'Crawl-delay: 99' || chr(10)
      |       ELSE '' END)
      |    || (CASE WHEN h % 5 = 0 THEN 'User-agent: a' || chr(10) ELSE '' END)
      |    || 'User-agent: *' || chr(10) || 'Disallow: /private' || chr(10)
      |    || (CASE WHEN h % 2 = 0 THEN 'Allow: /private/ok' || chr(10) ELSE '' END)
      |    || (CASE WHEN h % 2 = 1
      |          THEN 'Crawl-delay: ' || CAST(h + 1 AS VARCHAR) || chr(10) ELSE '' END)
      |    || (CASE WHEN h % 7 = 0 THEN 'crawl-delay: fast' || chr(10) ELSE '' END)
      |    || (CASE WHEN h % 4 = 0 THEN 'Disallow:' || chr(10) || '# note' || chr(10) ELSE '' END)
      |    AS body FROM hs),
      |l0 AS (SELECT host, i AS pos,
      |    TRIM(REGEXP_REPLACE(ls[i], '#.*', '')) AS line
      |  FROM (SELECT host, STRING_SPLIT(body, chr(10)) AS ls FROM bod),
      |       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ls))) AS i) t),
      |tg AS (SELECT host, pos, line,
      |    REGEXP_MATCHES(LOWER(line), '^user-agent:') AS is_ua FROM l0),
      |tg2 AS (SELECT *, is_ua AND NOT COALESCE(
      |    LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), FALSE) AS ua_start
      |  FROM tg),
      |tg3 AS (SELECT *, SUM(CASE WHEN ua_start THEN 1 ELSE 0 END)
      |    OVER (PARTITION BY host ORDER BY pos) AS grp FROM tg2),
      |star AS (SELECT DISTINCT host, grp FROM tg3 WHERE is_ua
      |  AND TRIM(REGEXP_EXTRACT(line, '(?i)^user-agent:(.*)$', 1)) = '*'),
      |rules AS (SELECT t.host,
      |    LOWER(REGEXP_EXTRACT(t.line, '(?i)^(allow|disallow):.*$', 1)) = 'allow' AS allow,
      |    TRIM(REGEXP_EXTRACT(t.line, '(?i)^(allow|disallow):(.*)$', 2)) AS prefix
      |  FROM tg3 t JOIN star USING (host, grp)
      |  WHERE LOWER(REGEXP_EXTRACT(t.line, '(?i)^(allow|disallow):.*$', 1)) <> ''
      |    AND TRIM(REGEXP_EXTRACT(t.line, '(?i)^(allow|disallow):(.*)$', 2)) <> '')"""

  /** canonicalization CTEs for a one-column relation `$in(url)` →
    * `$out(url)` (DISTINCT canonical forms) — the crawlpipe transcription
    * of WebText.canonicalUrl, parameterized. Margin-bearing; every input
    * here parses (extractLinks emits absolute urls only), so the
    * unparseable-passthrough branch is not transcribed. The COALESCE on
    * params is load-bearing: DuckDB's ARRAY_TO_STRING of an EMPTY list is
    * NULL (Spark's array_join is ''), so a param-less url would NULL out
    * the whole concat. */
  private def oracleCanon(in: String, out: String): String =
    s"""cx$out AS (SELECT url,
      |  LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |  REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
      |  REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
      |  REGEXP_EXTRACT(url, '^[^?#]*\\?([^#]*)', 1) AS q FROM $in),
      |cy$out AS (SELECT url, scheme,
      |  LOWER(REGEXP_EXTRACT(hostport, '^([^:]*)', 1)) AS host,
      |  REGEXP_EXTRACT(hostport, ':([0-9]+)$$', 1) AS port,
      |  CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path,
      |  COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(STRING_SPLIT(q, '&'),
      |    x -> LEN(x) > 0 AND NOT REGEXP_MATCHES(x,
      |      '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)='))), '&'), '') AS params
      |  FROM cx$out),
      |$out AS (SELECT DISTINCT
      |  scheme || '://' || host
      |  || (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
      |           AND NOT (scheme = 'https' AND port = '443')
      |      THEN ':' || port ELSE '' END)
      |  || path || (CASE WHEN params = '' THEN '' ELSE '?' || params END) AS url
      |  FROM cy$out)"""

  /** host-graph collapse over a `links(src_url, dst_url)` CTE —
    * margin-bearing body shared by three oracles (strip once at the
    * consumer). */
  private[graft] def oracleHostGraphBody: String =
    """SELECT src_host, dst_host, CAST(COUNT(*) AS BIGINT) AS n_links FROM (
      |  SELECT
      |    LOWER(REGEXP_EXTRACT(src_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS src_host,
      |    LOWER(REGEXP_EXTRACT(dst_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS dst_host
      |  FROM links)
      |WHERE src_host <> '' AND dst_host <> '' AND src_host <> dst_host
      |GROUP BY src_host, dst_host"""

  /** full-corpus host graph — shared by q_web_hostgraph (direct) and
    * q_web_hostmerge (the batch-split merge must converge to it). */
  private[graft] def oracleHostGraph: String =
    (s"""WITH links AS ($oracleLinks)
      |""" + oracleHostGraphBody).stripMargin

  val oracle: Map[String, String] = Map(
    // closed-form record prediction from warcCorpus's modular classes —
    // deliberately NO parsing here: the engine must recover these rows by
    // walking real bytes under Content-Length
    "q_web_warc" ->
      """WITH base AS (SELECT doc_id,
        |  'http://w' || CAST(doc_id % 50 AS VARCHAR) || '.example/archive/'
        |    || CAST(doc_id AS VARCHAR) || '.warc' AS wf,
        |  'http://w' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
        |    || CAST(doc_id % 20 AS VARCHAR) AS uri,
        |  '2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || 'T00:00:00Z' AS dt,
        |  '<html>' || (CASE WHEN doc_id % 7 = 0
        |      THEN chr(13)||chr(10)||'WARC/1.0'||chr(13)||chr(10)||chr(13)||chr(10)
        |      ELSE '' END)
        |    || '<a href="/p/' || CAST(doc_id % 10 AS VARCHAR) || '">x</a>' AS rp,
        |  'GET /p/' || CAST(doc_id % 10 AS VARCHAR) || ' HTTP/1.1' AS qp,
        |  'software: graftbot ' || CAST(doc_id % 9 AS VARCHAR) AS ip
        |  FROM documents)
        |SELECT wf AS warc_file, CAST(0 AS INT) AS rec_ord,
        |  'warcinfo' AS record_type, CAST(NULL AS VARCHAR) AS target_uri,
        |  dt AS warc_date, CAST(LENGTH(ip) AS BIGINT) AS payload_len,
        |  ip AS payload_str
        |FROM base WHERE doc_id % 5 = 0
        |UNION ALL
        |SELECT wf, CAST(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS INT),
        |  'response', uri, dt, CAST(LENGTH(rp) AS BIGINT), rp FROM base
        |UNION ALL
        |SELECT wf, CAST(CASE WHEN doc_id % 5 = 0 THEN 2 ELSE 1 END AS INT),
        |  'request', uri, CASE WHEN doc_id % 9 = 0 THEN NULL ELSE dt END,
        |  CAST(LENGTH(qp) AS BIGINT), qp FROM base WHERE doc_id % 3 = 0""".stripMargin,

    // closed-form response payloads (warcCorpus's %7 trap text SURVIVES as
    // text content — it is content) through QueriesText's shared 9-stage
    // chain; PLAIN-string concat (the chain carries `\b`/`\t`)
    "q_web_ingestpipe" ->
      ("""WITH p AS (SELECT
        |    'http://w' || CAST(doc_id % 50 AS VARCHAR) || '.example/p/'
        |      || CAST(doc_id % 20 AS VARCHAR) AS url,
        |    '<html>' || (CASE WHEN doc_id % 7 = 0
        |        THEN chr(13)||chr(10)||'WARC/1.0'||chr(13)||chr(10)||chr(13)||chr(10)
        |        ELSE '' END)
        |      || '<a href="/p/' || CAST(doc_id % 10 AS VARCHAR) || '">x</a>' AS html
        |  FROM documents),
        |""" + QueriesText.oracleExtractChain("p") + """
        |SELECT url, text, CAST(LENGTH(text) AS BIGINT) AS n_chars FROM s9""").stripMargin,

    // the discovery-leg composition: links (oracleLinks' x/select as CTEs),
    // canonical candidates LEFT-JOIN-NULL against canonical seen urls,
    // two-literal label-boundary blocklist, LENGTH*7%100 priority waves
    "q_web_discover" ->
      (s"""WITH p AS ($oraclePages),
        |x AS (SELECT url,
        |  LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
        |  UNNEST(REGEXP_EXTRACT_ALL(html, '(?i)href="([^"]*)"', 1)) AS href FROM p),
        |links AS (SELECT dst_url AS url FROM (
        |  SELECT CASE WHEN REGEXP_MATCHES(href, '^[Hh][Tt][Tt][Pp][Ss]?://') THEN href
        |              WHEN href LIKE '/%' AND scheme <> ''
        |                THEN scheme || '://' || hostport || href
        |         END AS dst_url
        |  FROM x) WHERE dst_url IS NOT NULL),
        |pu AS (SELECT DISTINCT url FROM p),
        |""" + oracleCanon("links", "cand") + """,
        |""" + oracleCanon("pu", "seen") + """,
        |fresh AS (SELECT c.url FROM cand c LEFT JOIN seen se ON se.url = c.url
        |          WHERE se.url IS NULL),
        |fh AS (SELECT url,
        |  LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host
        |  FROM fresh),
        |ok AS (SELECT url, host FROM fh WHERE NOT (
        |    host = 'hub1.example.org' OR host LIKE '%.hub1.example.org'
        |    OR host = 'blank.example.org' OR host LIKE '%.blank.example.org')),
        |fr AS (SELECT url, host,
        |    ROW_NUMBER() OVER (PARTITION BY host
        |      ORDER BY (LENGTH(url) * 7) % 100 DESC, url ASC) AS rn
        |  FROM ok)
        |SELECT url, host, CAST(rn AS BIGINT) AS host_rank,
        |  CAST((rn - 1) // 3 AS BIGINT) AS wave FROM fr""").stripMargin,

    // closed-form: sitemapCorpus's two document locs per page (%3 lastmod
    // on the first, never on the second; %4 child sitemap excluded as
    // is_index; %5/%7 classes have no loc), MAX lastmod per collapsed loc,
    // the crawl store re-derived, lexicographic date compare
    "q_web_recrawl" ->
      """WITH d AS (SELECT doc_id FROM documents),
        |l AS (
        |  SELECT 'http://s' || CAST(doc_id % 100 AS VARCHAR) || '.example/page/'
        |           || CAST(doc_id % 10 AS VARCHAR) AS loc,
        |         CASE WHEN doc_id % 3 = 0
        |              THEN '2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) END AS lm
        |  FROM d
        |  UNION ALL
        |  SELECT 'http://s' || CAST(doc_id % 100 AS VARCHAR) || '.example/page/'
        |           || CAST(doc_id % 10 + 1 AS VARCHAR), NULL FROM d),
        |locs AS (SELECT loc, MAX(lm) AS lastmod FROM l GROUP BY loc),
        |c AS (SELECT 'http://s' || CAST(doc_id % 100 AS VARCHAR) || '.example/page/'
        |        || CAST(doc_id % 7 AS VARCHAR) AS url,
        |      '2026-01-0' || CAST((doc_id % 100 + doc_id % 7) % 9 + 1 AS VARCHAR) AS cd
        |      FROM d),
        |seen AS (SELECT url, MAX(cd) AS last_crawl FROM c GROUP BY url)
        |SELECT locs.loc, locs.lastmod, seen.last_crawl,
        |  CASE WHEN seen.url IS NULL THEN 'new'
        |       WHEN locs.lastmod IS NOT NULL AND locs.lastmod > seen.last_crawl
        |         THEN 'stale'
        |       ELSE 'fresh' END AS status
        |FROM locs LEFT JOIN seen ON seen.url = locs.loc""".stripMargin,

    // re-derives sitemapCorpus; the comment strip, CDATA strip, entry
    // split, loc/lastmod patterns are WebGraph's constants verbatim
    "q_web_sitemap" ->
      """WITH p AS (SELECT
        |    'http://s' || CAST(doc_id % 100 AS VARCHAR) || '.example/sitemap'
        |      || CAST(doc_id AS VARCHAR) || '.xml' AS url,
        |    '<?xml version="1.0"?><urlset>'
        |    || (CASE WHEN doc_id % 7 = 0
        |         THEN '<!--<url><loc>http://fake.example/x</loc></url>-->' ELSE '' END)
        |    || '<url><loc>'
        |    || (CASE WHEN doc_id % 2 = 0 THEN ' ' ELSE '' END)
        |    || 'http://s' || CAST(doc_id % 100 AS VARCHAR) || '.example/page/'
        |    || CAST(doc_id % 10 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 0 THEN ' ' ELSE '' END)
        |    || '</loc>'
        |    || (CASE WHEN doc_id % 3 = 0
        |         THEN '<lastmod>2026-01-0' || CAST(doc_id % 9 + 1 AS VARCHAR) || '</lastmod>'
        |         ELSE '' END)
        |    || '</url>'
        |    || '<url><loc>'
        |    || (CASE WHEN doc_id % 11 = 0 THEN '<![CDATA[' ELSE '' END)
        |    || 'http://s' || CAST(doc_id % 100 AS VARCHAR) || '.example/page/'
        |    || CAST(doc_id % 10 + 1 AS VARCHAR)
        |    || (CASE WHEN doc_id % 11 = 0 THEN ']]>' ELSE '' END)
        |    || '</loc></url>'
        |    || (CASE WHEN doc_id % 5 = 0
        |         THEN '<url><priority>0.5</priority></url>' ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0
        |         THEN '<sitemap><loc>http://s' || CAST(doc_id % 100 AS VARCHAR)
        |              || '.example/sitemap-child.xml</loc></sitemap>' ELSE '' END)
        |    || '</urlset>' AS xml
        |  FROM documents),
        |noc AS (SELECT url, REGEXP_REPLACE(
        |    REGEXP_REPLACE(xml, '(?s)<!--.*?-->', '', 'g'),
        |    '(?s)<!\[CDATA\[(.*?)\]\]>', '\1', 'g') AS t FROM p),
        |ent AS (SELECT url, unnest(regexp_split_to_array(t, '(?i)</(?:url|sitemap)>')) AS e FROM noc),
        |f AS (SELECT url, e FROM ent WHERE CONTAINS(LOWER(e), '<loc>'))
        |SELECT url AS sitemap_url,
        |  REGEXP_EXTRACT(e, '(?is)<loc>\s*([^<]*?)\s*</loc>', 1) AS loc,
        |  NULLIF(REGEXP_EXTRACT(e, '(?is)<lastmod>\s*([^<]*?)\s*</lastmod>', 1), '') AS lastmod,
        |  CONTAINS(LOWER(e), '<sitemap>') AS is_index
        |FROM f
        |WHERE REGEXP_EXTRACT(e, '(?is)<loc>\s*([^<]*?)\s*</loc>', 1) <> ''""".stripMargin,
    // ground-truth weak components: undirected closure by recursive
    // reachability (the q_raster_regions_global precedent), comp = MIN
    // reachable node — ASCII string MIN is byte-identical in both engines
    "q_web_components" ->
      """WITH RECURSIVE raw AS (SELECT
        |    'c' || CAST(doc_id % 10 AS VARCHAR) || 'n'
        |        || CAST((doc_id * 3) % 23 AS VARCHAR) AS src,
        |    'c' || CAST(doc_id % 10 AS VARCHAR) || 'n'
        |        || CAST((doc_id * 5 + 1) % 23 AS VARCHAR) AS dst
        |  FROM documents),
        |e AS (SELECT DISTINCT src AS u, dst AS v FROM raw
        |      UNION SELECT dst, src FROM raw),
        |reach(id, lab) AS (
        |  SELECT u, u FROM e
        |  UNION
        |  SELECT e.u, reach.lab FROM e JOIN reach ON reach.id = e.v)
        |SELECT id, MIN(lab) AS comp FROM reach GROUP BY id""".stripMargin,

    // re-derives blockCorpus + blockFrontier, explodes each host into its
    // label-boundary suffix chain, joins the blocklist, longest match wins
    // (suffix lengths are unique per host -> MAX_BY deterministic)
    "q_web_blocklist" ->
      """WITH ks AS (SELECT DISTINCT doc_id % 10 AS k FROM documents),
        |bl AS (SELECT LOWER(CASE
        |    WHEN k % 3 = 0 THEN 'ads' || CAST(k AS VARCHAR) || '.example.org'
        |    WHEN k = 1 THEN 'Spam1.Com'
        |    ELSE 'spam' || CAST(k AS VARCHAR) || '.com' END) AS dom FROM ks
        |  UNION SELECT 'www.spam2.com' FROM ks WHERE k = 2),
        |f AS (SELECT doc_id, CASE
        |  WHEN doc_id % 13 = 0 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
        |  WHEN doc_id % 7 = 0 THEN 'http://www.spam' || CAST(doc_id % 10 AS VARCHAR)
        |       || '.com/p/' || CAST(doc_id AS VARCHAR)
        |  WHEN doc_id % 5 = 0 THEN 'https://spam' || CAST(doc_id % 10 AS VARCHAR)
        |       || '.com/x'
        |  WHEN doc_id % 11 = 0 THEN 'http://sub.ads' || CAST(doc_id % 10 AS VARCHAR)
        |       || '.example.org/y'
        |  WHEN doc_id % 17 = 0 THEN 'http://spam' || CAST(doc_id % 10 AS VARCHAR)
        |       || '.com.evil.net/z'
        |  ELSE 'http://ok' || CAST(doc_id % 20 AS VARCHAR) || '.net/p/'
        |       || CAST(doc_id AS VARCHAR) END AS url FROM documents),
        |h AS (SELECT doc_id, url,
        |  LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host
        |  FROM f),
        |hh AS (SELECT DISTINCT host, STRING_SPLIT(host, '.') AS ls FROM h
        |       WHERE host <> ''),
        |sfx AS (SELECT host, ARRAY_TO_STRING(LIST_SLICE(ls, i, LEN(ls)), '.') AS s
        |        FROM hh, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ls))) AS i) t),
        |m AS (SELECT host, MAX_BY(s, LEN(s)) AS matched_domain
        |      FROM sfx JOIN bl ON s = dom GROUP BY host)
        |SELECT h.doc_id, h.url, h.host, m.matched_domain,
        |  m.matched_domain IS NOT NULL AS blocked
        |FROM h LEFT JOIN m USING (host)""".stripMargin,

    // full robots replay: re-derive bodies, strip comments, window-assign
    // UA-run groups (lag + running sum, as the engine), keep *-groups'
    // non-empty Allow/Disallow rules, then longest-prefix / Allow-tie /
    // prefix-DESC pick per distinct frontier url; no-rule urls allowed
    "q_web_robots" ->
      ("""WITH """ + oracleRobotsRules + """,
        |f AS (SELECT DISTINCT
        |    'http://h' || CAST(doc_id % 10 AS VARCHAR) || '.example' ||
        |    CASE WHEN doc_id % 11 = 0 THEN ''
        |         WHEN doc_id % 3 = 0 THEN '/private/ok/' || CAST(doc_id AS VARCHAR)
        |         WHEN doc_id % 7 = 0 THEN '/private/' || CAST(doc_id AS VARCHAR)
        |         ELSE '/pub/' || CAST(doc_id AS VARCHAR) END AS url
        |  FROM documents),
        |fp AS (SELECT url,
        |    LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host,
        |    CASE WHEN REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) = ''
        |         THEN '/'
        |         ELSE REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) END AS path
        |  FROM f),
        |j AS (SELECT fp.url, r.allow, r.prefix,
        |    ROW_NUMBER() OVER (PARTITION BY fp.url
        |      ORDER BY LEN(r.prefix) DESC, r.allow DESC, r.prefix DESC) AS rn
        |  FROM fp JOIN rules r
        |    ON r.host = fp.host AND STARTS_WITH(fp.path, r.prefix))
        |SELECT fp.url, COALESCE(j.allow, TRUE) AS robots_allowed,
        |  j.prefix AS matched_prefix
        |FROM fp LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (url)""").stripMargin,

    // chains the three oracle shapes on one fixture: canonicalization +
    // latest-crawl rank (the q_txt_urldedup form), the shared robots parse,
    // compliance pick, then politeness waves (priority = LENGTH(url)*7 % 100)
    "q_web_crawlpipe" ->
      ("""WITH """ + oracleRobotsRules + """,
        |p AS (SELECT doc_id,
        |  'http://' ||
        |  (CASE WHEN doc_id % 5 = 0 THEN 'H' || CAST(doc_id % 10 AS VARCHAR) || '.Example'
        |        ELSE 'h' || CAST(doc_id % 10 AS VARCHAR) || '.example' END) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN ':80' ELSE '' END) ||
        |  (CASE WHEN doc_id % 11 = 0 THEN ''
        |        WHEN doc_id % 3 = 0 THEN '/private/ok/' || CAST(doc_id % 40 AS VARCHAR)
        |        WHEN doc_id % 7 = 0 THEN '/private/' || CAST(doc_id % 40 AS VARCHAR)
        |        ELSE '/pub/' || CAST(doc_id % 40 AS VARCHAR) END) ||
        |  (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1'
        |        WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '?b=2&a=1' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url,
        |  1767225600 + doc_id * 37 AS ts FROM documents),
        |cc AS (SELECT doc_id, url, ts,
        |  LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
        |  REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
        |  REGEXP_EXTRACT(url, '^[^?#]*\?([^#]*)', 1) AS q FROM p),
        |cc2 AS (SELECT doc_id, url, ts, scheme,
        |  LOWER(REGEXP_EXTRACT(hostport, '^([^:]*)', 1)) AS host,
        |  REGEXP_EXTRACT(hostport, ':([0-9]+)$', 1) AS port,
        |  CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path,
        |  ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(STRING_SPLIT(q, '&'),
        |    x -> LEN(x) > 0 AND NOT REGEXP_MATCHES(x,
        |      '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)='))), '&') AS params
        |  FROM cc),
        |canon AS (SELECT doc_id, url, ts,
        |  scheme || '://' || host
        |  || (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
        |           AND NOT (scheme = 'https' AND port = '443')
        |      THEN ':' || port ELSE '' END)
        |  || path || (CASE WHEN params = '' THEN '' ELSE '?' || params END) AS canon_url
        |  FROM cc2),
        |kept AS (SELECT canon_url AS url FROM (
        |  SELECT canon_url, ROW_NUMBER() OVER (PARTITION BY canon_url
        |    ORDER BY ts DESC, url) AS rn FROM canon) WHERE rn = 1),
        |fp AS (SELECT url,
        |    LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host,
        |    CASE WHEN REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) = ''
        |         THEN '/'
        |         ELSE REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) END AS path
        |  FROM kept),
        |j AS (SELECT fp.url, r.allow,
        |    ROW_NUMBER() OVER (PARTITION BY fp.url
        |      ORDER BY LEN(r.prefix) DESC, r.allow DESC, r.prefix DESC) AS rn
        |  FROM fp JOIN rules r
        |    ON r.host = fp.host AND STARTS_WITH(fp.path, r.prefix)),
        |dec AS (SELECT fp.url FROM fp
        |  LEFT JOIN (SELECT * FROM j WHERE rn = 1) j USING (url)
        |  WHERE COALESCE(j.allow, TRUE)),
        |fr AS (SELECT url,
        |    LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1))
        |      ORDER BY (LENGTH(url) * 7) % 100 DESC, url ASC) AS rn
        |  FROM dec)
        |SELECT url, host, CAST(rn AS BIGINT) AS host_rank,
        |  CAST((rn - 1) // 3 AS BIGINT) AS wave FROM fr""").stripMargin,

    "q_web_links" -> oracleLinks.stripMargin,

    "q_web_anchors" -> oracleAnchors.stripMargin,

    "q_web_anchorstats" ->
      s"""WITH anchors AS ($oracleAnchors),
        |h AS (SELECT
        |  LOWER(REGEXP_EXTRACT(dst_url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS dst_host,
        |  anchor FROM anchors),
        |ba AS (SELECT dst_host, anchor, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM h WHERE dst_host <> '' GROUP BY dst_host, anchor),
        |tot AS (SELECT dst_host, CAST(SUM(n) AS BIGINT) AS n_links,
        |        CAST(SUM(CASE WHEN anchor <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_anchors
        |        FROM ba GROUP BY dst_host),
        |top AS (SELECT dst_host, anchor AS top_anchor, n AS top_anchor_n FROM (
        |  SELECT dst_host, anchor, n,
        |    ROW_NUMBER() OVER (PARTITION BY dst_host ORDER BY n DESC, anchor) AS rn
        |  FROM ba WHERE anchor <> '') WHERE rn = 1)
        |SELECT tot.dst_host, n_links, n_anchors, top_anchor, top_anchor_n
        |FROM tot LEFT JOIN top USING (dst_host)""".stripMargin,

    // 2 unrolled HITS iterations; `//` floor division on non-negative
    // BIGINTs = Spark `div` → bit-identical scores. scale = 1000000.
    "q_web_hits" ->
      """WITH e AS (SELECT DISTINCT
        |    'h' || CAST(doc_id % 97 AS VARCHAR) AS src,
        |    'h' || CAST((doc_id * 5 + 3) % 101 AS VARCHAR) AS dst FROM documents),
        |nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
        |h0 AS (SELECT host, CAST(1000000 AS BIGINT) AS hub FROM nodes),
        |a1r AS (SELECT e.dst AS host, SUM(h0.hub) AS raw
        |        FROM e JOIN h0 ON h0.host = e.src GROUP BY e.dst),
        |a1 AS (SELECT n.host,
        |       CAST((COALESCE(a1r.raw, 0) * 1000000) // (SELECT MAX(raw) FROM a1r) AS BIGINT) AS auth
        |       FROM nodes n LEFT JOIN a1r USING (host)),
        |h1r AS (SELECT e.src AS host, SUM(a1.auth) AS raw
        |        FROM e JOIN a1 ON a1.host = e.dst GROUP BY e.src),
        |h1 AS (SELECT n.host,
        |       CAST((COALESCE(h1r.raw, 0) * 1000000) // (SELECT MAX(raw) FROM h1r) AS BIGINT) AS hub
        |       FROM nodes n LEFT JOIN h1r USING (host)),
        |a2r AS (SELECT e.dst AS host, SUM(h1.hub) AS raw
        |        FROM e JOIN h1 ON h1.host = e.src GROUP BY e.dst),
        |a2 AS (SELECT n.host,
        |       CAST((COALESCE(a2r.raw, 0) * 1000000) // (SELECT MAX(raw) FROM a2r) AS BIGINT) AS auth
        |       FROM nodes n LEFT JOIN a2r USING (host)),
        |h2r AS (SELECT e.src AS host, SUM(a2.auth) AS raw
        |        FROM e JOIN a2 ON a2.host = e.dst GROUP BY e.src),
        |h2 AS (SELECT n.host,
        |       CAST((COALESCE(h2r.raw, 0) * 1000000) // (SELECT MAX(raw) FROM h2r) AS BIGINT) AS hub
        |       FROM nodes n LEFT JOIN h2r USING (host))
        |SELECT h2.host, h2.hub, a2.auth FROM h2 JOIN a2 USING (host)""".stripMargin,

    // host regex mirrors WebGraph.hostOf; `//` = Spark div on positive rn
    "q_web_frontier" ->
      """WITH f AS (SELECT
        |    CASE WHEN doc_id % 13 = 0 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
        |         ELSE 'http://host' || CAST(doc_id % 11 AS VARCHAR)
        |              || '.example/p/' || CAST(doc_id AS VARCHAR) END AS url,
        |    (doc_id * 7) % 1000 AS priority
        |  FROM documents),
        |r AS (SELECT url,
        |    LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1)) AS host,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY LOWER(REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)', 1))
        |      ORDER BY priority DESC, url ASC) AS rn
        |  FROM f)
        |SELECT url, host, CAST(rn AS BIGINT) AS host_rank,
        |  CAST((rn - 1) // 4 AS BIGINT) AS wave FROM r""".stripMargin,

    "q_web_hostgraph" -> oracleHostGraph,

    // convergence IS the oracle: batch-split + merge must equal the
    // full-corpus graph
    "q_web_hostmerge" -> oracleHostGraph,

    // the shared robots parse fragment's tg3/star feed the delay
    // extraction the same way they feed the rules
    "q_web_crawldelay" ->
      ("""WITH """ + oracleRobotsRules + """,
        |dl AS (SELECT t.host,
        |    TRIM(REGEXP_EXTRACT(t.line, '(?i)^crawl-delay:(.*)$', 1)) AS d
        |  FROM tg3 t JOIN star USING (host, grp))
        |SELECT host, MAX(CAST(d AS BIGINT)) AS crawl_delay_sec
        |FROM dl WHERE REGEXP_MATCHES(d, '^[0-9]+$') GROUP BY host""").stripMargin,

    // hostgraph body as a CTE + the q_txt_quantiles nearest-rank shape
    "q_web_degreedist" ->
      (s"""WITH links AS ($oracleLinks),
        |hg AS (
        |""" + oracleHostGraphBody + """),
        |dg AS (SELECT src_host AS host, CAST(SUM(n_links) AS BIGINT) AS deg,
        |              'out' AS dir FROM hg GROUP BY src_host
        |       UNION ALL
        |       SELECT dst_host, CAST(SUM(n_links) AS BIGINT), 'in'
        |       FROM hg GROUP BY dst_host),
        |h AS (SELECT dir AS grp, deg AS v, COUNT(*) AS c FROM dg GROUP BY 1, 2),
        |cum AS (SELECT grp, v, c, SUM(c) OVER (PARTITION BY grp ORDER BY v
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |tot AS (SELECT grp, SUM(c) AS n FROM h GROUP BY grp),
        |rk AS (SELECT grp, n, p, CAST(FLOOR((p * n + 99) / 100.0) AS BIGINT) AS rnk
        |       FROM tot, (SELECT UNNEST([10, 50, 90, 99]) AS p) q)
        |SELECT cum.grp AS dir, CAST(p AS INT) AS p, CAST(n AS BIGINT) AS n,
        |  v AS q_value
        |FROM cum JOIN rk ON cum.grp = rk.grp
        |WHERE cum >= rnk AND cum - c < rnk""").stripMargin,

    // 3 unrolled synchronous iterations; `//` is DuckDB BIGINT floor division
    // = Spark `div` on the same non-negative Longs → bit-identical ranks.
    // base = ((100-85)*1000000)//100 = 150000.
    // pagerank's unrolled-CTE shape with seed-restricted teleport:
    // base lands only on seed rows, trust[0] = scale only on seeds
    "q_web_trustrank" ->
      """WITH e AS (SELECT DISTINCT
        |    'h' || CAST(doc_id % 97 AS VARCHAR) AS src,
        |    'h' || CAST((doc_id * 5 + 3) % 101 AS VARCHAR) AS dst FROM documents),
        |nodes AS (SELECT src AS host FROM e UNION SELECT dst FROM e),
        |seeds(host) AS (VALUES ('h0'),('h10'),('h20'),('h30'),('h40'),('h50'),
        |  ('h60'),('h70'),('h80'),('h90'),('h100')),
        |sn AS (SELECT n.host, (s.host IS NOT NULL) AS is_seed
        |       FROM nodes n LEFT JOIN seeds s ON s.host = n.host),
        |outdeg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS odeg FROM e GROUP BY src),
        |r0 AS (SELECT host, is_seed,
        |       CAST(CASE WHEN is_seed THEN 1000000 ELSE 0 END AS BIGINT) AS trust
        |       FROM sn),
        |i1 AS (SELECT e.dst AS host, SUM(r0.trust // o.odeg) AS inc
        |       FROM e JOIN r0 ON r0.host = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT n.host, n.is_seed,
        |       CAST((CASE WHEN n.is_seed THEN 150000 ELSE 0 END)
        |            + (85 * COALESCE(i1.inc, 0)) // 100 AS BIGINT) AS trust
        |       FROM sn n LEFT JOIN i1 USING (host)),
        |i2 AS (SELECT e.dst AS host, SUM(r1.trust // o.odeg) AS inc
        |       FROM e JOIN r1 ON r1.host = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT n.host, n.is_seed,
        |       CAST((CASE WHEN n.is_seed THEN 150000 ELSE 0 END)
        |            + (85 * COALESCE(i2.inc, 0)) // 100 AS BIGINT) AS trust
        |       FROM sn n LEFT JOIN i2 USING (host)),
        |i3 AS (SELECT e.dst AS host, SUM(r2.trust // o.odeg) AS inc
        |       FROM e JOIN r2 ON r2.host = e.src JOIN outdeg o ON o.src = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT n.host, n.is_seed,
        |       CAST((CASE WHEN n.is_seed THEN 150000 ELSE 0 END)
        |            + (85 * COALESCE(i3.inc, 0)) // 100 AS BIGINT) AS trust
        |       FROM sn n LEFT JOIN i3 USING (host))
        |SELECT host, is_seed, trust FROM r3""".stripMargin,

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
