package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** Web-graph operators: href extraction/resolution semantics, host-graph
  * collapse rules, and the fixed-point PageRank vs a driver-side brute force
  * (bit-identical — both are BIGINT floor division on non-negative values). */
class WebGraphSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def pages(rows: (String, String)*) =
    rows.toDF("url", "html").withColumn("html", col("html").cast("binary"))

  test("extractLinks: absolute kept verbatim, case-insensitive HREF, multiplicity") {
    val p = pages(
      ("http://a.example/p",
       """<a href="https://B.Example/x">1</a><a HREF="https://B.Example/x">2</a>"""))
    val got = WebGraph.extractLinks(p, "url", "html")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(
      ("http://a.example/p", "https://B.Example/x"),
      ("http://a.example/p", "https://B.Example/x")))
  }

  test("extractLinks: root-relative resolves against lowercased scheme://hostport") {
    val p = pages(
      ("HTTPS://Site.Example.ORG:8443/deep/page?q=1#f", """<a href="/local/x">r</a>"""),
      ("http://plain.example/p", """<a href="/y">r</a>"""))
    val got = WebGraph.extractLinks(p, "url", "html")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("HTTPS://Site.Example.ORG:8443/deep/page?q=1#f", "https://site.example.org:8443/local/x"),
      ("http://plain.example/p", "http://plain.example/y")))
  }

  test("extractLinks: mailto / fragment / relative / empty hrefs dropped") {
    val p = pages(
      ("http://a.example/p",
       """<a href="mailto:x@y">m</a><a href="#top">f</a><a href="rel/p">r</a>""" +
       """<a href="">e</a><a href="javascript:void(0)">j</a>"""))
    assert(WebGraph.extractLinks(p, "url", "html").count() == 0L)
  }

  test("hostGraph: port stripped, self-loops and unparseable endpoints dropped, counts") {
    val links = Seq(
      ("http://a.example:8080/1", "https://b.example/x"),
      ("http://a.example/2", "http://b.example:9/y"),   // same host pair, diff ports
      ("http://a.example/3", "http://a.example/self"),  // self-loop
      ("nota url", "http://b.example/z"),               // unparseable src
      ("http://c.example/4", "http://b.example/w")
    ).toDF("src_url", "dst_url")
    val got = WebGraph.hostGraph(links, "src_url", "dst_url")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a.example", "b.example") -> 2L, ("c.example", "b.example") -> 1L))
  }

  /** Driver-side reference PageRank with the same Long floor-division rules. */
  private def brutePr(edges: Seq[(String, String)], iters: Int,
                      scale: Long, dampingPct: Int): Map[String, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = ((100L - dampingPct) * scale) / 100L
    var rank = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inc = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(x => rank(x._1) / outdeg(x._1)).sum
      }
      rank = nodes.map(n => n -> (base + dampingPct * inc.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("pageRankFixedPoint == brute force on a random graph (bit-identical Longs)") {
    val r = new scala.util.Random(7)
    val hosts = (0 until 30).map(i => s"h$i")
    val edges = (0 until 200).map(_ => (hosts(r.nextInt(30)), hosts(r.nextInt(30))))
      .filter { case (a, b) => a != b } ++ Seq(("h0", "h29"), ("h1", "h29")) // h29 likely dangling-ish
    val df = edges.toDF("s", "d")
    for (iters <- Seq(1, 3)) {
      val got = WebGraph.pageRankFixedPoint(df, "s", "d", iters = iters)
        .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
      assert(got == brutePr(edges, iters, 1000000L, 85), s"iters=$iters")
    }
  }

  test("pageRankFixedPoint: parallel edges collapse; node with no in-edges gets base rank") {
    val edges = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("s", "d")
    val got = WebGraph.pageRankFixedPoint(edges, "s", "d", iters = 1)
      .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
    // a: outdeg 2 (parallel edge collapsed), contrib 500000 to each of b,c
    // base = 150000; b = c = 150000 + 85*500000/100 = 575000; a = 150000
    assert(got == Map("a" -> 150000L, "b" -> 575000L, "c" -> 575000L))
  }

  private def bruteTrust(edges: Seq[(String, String)], seeds: Set[String],
                         iters: Int, scale: Long, dPct: Long): Map[String, (Boolean, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = (100L - dPct) * scale / 100L
    var t = nodes.map(n => n -> (if (seeds(n)) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val inc = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(x => t(x._1) / outdeg(x._1)).sum
      }
      t = nodes.map(n =>
        n -> ((if (seeds(n)) base else 0L) + dPct * inc.getOrElse(n, 0L) / 100L)).toMap
    }
    nodes.map(n => n -> ((seeds(n), t(n)))).toMap
  }

  test("trustRank == brute force; spam island unreachable from seeds stays 0") {
    val r = new scala.util.Random(11)
    val hosts = (0 until 20).map(i => s"h$i")
    val edges = (0 until 120).map(_ => (hosts(r.nextInt(20)), hosts(r.nextInt(20))))
      .filter { case (a, b) => a != b } ++
      Seq(("spamA", "spamB"), ("spamB", "spamA")) // island: no seed path in
    val seeds = Set("h0", "h1")
    for (iters <- Seq(1, 3)) {
      val got = WebGraph.trustRank(edges.toDF("s", "d"), "s", "d",
        seeds.toSeq.toDF("host"), "host", iters = iters)
        .collect().map(row => row.getString(0) -> ((row.getBoolean(1), row.getLong(2)))).toMap
      assert(got == bruteTrust(edges, seeds, iters, 1000000L, 85L), s"iters=$iters")
      assert(got("spamA")._2 == 0L && got("spamB")._2 == 0L)
    }
  }

  test("extractAnchors: anchor text trimmed, whitespace body -> '', multiplicity kept") {
    val p = pages(
      ("http://a.example/p",
       """<a href="https://b.example/x"> Buy Now </a>""" +
       """<a href="/y">  </a>""" +
       """<a href="https://b.example/x"> Buy Now </a>"""))
    val got = WebGraph.extractAnchors(p, "url", "html")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq.sorted
    assert(got == Seq(
      ("http://a.example/y", ""),
      ("https://b.example/x", "Buy Now"),
      ("https://b.example/x", "Buy Now")))
  }

  test("extractAnchors: nested-markup anchor bodies don't match; dropped hrefs dropped") {
    val p = pages(
      ("http://a.example/p",
       """<a href="https://b.example/x"><b>bold</b></a>""" + // nested -> no match
       """<a href="mailto:x@y">m</a><a href="rel/p">r</a>""")) // unresolvable hrefs
    assert(WebGraph.extractAnchors(p, "url", "html").count() == 0L)
  }

  test("anchorStats: top anchor by count with lexicographic tie-break; empty anchors = link mass only") {
    val anchors = Seq(
      ("http://s/1", "https://T.example:81/a", "beta"),
      ("http://s/2", "https://t.example/b", "beta"),
      ("http://s/3", "https://t.example/c", "alpha"), // ties beta at 2 after next row
      ("http://s/4", "https://t.example/d", "alpha"),
      ("http://s/5", "https://t.example/e", ""),      // counts in n_links only
      ("http://s/6", "https://only-empty.example/f", "")
    ).toDF("src_url", "dst_url", "anchor")
    val got = WebGraph.anchorStats(anchors, "dst_url", "anchor")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3)),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // t.example: 5 links, 2 distinct non-empty anchors, alpha==beta at 2 -> alpha
    assert(got("t.example") == ((5L, 2L, Some("alpha"), 2L)))
    assert(got("only-empty.example") == ((1L, 0L, None, -1L)))
  }

  /** Driver-side reference HITS with the same Long floor-division +
    * max-normalization rules. */
  private def bruteHits(edges: Seq[(String, String)], iters: Int,
                        scale: Long): Map[String, (Long, Long)] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[String, Long]
    for (_ <- 1 to iters) {
      val ar = e.groupBy(_._2).map { case (d, es) => d -> es.map(x => hub(x._1)).sum }
      val am = ar.values.max
      auth = nodes.map(n => n -> ar.getOrElse(n, 0L) * scale / am).toMap
      val hr = e.groupBy(_._1).map { case (s, es) => s -> es.map(x => auth(x._2)).sum }
      val hm = hr.values.max
      hub = nodes.map(n => n -> hr.getOrElse(n, 0L) * scale / hm).toMap
    }
    nodes.map(n => n -> ((hub(n), auth(n)))).toMap
  }

  test("hitsFixedPoint == brute force on a random graph (bit-identical Longs)") {
    val r = new scala.util.Random(11)
    val hosts = (0 until 25).map(i => s"h$i")
    val edges = ((0 until 150).map(_ => (hosts(r.nextInt(25)), hosts(r.nextInt(25))))
      .filter { case (a, b) => a != b } ++ Seq(("h0", "h24"), ("h1", "h24"))).distinct
    val df = edges.toDF("s", "d")
    for (iters <- Seq(1, 2, 3)) {
      val got = WebGraph.hitsFixedPoint(df, "s", "d", iters = iters)
        .collect().map(row => row.getString(0) -> ((row.getLong(1), row.getLong(2)))).toMap
      assert(got == bruteHits(edges, iters, 1000000L), s"iters=$iters")
    }
  }

  test("frontierSchedule: per-host waves cap fetches; priority DESC, url ASC ties") {
    val frontier = Seq(
      ("http://A.ex/1", 10L), ("http://a.ex/2", 10L), ("http://a.ex/3", 5L),
      ("http://b.ex/1", 99L),
      ("not a url", 50L))
      .toDF("url", "priority")
    val got = WebGraph.frontierSchedule(frontier, "url", "priority", slotsPerWave = 2)
      .collect().map(r => r.getString(0) -> ((r.getString(2), r.getLong(3), r.getLong(4))))
      .toMap
    // a.ex: ties at 10 -> url ASC: A.ex/1 (uppercase A sorts before a) rank 1
    assert(got("http://A.ex/1") == (("a.ex", 1L, 0L)))
    assert(got("http://a.ex/2") == (("a.ex", 2L, 0L)))
    assert(got("http://a.ex/3") == (("a.ex", 3L, 1L))) // third url -> next wave
    assert(got("http://b.ex/1") == (("b.ex", 1L, 0L)))
    assert(got("not a url") == (("", 1L, 0L)))          // unparseable -> host ''
  }

  test("hitsFixedPoint: hand case — pure hub scores 0 auth, pure authority 0 hub") {
    // a -> c, b -> c: c is the only authority; a,b are equal hubs; c has no
    // out-edges so hub(c)=0, a/b have no in-edges so auth=0.
    val edges = Seq(("a", "c"), ("b", "c")).toDF("s", "d")
    val got = WebGraph.hitsFixedPoint(edges, "s", "d", iters = 2)
      .collect().map(row => row.getString(0) -> ((row.getLong(1), row.getLong(2)))).toMap
    assert(got == Map(
      "a" -> ((1000000L, 0L)), "b" -> ((1000000L, 0L)), "c" -> ((0L, 1000000L))))
  }

  test("parseRobots: star groups only, stacked UA runs, comments, empty Disallow dropped") {
    val robots = Seq(
      ("A.ex",
       "User-agent: bot\nDisallow: /all\n" +        // specific agent: ignored
       "User-agent: a\nUser-agent: *\n" +            // stacked run naming *
       "Disallow: /private # trailing comment\n" +
       "Allow: /private/ok\n" +
       "Disallow:\n" +                               // empty: allow-all, no rule
       "# pure comment\nCrawl-delay: 5\n"))          // unknown directive ignored
      .toDF("host", "body")
    val got = WebGraph.parseRobots(robots, "host", "body")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a.ex", false, "/private", 8L),
      ("a.ex", true, "/private/ok", 11L)))
  }

  test("robotsFilter: longest prefix wins, Allow beats Disallow on ties, no-rule urls pass") {
    val rules = Seq(
      ("a.ex", false, "/private", 8L),
      ("a.ex", true, "/private/ok", 11L),
      ("b.ex", false, "/p", 2L),
      ("b.ex", true, "/p", 2L))                      // tie: Allow wins
      .toDF("host", "allow", "prefix", "plen")
    val frontier = Seq(
      "http://A.ex/private/ok/1",                    // allow (longer prefix)
      "http://a.ex/private/x",                       // disallow
      "http://a.ex/pub/1",                           // no rule matches
      "http://b.ex/p/q",                             // tie -> allow
      "http://a.ex",                                 // no path -> "/" -> no rule
      "http://unknown.ex/private/x")                 // host without rules
      .toDF("url")
    val got = WebGraph.robotsFilter(frontier, "url", rules)
      .collect().map(r => r.getString(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got == Map(
      "http://A.ex/private/ok/1" -> ((true, Some("/private/ok"))),
      "http://a.ex/private/x" -> ((false, Some("/private"))),
      "http://a.ex/pub/1" -> ((true, None)),
      "http://b.ex/p/q" -> ((true, Some("/p"))),
      "http://a.ex" -> ((true, None)),
      "http://unknown.ex/private/x" -> ((true, None))))
  }

  test("weakComponents: direction discarded, chain converges, disjoint components stay apart") {
    // component 1: a chain whose min label sits at one END (worst-case
    // propagation depth); component 2: a directed 2-cycle; component 3: a
    // self-loop singleton
    val edges = Seq(
      ("e", "d"), ("d", "c"), ("c", "b"), ("b", "a"), // chain, min at the far end
      ("x", "y"), ("y", "x"),
      ("z", "z")).toDF("s", "d")
    val got = WebGraph.weakComponents(edges, "s", "d")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "a" -> "a", "b" -> "a", "c" -> "a", "d" -> "a", "e" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "z"))
  }

  test("hostBlocklist: suffix semantics, longest match, case fold, unparseable passes") {
    val blocklist = Seq("spam.com", "www.spam.com", "Ads.Example.ORG")
      .toDF("domain")
    val frontier = Seq(
      (1L, "http://spam.com/a"),          // exact
      (2L, "http://www.spam.com/b"),      // two matches -> longest wins
      (3L, "http://deep.www.spam.com/c"), // subdomain of both -> longest
      (4L, "http://spam.com.evil.net/d"), // contains but NOT suffix -> pass
      (5L, "http://notspam.com/e"),       // label boundary: no match
      (6L, "https://ADS.example.org:8080/f"), // case + port fold
      (7L, "not a url"),                  // unparseable -> pass
      (8L, "http://ok.net/g"))
      .toDF("doc_id", "url")
    val got = WebGraph.hostBlocklist(frontier, "url", blocklist, "domain")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.getBoolean(4), Option(r.getString(3))))).toMap
    assert(got(1L) == (("spam.com", true, Some("spam.com"))))
    assert(got(2L) == (("www.spam.com", true, Some("www.spam.com"))))
    assert(got(3L) == (("deep.www.spam.com", true, Some("www.spam.com"))))
    assert(got(4L) == (("spam.com.evil.net", false, None)))
    assert(got(5L) == (("notspam.com", false, None)))
    assert(got(6L) == (("ads.example.org", true, Some("ads.example.org"))))
    assert(got(7L) == (("", false, None)))
    assert(got(8L) == (("ok.net", false, None)))
  }

  test("crawlDelays: star-group scoped, max wins, non-numeric dropped") {
    val robots = Seq(
      ("H1.example",
       "User-agent: bot\nCrawl-delay: 99\nUser-agent: *\nDisallow: /x\n" +
       "Crawl-delay: 5\ncrawl-delay: 2\nCrawl-delay: fast\n"),
      ("h2.example", "User-agent: *\nDisallow: /\n"),        // no delay
      ("h3.example", "User-agent: bot\nCrawl-delay: 7\n"))   // non-* only
      .toDF("host", "body")
    val got = WebGraph.crawlDelays(robots, "host", "body")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("h1.example" -> 5L))
  }

  test("mergeHostGraphs: any batch split converges to the full-corpus graph") {
    val r = new scala.util.Random(23)
    val all = (0 until 300).map { i =>
      (s"http://s${r.nextInt(12)}.x/p/$i",
       s"""<a href="http://s${r.nextInt(12)}.x/q">l</a><a href="http://hub${r.nextInt(4)}.x/h">m</a>""")
    }
    def hg(rows: Seq[(String, String)]) = WebGraph.hostGraph(
      WebGraph.extractLinks(
        rows.toDF("url", "html").withColumn("html", col("html").cast("binary")),
        "url", "html"),
      "src_url", "dst_url")
    val full = hg(all).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    for (mod <- Seq(2, 3)) {
      val parts = (0 until mod).map(k => hg(all.zipWithIndex.collect {
        case (row, i) if i % mod == k => row
      }))
      val merged = parts.reduce(WebGraph.mergeHostGraphs).collect()
        .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
      assert(merged == full, s"mod=$mod")
    }
  }

  test("sitemapRecrawl: new/stale/fresh, index excluded, max-lastmod pick") {
    val entries = Seq(
      ("http://a/1", Some("2026-02-01"), false),
      ("http://a/1", Some("2026-03-01"), false),  // duplicate listing, later lastmod wins
      ("http://a/2", None, false),
      ("http://a/3", Some("2026-01-01"), false),
      ("http://a/4", Some("2026-05-01"), false),
      ("http://a/more.xml", Some("2026-06-01"), true)) // index: excluded
      .toDF("loc", "lastmod", "is_index")
    val crawled = Seq(
      ("http://a/1", "2026-02-15"),  // stale: 2026-03-01 > 2026-02-15
      ("http://a/2", "2026-02-15"),  // fresh: no lastmod signal
      ("http://a/3", "2026-02-15"))  // fresh: lastmod older
      .toDF("url", "crawl_date")     // http://a/4 never crawled -> new
    val got = WebGraph.sitemapRecrawl(entries, crawled, "url", "crawl_date")
      .collect().map(r => r.getString(0) -> ((Option(r.getString(1)), r.getString(3)))).toMap
    assert(got == Map(
      "http://a/1" -> ((Some("2026-03-01"), "stale")),
      "http://a/2" -> ((None, "fresh")),
      "http://a/3" -> ((Some("2026-01-01"), "fresh")),
      "http://a/4" -> ((Some("2026-05-01"), "new"))))
  }

  test("parseSitemaps: entries, trim, lastmod, index flag, comment/loc-less dropped") {
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<!--<url><loc>http://fake/x</loc></url>-->" +
      "<url><loc>  http://a.example/1 </loc><lastmod>2026-02-03</lastmod></url>" +
      "<URL><LOC>http://a.example/2</LOC></URL>" +
      "<url><priority>0.3</priority></url>" +
      "<sitemap><loc>http://a.example/more.xml</loc></sitemap>" +
      "<url><loc></loc></url>" +
      "<url><loc><![CDATA[http://a.example/cdata?a=1&b=2]]></loc>" +
      "<lastmod><![CDATA[2026-03-04]]></lastmod></url>" +
      "</urlset>"
    val p = Seq(("http://a.example/sitemap.xml", xml)).toDF("url", "xml")
      .withColumn("xml", col("xml").cast("binary"))
    val got = WebGraph.parseSitemaps(p, "url", "xml").collect()
      .map(r => (r.getString(1), Option(r.getString(2)), r.getBoolean(3)))
    assert(got.toSet === Set(
      ("http://a.example/1", Some("2026-02-03"), false),
      ("http://a.example/2", None, false),
      ("http://a.example/more.xml", None, true),
      ("http://a.example/cdata?a=1&b=2", Some("2026-03-04"), false)))
    assert(got.length === 4) // fake (comment), loc-less, empty-loc all dropped
  }
}
