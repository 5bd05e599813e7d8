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
}
