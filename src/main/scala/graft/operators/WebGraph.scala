package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Web-graph operators over a Common-Crawl-style pages table
 * (url:string, html:binary): link extraction, host-graph collapse, and a
 * deterministic fixed-point PageRank. The crawl-frontier / domain-authority
 * side of a training-data pipeline (CCNet keeps per-host stats; quality
 * filters and per-domain caps consume host-level scores).
 *
 * Everything is integer or string arithmetic on purpose — PageRank with
 * doubles is not bit-portable across engines (sum order changes the last
 * ulp), so ranks are BIGINT fixed-point with floor division, which DuckDB's
 * `//` reproduces exactly.
 */
object WebGraph {

  /** RE2-compatible href matcher (no lookarounds, no backrefs) shared
    * VERBATIM with the q_web_* oracles — group 1 is the raw href value. */
  val HrefPattern: String = "(?i)href=\"([^\"]*)\""

  /**
   * Outgoing links per page: decode the html bytes as UTF-8, pull every
   * `href="..."` value ([[HrefPattern]]), and resolve:
   *
   *  - absolute `http(s)://...` hrefs are kept verbatim;
   *  - root-relative `/path` hrefs resolve against the page URL's
   *    lowercased scheme://host (non-default port kept);
   *  - everything else (relative paths, `mailto:`, `javascript:`, empty,
   *    bare-fragment `#...`) is dropped — a crawl frontier can't use them
   *    without a full RFC 3986 resolver, and they are rare link mass.
   *
   * Output: (src_url, dst_url), one row per extracted link occurrence
   * (NOT distinct — link multiplicity is real signal; collapse downstream).
   * Compose [[WebText.canonicalUrl]] over `dst_url` when feeding a crawl
   * frontier; [[hostGraph]] needs no prior canonicalization.
   *
   * Scale: one projection + one explode, all codegen'd regex work, zero
   * shuffles — the 10^12-row scan cost is the regex over the html payload,
   * and the html column is only read here (prune it everywhere else).
   */
  def extractLinks(pages: DataFrame, urlCol: String, htmlCol: String): DataFrame = {
    val src = col(urlCol)
    val scheme = lower(regexp_extract(src, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(src, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val href = col("__href")
    pages
      .select(src.as("src_url"), scheme.as("__scheme"), hostport.as("__hostport"),
        explode(regexp_extract_all(col(htmlCol).cast("string"),
          lit(HrefPattern), lit(1))).as("__href"))
      .withColumn("dst_url",
        when(href.rlike("^[Hh][Tt][Tt][Pp][Ss]?://"), href)
          .when(href.startsWith("/") && col("__scheme") =!= "",
            concat(col("__scheme"), lit("://"), col("__hostport"), href)))
      .filter(col("dst_url").isNotNull)
      .select("src_url", "dst_url")
  }

  /** lowercased host (no port) of a URL column — '' when unparseable. */
  private def hostOf(url: org.apache.spark.sql.Column) =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))

  /**
   * Collapse a link table to the host graph: (src_host, dst_host, n_links)
   * with self-loops and unparseable endpoints dropped. One hash aggregation
   * with map-side partial combine — the (host, host) key space is tiny
   * relative to the link table, so the shuffle carries pre-combined counts.
   */
  def hostGraph(links: DataFrame, srcCol: String, dstCol: String): DataFrame =
    links
      .select(hostOf(col(srcCol)).as("src_host"), hostOf(col(dstCol)).as("dst_host"))
      .filter(col("src_host") =!= "" && col("dst_host") =!= "" &&
        col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host")
      .agg(count(lit(1)).as("n_links"))

  /**
   * Deterministic fixed-point PageRank over a directed edge list, `iters`
   * synchronous iterations:
   *
   *   rank[0]   = scale                                   (per node)
   *   contrib   = rank div outdeg                         (per src)
   *   rank[k+1] = ((100-dampingPct)*scale) div 100
   *             + (dampingPct * sum(contrib over in-edges)) div 100
   *
   * All BIGINT floor divisions on non-negative values — bit-identical in
   * any engine with integer division (DuckDB `//`), unlike float PageRank
   * where reduction order moves the last ulp. Dangling nodes (no
   * out-edges) simply leak their mass, and the (1-d) term is per-node
   * rather than /N — the classic simplifications; ranks are an ORDERING
   * signal, not a probability. Parallel edges collapse first (contribution
   * is per distinct edge).
   *
   * Scale: per iteration, one equi-join of the edge list with the rank
   * table on src (both hash-partitioned on the join key — repartition the
   * edge list by src once caller-side and the shuffle is rank-table-sized)
   * and one map-side-combinable sum by dst. The rank table is |hosts| rows
   * (~10^8 at 10^12 pages — above broadcast size, fine as a shuffle side).
   * Plans grow linearly with `iters`; for iters beyond ~8 localCheckpoint
   * the rank table between rounds (the [[Dedup]] connected-components
   * discipline).
   */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
                         iters: Int = 3, scale: Long = 1000000L,
                         dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100 && scale > 0)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val base = ((100L - dampingPct) * scale) / 100L
    var ranks = nodes.withColumn("rank", lit(scale))
    for (_ <- 1 to iters) {
      val incoming = e
        .join(ranks.join(outdeg, col("host") === col("src"))
          .select(col("host").as("__h"), expr("rank div outdeg").as("contrib")),
          col("src") === col("__h"))
        .groupBy(col("dst").as("host"))
        .agg(sum("contrib").as("inc"))
      ranks = nodes
        .join(incoming, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + expr(s"($dampingPct * coalesce(inc, 0L)) div 100"))
            .as("rank"))
    }
    ranks
  }
}
