package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** Web-text curation filters: Gopher-style repetition stats vs a Scala brute
  * force, PII pass ordering/counting, and benchmark decontamination (copies
  * found, clean docs untouched, broadcast plan). */
class WebTextSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private val corpus: Seq[(Long, String)] = {
    val r = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => s"w$i")
    (0L until 50L).map { i =>
      (i, (0 until (10 + r.nextInt(40))).map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
    }
  }

  private def brute(text: String): (Long, Double, Double, Double) = {
    val ws = text.split(" ", -1)
    def grams(n: Int) = ws.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val g2 = grams(2); val g3 = grams(3)
    val top2 = if (g2.isEmpty) 0.0
      else r4(g2.groupBy(identity).values.map(_.size).max.toDouble / g2.size)
    val dup3 = if (g3.isEmpty) 0.0
      else r4(g3.groupBy(identity).values.filter(_.size > 1).map(_.size).sum.toDouble / g3.size)
    (ws.length.toLong, r4((ws.length - ws.distinct.length).toDouble / ws.length), top2, dup3)
  }

  test("withRepetitionStats == brute force incl. a pathological repeat doc") {
    val docs = (corpus :+ (999L, "spam spam spam spam ham") :+ (998L, "one")).toDF("doc_id", "text")
    val got = WebText.withRepetitionStats(docs, "doc_id", "text")
      .select("doc_id", "n_words", "dup_word_frac", "top2_ratio", "dup3_frac")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val all = corpus :+ (999L, "spam spam spam spam ham") :+ (998L, "one")
    all.foreach { case (id, t) => assert(got(id) == brute(t), s"doc $id: '$t'") }
    // hand doc: top 2-gram 'spam spam' x3 of 4; 3-gram 'spam spam spam' x2 of 3
    assert(got(999L) == ((5L, 0.6, 0.75, 0.6667)))
    assert(got(998L) == ((1L, 0.0, 0.0, 0.0))) // sub-n doc: ratios 0, no null
  }

  test("withPiiRedacted counts and redacts in email -> ip -> phone order") {
    val docs = Seq(
      (1L, "mail me at bob.smith+x@sub.example.org thanks"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +46 70 123 4567 or +1 555 0100"),
      (4L, "admin@10.0.0.1.example.com hides the quad"), // email eats the IP
      (5L, "plain text no pii")).toDF("doc_id", "text")
    val got = WebText.withPiiRedacted(docs, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((1L, 0L, 0L, "mail me at <EMAIL> thanks")))
    assert(got(2L) == ((0L, 2L, 0L, "server <IP> and <IP> up")))
    assert(got(3L) == ((0L, 0L, 2L, "call <PHONE> or <PHONE>")))
    assert(got(4L) == ((1L, 0L, 0L, "<EMAIL> hides the quad")))
    assert(got(5L) == ((0L, 0L, 0L, "plain text no pii")))
  }

  test("contamination finds exact and partial benchmark overlap, skips clean docs") {
    // doc 0's text is the benchmark; doc 100 copies it, doc 101 embeds its
    // first 10 words mid-doc, doc 102 is clean
    val bench = Seq((0L, corpus.head._2)).toDF("doc_id", "text")
    val head10 = corpus.head._2.split(" ").take(10).mkString(" ")
    val docs = (corpus.tail
      :+ (100L, corpus.head._2)
      :+ (101L, s"pad words before $head10 and after padding")
      :+ (102L, "entirely fresh words only here")).toDF("doc_id", "text")
    val got = WebText.contamination(docs, bench, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected100 = corpus.head._2.split(" ").sliding(8).map(_.mkString(" ")).toSeq.distinct.size.toLong
    assert(got.get(100L).contains(expected100))
    assert(got.contains(101L) && got(101L) == 3L) // 10 words -> 3 distinct 8-grams
    assert(!got.contains(102L))
    // random 40-word-vocab docs shouldn't share 8-grams by chance
    assert(got.keySet.forall(k => k == 100L || k == 101L))
  }

  test("contamination respects minOverlap and broadcasts the benchmark side") {
    val bench = Seq((0L, corpus.head._2)).toDF("doc_id", "text")
    val head10 = corpus.head._2.split(" ").take(10).mkString(" ")
    val docs = (corpus.tail :+ (101L, s"x y $head10 z")).toDF("doc_id", "text")
    val strict = WebText.contamination(docs, bench, "doc_id", "text", n = 8, minOverlap = 4L)
    assert(strict.collect().isEmpty) // 101 has only 3 shared 8-grams
    val plan = WebText.contamination(docs, bench, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("canonicalGroups folds case/punct/whitespace variants exact dedup misses") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "The  quick,  BROWN fox!!"),   // same after canonicalization
      (3L, "  the quick brown fox  "),    // whitespace-only variant
      (4L, "an entirely different doc"),
      (5L, "thequick brown fox")).toDF("doc_id", "text") // NOT the same
    val exact = Dedup.exactGroups(docs, "doc_id", "text").collect()
    assert(exact.isEmpty) // plain exact dedup sees 5 distinct texts
    val got = WebText.canonicalGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((3L, 1L))) // docs 1,2,3 fold; 4 and 5 stay out
  }

  test("tfidfTopTerms == brute force with integer-only rank order") {
    val docs = corpus.toDF("doc_id", "text")
    val n = corpus.size
    val dfMap = corpus.flatMap(_._2.split(" ").distinct).groupBy(identity)
      .map { case (wrd, xs) => (wrd, xs.size) }
    val expected = corpus.flatMap { case (id, t) =>
      val ws = t.split(" ")
      ws.groupBy(identity).map { case (wrd, xs) => (wrd, xs.size) }.toSeq
        .map { case (wrd, c) => (wrd, c.toLong, dfMap(wrd).toLong,
          BigDecimal(c.toDouble * n / (ws.length.toDouble * dfMap(wrd)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (wrd, c, df, _) => (-c, df, wrd) }
        .take(3).zipWithIndex
        .map { case ((wrd, c, df, s), i) => (id, wrd, c, df, s, i + 1) }
    }.toSet
    val got = WebText.tfidfTopTerms(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getInt(5))).toSet
    assert(got == expected)
  }

  test("composition rolls up every level with correct gid bits") {
    val docs = Seq(
      (1L, "a b c", "en", "s1"), (2L, "d e", "en", "s2"),
      (3L, "f g h i", "sv", "s1")).toDF("doc_id", "text", "lang", "source")
    val got = WebText.composition(docs, Seq("lang", "source"), "text")
      .collect().map(r => ((Option(r.getString(0)), Option(r.getString(1))),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got((Some("en"), Some("s1"))) == ((0L, 1L, 3L, 3.0)))
    assert(got((Some("en"), None)) == ((1L, 2L, 5L, 2.5)))
    assert(got((Some("sv"), None)) == ((1L, 1L, 4L, 4.0)))
    assert(got((None, None)) == ((3L, 3L, 9L, 3.0)))
    assert(got.size == 6) // 3 leaf + 2 lang + 1 total
  }

  test("chunkDocs == brute-force strided windows; zero-overlap chunks rebuild the doc") {
    val docs = corpus.toDF("doc_id", "text")
    val got = WebText.chunkDocs(docs, "doc_id", "text", chunkWords = 20, overlapWords = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toSet
    val expected = corpus.flatMap { case (id, t) =>
      val ws = t.split(" ")
      (1 to ws.length by 15).zipWithIndex.map { case (s, i) =>
        val cws = ws.slice(s - 1, math.min(s - 1 + 20, ws.length))
        (id, i.toLong, s.toLong, cws.length.toLong, cws.mkString(" "))
      }
    }.toSet
    assert(got == expected)
    // lossless property: stride == chunkWords reassembles every doc exactly
    val rebuilt = WebText.chunkDocs(docs, "doc_id", "text", chunkWords = 7)
      .groupBy("doc_id")
      .agg(concat_ws(" ", sort_array(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
        .getField("chunk_text")).as("t2"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    corpus.foreach { case (id, t) => assert(rebuilt(id) == t, s"doc $id") }
    intercept[IllegalArgumentException] {
      WebText.chunkDocs(docs, "doc_id", "text", chunkWords = 5, overlapWords = 5)
    }
  }

  test("approx_count_distinct stays within 10% of exact on a 20k-value column") {
    val df = spark.range(0L, 60000L)
      .selectExpr("concat('w', cast(id % 20000 as string)) as word")
    val r = df.agg(countDistinct(col("word")).as("exact"),
      approx_count_distinct(col("word")).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(exact == 20000L)
    assert(math.abs(approx - exact).toDouble / exact < 0.1, s"approx=$approx")
  }

  test("valueQuantiles == brute-force nearest rank; histogram window, no row sort") {
    val r = new scala.util.Random(5)
    val vals = (0 until 300).map(i => (if (i % 2 == 0) "a" else "b", r.nextInt(40).toLong))
    val docs = vals.toDF("lang", "n_chars")
    val ps = Seq(10, 50, 90, 100)
    val got = WebText.valueQuantiles(docs, "lang", "n_chars", ps)
      .collect().map(r0 => ((r0.getString(0), r0.getInt(1)),
        (r0.getLong(2), r0.getLong(3)))).toMap
    for (g <- Seq("a", "b"); p <- ps) {
      val sorted = vals.filter(_._1 == g).map(_._2).sorted
      val rank = (p * sorted.size + 99) / 100 // == ceil in integer math
      assert(got((g, p)) == ((sorted.size.toLong, sorted(rank - 1))),
        s"group $g p$p")
    }
    // one result row per (group, percent) even with heavy value ties
    assert(got.size == 2 * ps.size)
  }

  test("curationFilter reasons fire in fixed order; kept docs have null reason") {
    val docs = Seq(
      (1L, "a b"),                                              // too_short
      (2L, (1 to 25).map(i => s"w$i").mkString(" ")),           // too_long (max 20)
      (3L, "12 34 56 78 90 11 22 33 44 55 66 77"),              // low_alpha
      (4L, (1 to 12).map(i => f"verylongwordnumber$i%02dpadpad").mkString(" ")), // token_len
      (5L, "ab cd ab cd ab cd ab cd ab cd"),                    // dup_words (0.8)
      (6L, "ab cd ab cd ef gh ij kl mn op"),                    // top_2gram (2/9 > 0.2)
      (7L, "ab cd ef ab cd ef gh ij kl mn op qr st uv wx yz aa bb"), // dup_3gram (2/16 > 0.1)
      (8L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")) // keep
      .toDF("doc_id", "text")
    val got = WebText.curationFilter(docs, "doc_id", "text",
        maxWords = 20, maxTop2Ratio = 0.2, maxDup3Frac = 0.1)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.getString(2))))).toMap
    assert(got(1L) == ((false, Some("too_short"))))
    assert(got(2L) == ((false, Some("too_long"))))
    assert(got(3L) == ((false, Some("low_alpha"))))
    assert(got(4L) == ((false, Some("token_len"))))
    assert(got(5L) == ((false, Some("dup_words"))))
    assert(got(6L) == ((false, Some("top_2gram"))))
    assert(got(7L) == ((false, Some("dup_3gram"))))
    assert(got(8L) == ((true, None)))
  }

  test("valueQuantiles drops null values; null group keys keep their stream") {
    val docs = Seq((Some("a"), Some(1L)), (Some("a"), Some(2L)), (Some("a"), None),
        (None, Some(7L))).toDF("lang", "n_chars")
    val got = WebText.valueQuantiles(docs, "lang", "n_chars", Seq(100))
      .collect().map(r => (Option(r.getString(0)), r.getLong(2), r.getLong(3))).toSet
    // group a: n=2 (null value excluded), p100 -> 2; null group: its own row
    assert(got == Set((Some("a"), 2L, 2L), (None, 1L, 7L)))
  }

  /** brute-force duplicate-substring spans: global n-gram counts, mark
    * windows, merge on overlap per doc */
  private def bruteSpans(docs: Seq[(Long, String)], n: Int)
      : Set[(Long, Long, Long, Long)] = {
    val occ = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      if (ws.length < n) Nil
      else ws.sliding(n).zipWithIndex.map { case (g, i) => (id, i + 1, g.mkString(" ")) }
    }
    val hot = occ.groupBy(_._3).filter(_._2.size >= 2).keySet
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    occ.filter(o => hot(o._3)).groupBy(_._1).foreach { case (id, os) =>
      var spanId = 0L; var start = -1L; var end = -1L
      os.map(_._2.toLong).sorted.foreach { p =>
        if (start < 0 || p > end) {
          if (start >= 0) out += ((id, spanId, start, end))
          spanId += 1; start = p; end = p + n - 1
        } else end = math.max(end, p + n - 1)
      }
      if (start >= 0) out += ((id, spanId, start, end))
    }
    out.toSet
  }

  test("duplicateSpans == brute force; hashGrams fast path identical") {
    // corpus with engineered repeats: doc 100 repeats a doc-0 8-gram run
    // mid-text; doc 101 is a full copy of doc 1; doc 102 repeats its own
    // opening phrase at the end (within-doc duplication)
    val base = corpus.take(20)
    val d0ws = base.head._2.split(" ").take(12).mkString(" ")
    val docs = base ++ Seq(
      (100L, s"x0 x1 x2 x3 $d0ws y0 y1 y2"),
      (101L, base(1)._2),
      (102L, "p0 p1 p2 p3 p4 p5 p6 p7 mid1 mid2 p0 p1 p2 p3 p4 p5 p6 p7"))
    val df = docs.toDF("doc_id", "text")
    val got = WebText.duplicateSpans(df, "doc_id", "text", minLen = 8,
        minOccurrences = 2, hashGrams = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == bruteSpans(docs, 8))
    assert(got.exists(_._1 == 100L) && got.exists(_._1 == 102L))
    // doc 102: its two copies of the 8-word phrase are two separate spans
    assert(got.count(_._1 == 102L) == 2)
    val hashed = WebText.duplicateSpans(df, "doc_id", "text", minLen = 8,
        minOccurrences = 2, hashGrams = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(hashed == got)
  }

  test("domainCap ranks within domain and flags kept; every row survives") {
    val docs = Seq(
      (1L, "a.com", 100L), (2L, "a.com", 300L), (3L, "a.com", 200L),
      (4L, "b.org", 50L), (5L, "a.com", 300L)) // tie on quality -> id order
      .toDF("doc_id", "source", "n_chars")
    val got = WebText.domainCap(docs, "doc_id", "source",
        Seq(col("n_chars").desc, col("doc_id").asc), maxPerDomain = 2)
      .select("doc_id", "domain_rank", "kept")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.size == 5) // audit output keeps every row
    assert(got(2L) == ((1L, true)))  // 300 chars, lower id than 5
    assert(got(5L) == ((2L, true)))
    assert(got(3L) == ((3L, false)))
    assert(got(1L) == ((4L, false)))
    assert(got(4L) == ((1L, true)))
  }

  test("canonicalUrl folds case/port/fragment/tracking/param-order; unparseable passes through") {
    val cases = Seq(
      // scheme+host case, default port, fragment
      "HTTP://WWW.Example.COM:80/a/b#frag" -> "http://www.example.com/a/b",
      "https://example.com:443/x" -> "https://example.com/x",
      // non-default port survives
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      // tracking params die, survivors sort, empty path -> /
      "http://example.com?utm_source=tw&b=2&a=1" -> "http://example.com/?a=1&b=2",
      "http://example.com/?a=1&b=2" -> "http://example.com/?a=1&b=2",
      "http://example.com/?b=2&a=1&fbclid=xyz&gclid=1&ref=hn" -> "http://example.com/?a=1&b=2",
      // all params tracking -> no '?'
      "http://example.com/p?utm_campaign=x" -> "http://example.com/p",
      // utm must be a PARAM NAME, not a value or substring
      "http://example.com/?q=utm_source" -> "http://example.com/?q=utm_source",
      "http://example.com/?xutm_a=1" -> "http://example.com/?xutm_a=1",
      // empty query / lone '?' -> dropped
      "http://example.com/p?" -> "http://example.com/p",
      // no scheme: pass through untouched
      "not a url at all" -> "not a url at all",
      "www.example.com/x" -> "www.example.com/x")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), WebText.canonicalUrl(col("url")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) => assert(got(in) == want, s"url: $in") }
  }

  test("urlDedup keeps the latest crawl per canonical url; audit rows survive") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val pages = Seq(
      (1L, "http://A.com/p?utm_source=x", ts("2026-01-01 00:00:00")),
      (2L, "http://a.com/p", ts("2026-03-01 00:00:00")), // newest -> kept
      (3L, "http://a.com:80/p#frag", ts("2026-02-01 00:00:00")),
      (4L, "http://b.com/q", ts("2026-01-01 00:00:00")), // singleton -> kept
      // same ts tie -> url ASC wins
      (5L, "http://c.com/r?z=1", ts("2026-01-01 00:00:00")),
      (6L, "http://c.com/r?z=1&utm_x=1", ts("2026-01-01 00:00:00")))
      .toDF("doc_id", "url", "warc_ts")
    val got = WebText.urlDedup(pages, "url", "warc_ts")
      .select("doc_id", "canon_url", "crawl_rank", "kept")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size == 6)
    assert(got(2L) == (("http://a.com/p", 1L, true)))
    assert(got(3L) == (("http://a.com/p", 2L, false)))
    assert(got(1L) == (("http://a.com/p", 3L, false)))
    assert(got(4L) == (("http://b.com/q", 1L, true)))
    assert(got(5L) == (("http://c.com/r?z=1", 1L, true))) // shorter url sorts first
    assert(got(6L) == (("http://c.com/r?z=1", 2L, false)))
  }

  test("lineDedup == brute force; empty lines kept; all-boilerplate doc survives empty; hash path identical") {
    val banner = "ACCEPT COOKIES"
    val nav = "home | about | contact"
    val docs = Seq(
      (1L, s"$banner\n$nav\nunique body one\n\ndoc one footer"),
      (2L, s"$banner\n$nav\nanother body"),
      (3L, s"$banner\n  $nav  \nthird body"), // trim variant still counts
      (4L, s"$banner\n$nav"),                 // all lines boilerplate
      (5L, "standalone doc\n\n\nwith blanks"), // blanks never removed
      (6L, s"no boilerplate here\n$banner"))   // banner in 5 docs total
      .toDF("doc_id", "text")
    def run(hash: Boolean) =
      WebText.lineDedup(docs, "doc_id", "text", minDocs = 3, hashLines = hash)
        .select("doc_id", "clean_text", "n_lines", "n_removed")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val got = run(hash = true)
    assert(got == run(hash = false)) // exact twin identical on real fixtures
    // banner appears in docs 1,2,3,4,6 (5 >= 3 -> hot); nav in 1,2,3,4 via trim
    assert(got(1L) == (("unique body one\n\ndoc one footer", 5L, 2L)))
    assert(got(2L) == (("another body", 3L, 2L)))
    assert(got(3L) == (("third body", 3L, 2L))) // '  nav  ' removed by trimmed key
    assert(got(4L) == (("", 2L, 2L)))           // doc survives with empty text
    assert(got(5L) == (("standalone doc\n\n\nwith blanks", 4L, 0L)))
    assert(got(6L) == (("no boilerplate here", 2L, 1L)))
  }

  test("c4LineFilter: line rules, drop-reason order, quote-after-period, no empty-token words") {
    val docs = Seq(
      // kept, too-short, kept, unpunctuated -> n_kept=2 -> keep
      (1L, "A perfectly fine sentence with enough words here.\nShort one.\n" +
        "Another good long sentence that also ends properly!\n" +
        "no terminal punctuation on this long line at all"),
      // javascript line dropped despite length+punct -> 1 kept -> too few
      (2L, "Please enable JavaScript to view this excellent content today.\n" +
        "Only good sentence in here with enough words."),
      (3L, "This document mentions lorem ipsum somewhere in the body text.\n" +
        "Another adequately long sentence to keep the count up."),
      (4L, "A sentence with a brace { inside should drop the document.\n" +
        "Second adequately long sentence for the kept line count."),
      // quote-after-period kept; 'four  real words here.' has 5 space-split
      // tokens but only 4 non-empty words -> dropped
      (5L, "He finished with a quoted ending \"exactly like this.\"\n" +
        "Double  spaced   words do not inflate the real word count.\n" +
        "four  real words here."),
      // lorem beats brace when both present; case-insensitive match
      (6L, "Lorem Ipsum with a brace { present still reports lorem first.\n" +
        "Another adequately long sentence to keep the count up."))
      .toDF("doc_id", "text")
    val got = WebText.c4LineFilter(docs, "doc_id", "text",
      minLineWords = 5, minKeptLines = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3),
          Option(r.getString(4)), r.getString(5)))).toMap
    assert(got(1L) == ((4L, 2L, true, None,
      "A perfectly fine sentence with enough words here.\n" +
      "Another good long sentence that also ends properly!")))
    assert(got(2L) == ((2L, 1L, false, Some("too_few_sentences"),
      "Only good sentence in here with enough words.")))
    assert(got(3L)._3 == false && got(3L)._4 == Some("lorem_ipsum"))
    assert(got(4L)._3 == false && got(4L)._4 == Some("brace"))
    assert(got(5L) == ((3L, 2L, true, None,
      "He finished with a quoted ending \"exactly like this.\"\n" +
      "Double  spaced   words do not inflate the real word count.")))
    assert(got(6L)._4 == Some("lorem_ipsum")) // precedence over brace
  }

  test("htmlMeta: title trim + case, attr-order-robust canonical, nested markup -> ''") {
    val pages = Seq(
      ("http://a/1",
       "<head><TITLE> Padded Title </TITLE><meta charset=\"UTF-8\">" +
       "<meta name=\"description\" content=\"desc one\">" +
       "<link href=\"http://a/c\" rel=\"canonical\"></head>"),
      ("http://a/2", "<head><title><b>nested</b></title></head>"),
      ("http://a/3", "<head>no metadata at all</head>"))
      .toDF("url", "html").withColumn("html", col("html").cast("binary"))
    val got = WebText.htmlMeta(pages, "url", "html")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))).toMap
    assert(got("http://a/1") == (("Padded Title", "desc one", "utf-8", true)))
    assert(got("http://a/2") == (("", "", "", false))) // nested markup no match
    assert(got("http://a/3") == (("", "", "", false)))
  }

  test("crawlDelta: new / changed / unchanged on mixed per-url histories") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val pages = Seq(
      // A: x -> y -> y : latest equals previous -> unchanged
      ("http://a/p", ts("2026-01-01 00:00:00"), "x"),
      ("http://a/p", ts("2026-01-02 00:00:00"), "y"),
      ("http://a/p", ts("2026-01-03 00:00:00"), "y"),
      // B: x -> y : changed
      ("http://b/p", ts("2026-01-01 00:00:00"), "x"),
      ("http://b/p", ts("2026-01-05 00:00:00"), "y"),
      // C: single crawl -> new
      ("http://c/p", ts("2026-02-01 00:00:00"), "only"))
      .toDF("url", "warc_ts", "text")
    val got = WebText.crawlDelta(pages, "url", "warc_ts", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getTimestamp(2), r.getTimestamp(3), r.getString(4)))).toMap
    assert(got("http://a/p") ==
      ((3L, ts("2026-01-01 00:00:00"), ts("2026-01-03 00:00:00"), "unchanged")))
    assert(got("http://b/p") ==
      ((2L, ts("2026-01-01 00:00:00"), ts("2026-01-05 00:00:00"), "changed")))
    assert(got("http://c/p") ==
      ((1L, ts("2026-02-01 00:00:00"), ts("2026-02-01 00:00:00"), "new")))
  }

  test("crawlDelta: same-timestamp captures order by text ASC (pinned tiebreak)") {
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val pages = Seq(
      ("http://t/p", ts, "bbb"), ("http://t/p", ts, "aaa"), // latest = 'bbb'
      ("http://u/p", ts, "same"), ("http://u/p", ts, "same"))
      .toDF("url", "warc_ts", "text")
    val got = WebText.crawlDelta(pages, "url", "warc_ts", "text")
      .collect().map(r => r.getString(0) -> r.getString(4)).toMap
    assert(got == Map("http://t/p" -> "changed", "http://u/p" -> "unchanged"))
  }

  private def extract(html: String): String = {
    val p = Seq(("http://x/", html)).toDF("url", "html")
      .withColumn("html", col("html").cast("binary"))
    WebText.extractText(p, "url", "html").collect()(0).getString(1)
  }

  test("extractText: script/style/comment bodies die, block tags break, inline tags join") {
    val html = "<html><head><script type=\"t\">var x = '<p>fake</p>';\nalert(1);" +
      "</script><style media=\"a\">body { color: red; }</style></head>" +
      "<body><!-- hidden\ncomment --><div class=\"c\"><h1>Title</h1>" +
      "<p>Para <b>on</b>e \t with  spaces</p></div></body></html>"
    assert(extract(html) == "Title\nPara one with spaces")
  }

  test("extractText: entities decode once, &amp; last (&amp;amp; -> &amp;)") {
    assert(extract("<p>A &amp;amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39; N&nbsp;B</p>") ==
      "A &amp; B <x> \"q\" 's' N B")
  }

  test("extractText: unclosed tag keeps its literal text; n_chars counts the result") {
    val p = Seq(("http://x/", "before <span after")).toDF("url", "html")
      .withColumn("html", col("html").cast("binary"))
    val r = WebText.extractText(p, "url", "html").collect()(0)
    assert(r.getString(1) == "before <span after")
    assert(r.getLong(2) == "before <span after".length.toLong)
  }

  test("contentBlocks: density drops nav/footer, keeps prose; boundary cross-multiply exact") {
    val html = "<div><a href=\"/\">Home</a> <a href=\"/x\">News now</a></div>" + // 13 text, 13 link
      "<p>plain prose paragraph long enough to pass the length bar</p>" +
      "<p><b>bo</b>ld <a href=\"/y\">li<i>n</i>k text</a> and more words here padd</p>" +
      "<p></p><p>   </p>"
    val p = Seq(("u", html)).toDF("url", "html").withColumn("html", col("html").cast("binary"))
    val rows = WebText.contentBlocks(p, "url", "html", minBlockChars = 13, maxLinkDensityPct = 30)
      .orderBy("block_idx").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.length === 3) // empty/whitespace-only blocks dropped
    // block 1: "Home News now" 13 chars, link 4+8=12 -> 1200 > 390 dropped
    assert(rows(0) === ((1L, "Home News now", 13L, 12L, false)))
    assert(rows(1)._2 === "plain prose paragraph long enough to pass the length bar")
    assert(rows(1)._4 === 0L); assert(rows(1)._5)
    // inner markup inside the anchor body is stripped before counting
    assert(rows(2)._2 === "bold link text and more words here padd")
    assert(rows(2)._4 === "link text".length.toLong)
    // 9*100 = 900 <= 39*30 = 1170 -> kept; at pct 22 it would flip (858 < 900)
    assert(rows(2)._5)
    val tight = WebText.contentBlocks(p, "url", "html", 13, 22).orderBy("block_idx").collect()
    assert(!tight(2).getBoolean(5))
  }

  test("mainContent: kept blocks joined in order; all-boilerplate page yields empty content") {
    val boiler = "<div><a href=\"/a\">only links in this page body</a></div>"
    val mixed = "<p>first kept paragraph with enough characters</p>" +
      "<div><a href=\"/\">Nav Nav Nav Nav Nav Nav Nav</a></div>" +
      "<p>second kept paragraph also long enough yes</p>"
    val p = Seq(("b", boiler), ("m", mixed)).toDF("url", "html")
      .withColumn("html", col("html").cast("binary"))
    val got = WebText.mainContent(p, "url", "html", 20, 30).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("b") === (("", 1L, 0L)))
    assert(got("m") === (("first kept paragraph with enough characters\n" +
      "second kept paragraph also long enough yes", 3L, 2L)))
  }

  /** brute-force bloom decision with the same polynomial family. */
  private def bruteBloom(corpus: Seq[(Long, String)], bench: Seq[String],
                         n: Int, numBits: Long, k: Int): Map[Long, (Long, Long)] = {
    val P1 = Dedup.PortableHash.P1
    def digest(s: String): Long = s.foldLeft(0L)((a, c) => (a * 131L + c.toInt) % P1)
    def positions(s: String): Seq[Long] =
      (0 until k).map(j => ((37L + 2L * j) * digest(s) + (1000003L * j + 17L)) % P1 % numBits)
    def sh(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length < n) Set.empty else ws.sliding(n).map(_.mkString(" ")).toSet
    }
    val benchSh = bench.flatMap(sh).toSet
    val bits = benchSh.flatMap(positions)
    corpus.flatMap { case (id, t) =>
      val pos = sh(t).filter(s => positions(s).forall(bits.contains))
      if (pos.isEmpty) None
      else Some(id -> ((pos.size.toLong, pos.count(benchSh.contains).toLong)))
    }.toMap
  }

  test("bloomContamination == brute force; no false negatives; FPs flagged uncontaminated") {
    val r = new scala.util.Random(23)
    val vocab = (0 until 60).map(i => s"v$i")
    val corpus = (0L until 80L).map { i =>
      (i, (0 until (6 + r.nextInt(30))).map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
    }
    // benchmark copies 10 corpus docs verbatim plus fresh text
    val bench = corpus.filter(_._1 % 8 == 0).map(_._2) :+
      (0 until 40).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
    // tiny filter saturates -> false positives are certain; exact leg must clear them
    val got = WebText.bloomContamination(
      corpus.toDF("doc_id", "text"), bench.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), "doc_id", "text",
      n = 4, numBits = 512, numHashes = 3)
      .collect().map(row => row.getLong(0) ->
        ((row.getLong(1), row.getLong(2), row.getBoolean(3)))).toMap
    val want = bruteBloom(corpus, bench, n = 4, numBits = 512L, k = 3)
    assert(got.view.mapValues(v => (v._1, v._2)).toMap === want)
    // copied docs must be contaminated (bloom has no false negatives)
    corpus.filter(_._1 % 8 == 0).foreach { case (id, _) =>
      assert(got(id)._3, s"copied doc $id not flagged")
    }
    got.foreach { case (id, (nb, ne, c)) =>
      assert(nb >= ne); assert(c === (ne >= 1L))
    }
    // saturation check: at 512 bits some bloom-positive-but-clean rows exist
    assert(got.values.exists(v => v._2 == 0L && !v._3),
      "fixture produced no false positives - shrink numBits")
  }

  test("crawlChurn: latest-two diff, blank/dup lines structural, single-crawl excluded") {
    val crawls = Seq(
      // u1: 3 crawls — only the two LATEST (ts 30, 20) are diffed
      ("u1", 10L, "old only\nx"),
      ("u1", 20L, "a\nb\nc"),
      ("u1", 30L, "a\nc\nd\ne"),          // added d,e; removed b; common a,c
      // u2: identical modulo blank lines + duplicate lines + padding -> churn 0
      ("u2", 1L, "k\n\nk\n  v  "),
      ("u2", 2L, "v\nk"),
      // u3: complete rewrite -> churn 100
      ("u3", 1L, "one\ntwo"),
      ("u3", 2L, "three"),
      // u4: single crawl -> excluded
      ("u4", 5L, "whatever")).toDF("url", "ts", "text")
    val got = WebText.crawlChurn(crawls, "url", "ts", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "u1" -> ((2L, 1L, 2L, 60L)),   // (100*3) div 5
      "u2" -> ((0L, 0L, 2L, 0L)),
      "u3" -> ((1L, 2L, 0L, 100L))))
  }

  test("bannedWords: word-boundary runs, counts, min pick, threshold, clean docs") {
    val docs = Seq(
      (1L, "the Class of classes"),       // 'ass' inside runs never matches
      (2L, "ass kicked, ASS! twice bad"), // 2 hits of ass + 1 bad = 3 > maxHits
      (3L, "one bad word"),               // 1 hit <= maxHits -> kept
      (4L, "perfectly clean text"),
      (5L, "bad ass zzz"))                // first_banned = 'ass' (bytewise min)
      .toDF("doc_id", "text")
    val banned = Seq("ass", "bad").toDF("w")
    val got = WebText.bannedWords(docs, "doc_id", "text", banned, "w", maxHits = 1L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3)), r.getBoolean(4)))).toMap
    assert(got == Map(
      1L -> ((0L, 0L, None, true)),
      2L -> ((3L, 2L, Some("ass"), false)),
      3L -> ((1L, 1L, Some("bad"), true)),
      4L -> ((0L, 0L, None, true)),
      5L -> ((2L, 2L, Some("ass"), false))))
  }
}
