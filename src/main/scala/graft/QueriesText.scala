package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis, WebText}

/**
 * Training-data pipeline operators (dedup / similarity / text analysis /
 * multimodal) over the driver's `documents` and `embeddings` tables.
 * Hash-based methods (minhash/simhash/LSH-ANN/fingerprint) have no
 * SQL-expressible oracle -> rows-only gate; everything else is DuckDB-checked.
 */
object QueriesText {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** corpus with injected exact duplicates (doc_id%10==0 re-keyed +1e6) —
    * reproduced verbatim in the oracle so groups are non-trivial. */
  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select("doc_id", "text")
    d.unionByName(d.filter(pmod(col("doc_id"), lit(10L)) === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** corpus with deterministic PII appendices (emails on %7, dotted quads on
    * %11, +-format phones on %13) — reproduced verbatim in the oracle so the
    * redaction counts are non-trivial and multi-kind docs exist (%77 etc). */
  private def piiCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), concat(col("text"),
      when(pmod(col("doc_id"), lit(7L)) === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now"))).otherwise(""),
      when(pmod(col("doc_id"), lit(11L)) === 0,
        concat(lit(" from 10."), pmod(col("doc_id"), lit(250L)).cast("string"),
          lit(".0."), pmod(col("doc_id"), lit(200L)).cast("string"),
          lit(" port"))).otherwise(""),
      when(pmod(col("doc_id"), lit(13L)) === 0,
        lit(" call +46 70 123 4567 today")).otherwise("")).as("text"))

  /** Common-Crawl-style pages (url, warc_ts) synthesized from doc_id —
    * reproduced verbatim in the q_txt_urldedup oracle. See the gate entry
    * for the variant classes each modulus creates. */
  private def urlCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      concat(
        when(pmod(col("doc_id"), lit(7L)) === 0, "HTTP").otherwise("http"),
        lit("://"),
        when(pmod(col("doc_id"), lit(3L)) === 0, "Example.COM").otherwise("example.com"),
        when(pmod(col("doc_id"), lit(4L)) === 0, ":80")
          .when(pmod(col("doc_id"), lit(4L)) === 1, ":8080").otherwise(""),
        lit("/page/"), pmod(col("doc_id"), lit(50L)).cast("string"),
        when(pmod(col("doc_id"), lit(3L)) === 0, "?utm_source=x&b=2&a=1")
          .when(pmod(col("doc_id"), lit(3L)) === 1, "?a=1&b=2")
          .otherwise("?b=2&a=1"),
        when(pmod(col("doc_id"), lit(5L)) === 0, "#frag").otherwise("")).as("url"),
      timestamp_seconds(lit(1767225600L) + col("doc_id") * lit(37L)).as("warc_ts"))

  /** line-structured docs: shared banner + footer variants + an empty line
    * + the doc body + a unique tail — reproduced verbatim in the
    * q_txt_linededup oracle. */
  private def lineCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), concat(
      lit("ACCEPT COOKIES banner\n"),
      when(pmod(col("doc_id"), lit(4L)) === 0,
        concat(lit("promo footer "), pmod(col("doc_id"), lit(3L)).cast("string"),
          lit("\n"))).otherwise(""),
      when(pmod(col("doc_id"), lit(5L)) === 0, "\n").otherwise(""),
      col("text"),
      lit("\ndoc "), col("doc_id").cast("string"), lit(" tail")).as("text"))

  /** C4 line-filter corpus: every doc opens with a kept sentence; %3 adds a
    * too-short line, %4 a javascript-boilerplate line (9 words, ends '.' —
    * only the javascript rule drops it), %5 a long unpunctuated line, %6 a
    * second kept sentence, %7 a quote-after-period sentence (the closing-"
    * class of [[graft.operators.WebText.TerminalPunctPattern]]); the raw
    * doc body never ends in punctuation (driver corpus is bare words) so it
    * is always a dropped line; %11 appends lorem ipsum (mixed case on %2 —
    * case-insensitivity), %13 a braced code line; %143 docs carry both (the
    * lorem-first precedence). Reproduced verbatim in the q_txt_c4filter
    * oracle. */
  private def c4Corpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), concat(
      lit("This is a good first sentence for document "),
      col("doc_id").cast("string"), lit(".\n"),
      when(pmod(col("doc_id"), lit(3L)) === 0, "Too short.\n").otherwise(""),
      when(pmod(col("doc_id"), lit(4L)) === 0,
        "Please enable JavaScript to view the comments powered here.\n")
        .otherwise(""),
      when(pmod(col("doc_id"), lit(5L)) === 0,
        "this line has plenty of words but no terminal punctuation\n")
        .otherwise(""),
      when(pmod(col("doc_id"), lit(6L)) === 0,
        "Another complete sentence that should survive the filter!\n")
        .otherwise(""),
      when(pmod(col("doc_id"), lit(7L)) === 0,
        "He said the quote ends after the period \"just like this.\"\n")
        .otherwise(""),
      col("text"),
      when(pmod(col("doc_id"), lit(11L)) === 0,
        when(pmod(col("doc_id"), lit(2L)) === 0, "\nLorem Ipsum dolor sit amet.")
          .otherwise("\nlorem ipsum dolor sit amet.")).otherwise(""),
      when(pmod(col("doc_id"), lit(13L)) === 0,
        "\nif (x) { return window.top; }").otherwise("")).as("text"))

  /** re-crawl corpus for crawlDelta: %9 docs get a unique /solo/ url (one
    * crawl → 'new'); the rest share /p/(doc_id%120) — 120 is even, so group
    * members share parity and the %2 text rule makes whole groups stable
    * ('unchanged') or per-crawl-unique ('changed'). warc_ts strictly
    * increases with doc_id → the latest crawl is the max doc_id. Reproduced
    * verbatim in the q_txt_crawldelta oracle; mixed-history groups and the
    * same-timestamp tiebreak live in WebTextSpec. */
  private def recrawlCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      when(pmod(col("doc_id"), lit(9L)) === 0,
        concat(lit("http://ex.com/solo/"), col("doc_id").cast("string")))
        .otherwise(concat(lit("http://ex.com/p/"),
          pmod(col("doc_id"), lit(120L)).cast("string"))).as("url"),
      timestamp_seconds(lit(1767225600L) + col("doc_id") * lit(37L)).as("warc_ts"),
      when(pmod(col("doc_id"), lit(2L)) === 0,
        concat(lit("stable "), pmod(col("doc_id"), lit(120L)).cast("string")))
        .otherwise(concat(lit("rev "), col("doc_id").cast("string"))).as("text"))

  /** inverted-index corpus: 'the' in every doc (df > cap → postings NULL),
    * an a-term (df ≈ n/97) carried 3× on even ids / 2× on odd (tf ordering
    * + doc_id tiebreak), a b-term (df ≈ n/13), a unique u-term on %5 docs
    * (df = 1), and a double space on %4 docs (empty-token filter).
    * Reproduced verbatim in the q_txt_invindex oracle. */
  private def indexCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), concat(
      lit("the a"), pmod(col("doc_id"), lit(97L)).cast("string"),
      when(pmod(col("doc_id"), lit(4L)) === 0, "  ").otherwise(" "),
      lit("a"), pmod(col("doc_id"), lit(97L)).cast("string"),
      when(pmod(col("doc_id"), lit(2L)) === 0,
        concat(lit(" a"), pmod(col("doc_id"), lit(97L)).cast("string"))).otherwise(""),
      lit(" b"), pmod(col("doc_id"), lit(13L)).cast("string"),
      when(pmod(col("doc_id"), lit(5L)) === 0,
        concat(lit(" u"), col("doc_id").cast("string"))).otherwise("")).as("text"))

  /** html-metadata corpus: %2 titled (padded — trim exercised), %5 of those
    * nested-markup titles (no match → ''), %3 meta description, %4 charset
    * (mixed case — lowercasing), %7 canonical link. Reproduced verbatim in
    * the q_txt_htmlmeta oracle. */
  private def metaCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("http://m.example/p/"), col("doc_id").cast("string")).as("url"),
      concat(
        lit("<html><head>"),
        when(pmod(col("doc_id"), lit(2L)) === 0,
          when(pmod(col("doc_id"), lit(5L)) === 0,
            concat(lit("<title><b>Doc "), col("doc_id").cast("string"),
              lit("</b></title>")))
            .otherwise(concat(lit("<TITLE> Doc "), col("doc_id").cast("string"),
              lit(" </TITLE>")))).otherwise(""),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          concat(lit("<meta name=\"description\" content=\"About doc "),
            col("doc_id").cast("string"), lit("\">"))).otherwise(""),
        when(pmod(col("doc_id"), lit(4L)) === 0,
          "<meta charset=\"UTF-8\">").otherwise(""),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          concat(lit("<link href=\"http://m.example/c/"),
            col("doc_id").cast("string"),
            lit("\" rel=\"canonical\">"))).otherwise(""),
        lit("</head><body>x</body></html>")).cast("binary").as("html"))

  /** html-extraction corpus: %2 script block (single-quoted fake markup in
    * the body — must vanish WITH the tags, multiline), %3 style block,
    * %5 multiline comment, %7 entity paragraph (incl. `&amp;amp;` — the
    * single-pass decode order case), always an h1 + a tab/multi-space
    * paragraph with inline markup splitting a word. Reproduced verbatim in
    * the q_txt_extract oracle. */
  private def extractCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("http://t.example/d/"), col("doc_id").cast("string")).as("url"),
      concat(
        lit("<html><head>"),
        when(pmod(col("doc_id"), lit(2L)) === 0,
          lit("<script type=\"text/javascript\">var x = '<p>not text</p>';\nalert(1);</script>"))
          .otherwise(""),
        when(pmod(col("doc_id"), lit(3L)) === 0,
          lit("<style media=\"all\">body { color: red; }</style>")).otherwise(""),
        lit("</head><body>"),
        when(pmod(col("doc_id"), lit(5L)) === 0, lit("<!-- hidden\ncomment -->"))
          .otherwise(""),
        lit("<div class=\"c\"><h1>Doc "), col("doc_id").cast("string"), lit("</h1>"),
        lit("<p>Para <b>on</b>e \t with  spaces</p>"),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          lit("<p>A &amp;amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39; N&nbsp;B</p>"))
          .otherwise(""),
        lit("</div></body></html>")).cast("binary").as("html"))

  /** block-scoring corpus: every page carries a pure-link nav div (dropped:
    * density), one long prose paragraph (kept), and a link-pipe footer div
    * (dropped: density); %3 adds a too-short paragraph (dropped: length),
    * %4 a long paragraph with ONE inline link (kept: density below the bar),
    * %5 a related-links box (dropped: density with interstitial prose),
    * %7 an entity/inline-markup paragraph (kept — decode inside the block),
    * %11 a long anchor-only block (passes length, 100% density — dropped).
    * Reproduced verbatim in the q_txt_blocks / q_txt_maincontent oracles. */
  private def blockCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      concat(lit("http://b.example/p/"), col("doc_id").cast("string")).as("url"),
      concat(
        lit("<html><body>"),
        lit("<div id=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">News</a> <a href=\"/b\">Contact</a></div>"),
        lit("<p>This is the main paragraph of document "), col("doc_id").cast("string"),
        lit(" with plenty of plain prose that a curation pipeline keeps.</p>"),
        when(pmod(col("doc_id"), lit(3L)) === 0, "<p>Short.</p>").otherwise(""),
        when(pmod(col("doc_id"), lit(4L)) === 0,
          concat(lit("<p>A middle paragraph mentioning <a href=\"/x\">one inline link</a>"),
            lit(" inside longer prose text that stays below the density bar for document "),
            col("doc_id").cast("string"), lit(".</p>"))).otherwise(""),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          lit("<div>Related: <a href=\"/r1\">first related article</a> <a href=\"/r2\">second related article</a></div>"))
          .otherwise(""),
        when(pmod(col("doc_id"), lit(7L)) === 0,
          concat(lit("<p>Entities &amp; tags: <b>bold</b> text &quot;quoted&quot; for document "),
            col("doc_id").cast("string"), lit(".</p>"))).otherwise(""),
        when(pmod(col("doc_id"), lit(11L)) === 0,
          lit("<p><a href=\"/only\">Anchor-only block that is long enough to pass the length bar</a></p>"))
          .otherwise(""),
        lit("<div class=\"footer\"><a href=\"/imprint\">Imprint</a> | <a href=\"/privacy\">Privacy</a></div>"),
        lit("</body></html>")).cast("binary").as("html"))

  /** curation-pipeline corpus: two kept sentences keyed on `slot` (%6 docs
    * share slot = doc_id%40 → exact-dup groups AFTER extraction+cleaning;
    * the rest use slot = doc_id → singletons); %5 adds a dropped-short
    * line, %13 a dropped unpunctuated line (both invisible in clean_text,
    * so they cannot break a dup group), %7 a lorem-ipsum doc drop, %11 a
    * brace doc drop (%77 exercises the lorem-first precedence). Reproduced
    * verbatim in the q_txt_curatepipe oracle. */
  private def curateCorpus(s: SparkSession, dir: String): DataFrame = {
    val slot = when(pmod(col("doc_id"), lit(6L)) === 0,
      pmod(col("doc_id"), lit(40L)).cast("string"))
      .otherwise(col("doc_id").cast("string"))
    docs(s, dir).select(col("doc_id"), concat(
      lit("<html><body><p>This is a kept opening sentence for slot "),
      slot, lit(".</p>"),
      lit("<p>Another good second sentence number two for slot "), slot, lit(".</p>"),
      when(pmod(col("doc_id"), lit(5L)) === 0, "<p>short line.</p>").otherwise(""),
      when(pmod(col("doc_id"), lit(7L)) === 0,
        "<p>lorem ipsum dolor sit amet paragraph here.</p>").otherwise(""),
      when(pmod(col("doc_id"), lit(11L)) === 0,
        "<p>a sentence with braces { code } inside it.</p>").otherwise(""),
      when(pmod(col("doc_id"), lit(13L)) === 0,
        "<p>this long line has no terminal punctuation at all</p>").otherwise(""),
      lit("</body></html>")).cast("binary").as("html"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the doc-side COMPOSITION (crawl html -> tokenizer feed): extractText
    // -> c4LineFilter -> exact dedup on the cleaned text (min-id
    // representative) -> packSequences. The survivor table is collapsed
    // (group-count-sized) and consumed twice (pack + the n_dups audit
    // join) -> eager localCheckpoint, the anchorStats multi-consumer
    // lesson. The whole chain is hash-checked by one DuckDB oracle.
    "q_txt_curatepipe" -> ((s, dir) => {
      val ext = WebText.extractText(curateCorpus(s, dir), "doc_id", "html")
      val c4 = WebText.c4LineFilter(
        ext.select(col("url").as("doc_id"), col("text")), "doc_id", "text",
        minLineWords = 5, minKeptLines = 2)
      val rep = c4.filter(col("keep"))
        .groupBy(col("clean_text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_dups"))
        .localCheckpoint(true)
      TextAnalysis.packSequences(
        rep.select(col("doc_id"), col("clean_text").as("text")),
        "doc_id", "text", seqLen = 64, bucketSize = 100L)
        .join(rep.select("doc_id", "n_dups"), Seq("doc_id"))
    }),

    "q_txt_blocks" -> ((s, dir) =>
      WebText.contentBlocks(blockCorpus(s, dir), "url", "html",
        minBlockChars = 25, maxLinkDensityPct = 30)),

    "q_txt_maincontent" -> ((s, dir) =>
      WebText.mainContent(blockCorpus(s, dir), "url", "html",
        minBlockChars = 25, maxLinkDensityPct = 30)),

    "q_txt_extract" -> ((s, dir) =>
      WebText.extractText(extractCorpus(s, dir), "url", "html")),

    "q_txt_htmlmeta" -> ((s, dir) =>
      WebText.htmlMeta(metaCorpus(s, dir), "url", "html")),

    // ts columns projected to epoch seconds: Spark's instant-semantics
    // parquet timestamps read tz-aware while DuckDB's TO_TIMESTAMP is
    // TIMESTAMPTZ — BIGINT seconds are the portable comparison surface
    "q_txt_crawldelta" -> ((s, dir) =>
      WebText.crawlDelta(recrawlCorpus(s, dir), "url", "warc_ts", "text")
        .select(col("url"), col("n_crawls"),
          col("first_ts").cast("long").as("first_ts_s"),
          col("last_ts").cast("long").as("last_ts_s"), col("status"))),

    // dfCap 60: at 500 docs 'the' (df=500) is capped, a/b/u-terms post;
    // at 5000 docs the b-terms (df≈385) cross the cap too — both SFs
    // exercise capped and posted classes
    "q_txt_invindex" -> ((s, dir) =>
      TextAnalysis.invertedIndex(indexCorpus(s, dir), "doc_id", "text",
        k = 3, dfCap = 60L)),

    // fixed-point BM25 retrieval over the real corpus vocabulary; q5 carries
    // an absent term (contributes nothing) and q3 is single-term — the
    // oracle hardcodes the same literal query table
    "q_txt_bm25" -> ((s, dir) => {
      import s.implicits._
      val q = Seq(
        (1L, "vector"), (1L, "join"),
        (2L, "customer"), (2L, "query"), (2L, "merge"),
        (3L, "spark"),
        (4L, "batch"), (4L, "window"), (4L, "stream"), (4L, "sort"),
        (5L, "hash"), (5L, "zzz_absent")).toDF("query_id", "term")
      TextAnalysis.bm25TopK(docs(s, dir).select("doc_id", "text"),
        "doc_id", "text", q, k = 10)
    }),

    // hybrid retrieval: BM25 lexical leg + embedding-cosine semantic leg
    // (query vectors = the integral embeddings of docs 0/1/2, which the
    // oracle rebuilds) fused by fixed-point RRF. The emb leg excludes the
    // query doc itself (topK's qid != nid) while the BM25 leg may rank it —
    // the oracle mirrors that asymmetry.
    "q_txt_hybrid" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir).select(col("doc_id"), col("text"),
        QueriesEmbOracle.vecColFor(col("doc_id")).as("emb"))
      val qTerms = Seq((1L, "vector"), (1L, "join"),
        (2L, "customer"), (2L, "merge"),
        (3L, "batch"), (3L, "stream")).toDF("query_id", "term")
      val bm = TextAnalysis.bm25TopK(d, "doc_id", "text", qTerms, k = 20)
      val qmap = Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("query_id", "qdoc")
      val embRanks = Similarity.topK(
          d.select(col("doc_id").as("vid"), col("emb")),
          d.filter(col("doc_id") < 3).select(col("doc_id").as("vid"), col("emb")),
          "vid", "emb", k = 20)
        .join(broadcast(qmap), col("qid") === col("qdoc"))
        .select(col("query_id"), col("nid").as("doc_id"), col("rank"))
      TextAnalysis.rrfFuse(bm.select("query_id", "doc_id", "rank"), embRanks, k = 10)
    }),

    "q_txt_repetition" -> ((s, dir) =>
      WebText.withRepetitionStats(docs(s, dir).select("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "n_words", "dup_word_frac", "top2_ratio", "dup3_frac")),

    // suffix-dedup-style exact duplicate-substring spans; full-copy overlay
    // (%6 docs re-keyed +3e6) guarantees cross-doc duplicated 8-gram runs;
    // within-doc gram repeats count too. hashGrams=false is the exact form
    // (string keys — DuckDB-portable); the xxhash64 fast path is asserted
    // equal in WebTextSpec.
    "q_txt_dupspans" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "text")
      val corpus = d.unionByName(d.filter(pmod(col("doc_id"), lit(6L)) === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text")))
      WebText.duplicateSpans(corpus, "doc_id", "text", minLen = 8,
        minOccurrences = 2, hashGrams = false)
    }),

    // C4/RefinedWeb per-domain cap over the real source column; total order
    // (n_chars DESC, doc_id ASC) keeps ranks engine-portable
    "q_txt_domaincap" -> ((s, dir) =>
      WebText.domainCap(docs(s, dir), "doc_id", "source",
        Seq(col("n_chars").desc, col("doc_id").asc), maxPerDomain = 25)
        .select(col("doc_id"), col("source"), col("domain_rank"), col("kept"))),

    "q_txt_pii" -> ((s, dir) =>
      WebText.withPiiRedacted(piiCorpus(s, dir), "text")
        .select("doc_id", "n_emails", "n_ips", "n_phones", "redacted")),

    "q_dedup_contam" -> ((s, dir) =>
      WebText.contamination(dupCorpus(s, dir),
        docs(s, dir).filter(pmod(col("doc_id"), lit(17L)) === 0),
        "doc_id", "text", n = 8)),

    "q_dedup_canonical" -> ((s, dir) => {
      // variants that differ only in case/punct/whitespace (%9 docs upper-
      // cased with trailing '  !! ') — canonical dedup folds them; plain
      // exact dedup would miss every one
      val d = docs(s, dir).select("doc_id", "text")
      val messy = d.unionByName(d.filter(pmod(col("doc_id"), lit(9L)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat(upper(col("text")), lit("  !! ")).as("text")))
      WebText.canonicalGroups(messy, "doc_id", "text")
    }),

    "q_txt_tfidf" -> ((s, dir) =>
      WebText.tfidfTopTerms(docs(s, dir).select("doc_id", "text"), "doc_id", "text", k = 5)
        .withColumn("rnk", col("rnk").cast("long"))),

    "q_txt_composition" -> ((s, dir) =>
      WebText.composition(docs(s, dir), Seq("lang", "source"), "text")),

    "q_txt_filter" -> ((s, dir) =>
      // thresholds picked to split the driver corpus non-trivially (word
      // count 10-99, dup_word_frac median .54, top2 p90 .07)
      // every threshold explicit (incl. the ones matching curationFilter's
      // defaults) so a default change cannot silently desync the oracle SQL,
      // which hardcodes the same literals
      WebText.curationFilter(docs(s, dir).select("doc_id", "text"), "doc_id", "text",
        minWords = 20, maxWords = 100000, minAlphaRatio = 0.6,
        minMeanTokenLen = 2.0, maxMeanTokenLen = 12.0,
        maxDupWordFrac = 0.6, maxTop2Ratio = 0.09,
        maxDup3Frac = 0.05)),

    "q_txt_chunks" -> ((s, dir) =>
      WebText.chunkDocs(docs(s, dir), "doc_id", "text",
        chunkWords = 20, overlapWords = 5)),

    // latest-crawl-wins URL dedup over a synthesized Common-Crawl-style
    // pages table: scheme/host case variants (%7/%3), default vs non-default
    // port (%4 — :8080 is a DISTINCT resource and must NOT collapse),
    // tracking params + param-order shuffles (%3), fragments (%5); 50 base
    // paths x the port split give ~dozens of re-crawls per canonical url.
    // warc_ts = epoch + 37*doc_id is globally unique -> rank deterministic.
    "q_txt_urldedup" -> ((s, dir) =>
      WebText.urlDedup(urlCorpus(s, dir), "url", "warc_ts")
        .select("doc_id", "url", "canon_url", "crawl_rank", "kept")),

    // RefinedWeb/Falcon cross-doc line dedup: shared banner (every doc),
    // 3 promo-footer variants (%4 docs), an empty line (%5 docs — empty
    // lines are structural and never removed), the doc body, and a unique
    // tail line. hashLines=false is the exact/oracle form; the xxhash64
    // fast path is asserted identical in WebTextSpec.
    "q_txt_linededup" -> ((s, dir) =>
      WebText.lineDedup(lineCorpus(s, dir), "doc_id", "text",
        minDocs = 3, hashLines = false)),

    // C4-style per-line cleaning + doc-level drop reasons on c4Corpus;
    // minKeptLines=2 so the %6/%7 kept-sentence classes split keep vs
    // too_few_sentences non-trivially (all thresholds explicit — the
    // q_txt_filter ADVICE convention; the oracle hardcodes the same)
    "q_txt_c4filter" -> ((s, dir) =>
      WebText.c4LineFilter(c4Corpus(s, dir), "doc_id", "text",
        minLineWords = 5, minKeptLines = 2)),

    // GPT-style concat-and-chunk sequence packing over the REAL corpus;
    // bucketSize=97 exercises the two-level prefix sum with ~N/97 buckets
    // (the output is bucketSize-invariant, spec-asserted); the oracle
    // computes the same layout with one naive global window
    "q_txt_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(docs(s, dir).select("doc_id", "text"),
        "doc_id", "text", seqLen = 512, bucketSize = 97L)),

    // rows-only by necessity (HLL++ sketch bytes are engine-specific), but
    // the entry POLICES ITSELF: the sketch estimate is asserted within 15%
    // (3× the 0.05 rsd) of the exact count IN-PLAN — a violating lang row
    // raise_errors the whole gate entry. The exact side has a full hash
    // oracle as q_agg_hll_exact below.
    "q_agg_hll" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      toks.groupBy("lang").agg(
          countDistinct(col("word")).as("exact_words"),
          approx_count_distinct(col("word"), 0.05).as("approx_words"))
        .withColumn("approx_words",
          when(abs(col("approx_words") - col("exact_words")) * 100 <=
               col("exact_words") * 15, col("approx_words"))
            .otherwise(raise_error(concat(
              lit("HLL estimate off by >15% for lang "), col("lang"),
              lit(": approx="), col("approx_words").cast("string"),
              lit(" exact="), col("exact_words").cast("string")))))
    }),

    // the oracled twin of q_agg_hll's exact side: per-language distinct
    // word cardinality, hash-checked against DuckDB COUNT(DISTINCT)
    "q_agg_hll_exact" -> ((s, dir) =>
      docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("word"))
        .groupBy("lang")
        .agg(countDistinct(col("word")).as("exact_words"))),

    // lexical blocklist filter (the C4 banned-word rule generalized to a
    // count threshold): two frequent fixture words, one mid-frequency and
    // one absent — maxHits=2 makes keep/drop split on real counts; the
    // list and threshold are shared with the oracle as literals
    "q_txt_banned" -> ((s, dir) => {
      import s.implicits._
      WebText.bannedWords(docs(s, dir), "doc_id", "text",
        Seq("spark", "vector", "dup", "forbiddenzzz").toDF("word"), "word",
        maxHits = 2L)
    }),

    "q_txt_quantiles" -> ((s, dir) =>
      WebText.valueQuantiles(docs(s, dir), "lang", "n_chars", Seq(10, 50, 90))),

    "q_txt_tokens" -> ((s, dir) =>
      TextAnalysis.withTokenStats(docs(s, dir), "text")
        .select("doc_id", "n_tokens", "uniq_tokens", "ttr")),

    "q_txt_surprisal" -> ((s, dir) =>
      TextAnalysis.bigramSurprisal(docs(s, dir), "doc_id", "text")),

    // line-level churn between the two latest crawls per url: 50 url
    // classes × ~10 crawls; the %7 line mostly differs, %3 extra line
    // toggles, the '  ' blank line is structural, the %5 tail is stable
    // (50 ≡ 0 mod 5 — a guaranteed common line)
    "q_txt_churn" -> ((s, dir) => {
      val crawls = docs(s, dir).select(
        concat(lit("http://c"), pmod(col("doc_id"), lit(50L)).cast("string"),
          lit(".example/p")).as("url"),
        col("doc_id").as("ts"),
        concat(lit("shared header\nL"),
          pmod(col("doc_id"), lit(7L)).cast("string"), lit("\n"),
          when(pmod(col("doc_id"), lit(3L)) === 0, "extra line\n").otherwise(""),
          lit("  \ntail "), pmod(col("doc_id"), lit(5L)).cast("string")).as("text"))
      WebText.crawlChurn(crawls, "url", "ts", "text")
    }),

    "q_txt_quality" -> ((s, dir) =>
      TextAnalysis.withQuality(docs(s, dir).select("doc_id", "text"), "text")
        .select("doc_id", "n_chars", "n_tokens", "alpha_ratio", "mean_token_len")),

    "q_txt_langid" -> ((s, dir) =>
      TextAnalysis.withLangId(docs(s, dir), "text")
        .select("doc_id", "en_hits", "sv_hits", "pred_lang")),

    "q_txt_bpe" -> ((s, dir) =>
      TextAnalysis.withBpeTokenStats(docs(s, dir).select("doc_id", "text"), "text")
        .select("doc_id", "n_bpe_tokens", "uniq_bpe_tokens")),

    "q_txt_fingerprint" -> ((s, dir) => // rows-only (JVM hash)
      TextAnalysis.withFingerprint(docs(s, dir), "text")
        .select("doc_id", "n_fps", "min_fp")),

    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(dupCorpus(s, dir), "doc_id", "text")),

    // the flatMapGroupsWithState dedup-at-ingest operator in its batch form
    // (NoTimeout; ts monotone in doc_id makes the per-group winner the min
    // doc_id — ROW_NUMBER-oracle-able)
    "q_stream_dedup" -> ((s, dir) =>
      graft.streaming.StreamingDedup.firstSeenDedup(
        dupCorpus(s, dir).withColumn("ts", to_timestamp(col("doc_id") + 1)),
        "doc_id", "text", "ts", expireState = false)
        .toDF()),

    "q_dedup_ngram" -> ((s, dir) =>
      // maxDocFreq caps the shared-shingle block width (the 100-TB skew
      // guard); the oracle SQL mirrors the cap exactly
      Dedup.jaccardPairs(docs(s, dir), "doc_id", "text", n = 3, threshold = 0.5,
        maxDocFreq = 100L)),

    // partial-copy corpus: %5 docs re-keyed +2e6 carrying only their first
    // 8 words — containment(copy → original) = 1.0 while Jaccard is tiny;
    // the oracle re-derives the slice with the same clamping semantics
    "q_dedup_containment" -> ((s, dir) => {
      val base = docs(s, dir).select("doc_id", "text")
      Dedup.containmentPairs(
        base.unionByName(base.filter(pmod(col("doc_id"), lit(5L)) === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("text"))),
        "doc_id", "text", n = 3, threshold = 0.6, maxDocFreq = 100L)
    }),

    "q_dedup_minhash" -> ((s, dir) => // rows-only (xxhash64 signatures)
      Dedup.minhashLshPairs(dupCorpus(s, dir), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5, maxDocFreq = 100L)),

    "q_dedup_simhash" -> ((s, dir) => // rows-only (hash signatures)
      Dedup.simhashPairs(dupCorpus(s, dir), "doc_id", "text", maxHamming = 3)),

    "q_dedup_pipeline" -> ((s, dir) => // rows-only (xxhash64 LSH inside)
      // the composed exact-collapse -> LSH-over-representatives -> connected
      // components pipeline (the web-scale order; VERDICT r2 #5)
      Dedup.dedupPipeline(dupCorpus(s, dir), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5, maxDocFreq = 100L)),

    "q_emb_cospairs" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.cosinePairs(e, e.filter(pmod(col("vec_id"), lit(50L)) === 0),
        "vec_id", "embedding", threshold = 0.4)
    }),

    "q_emb_topk" -> ((s, dir) => { // rows-only (fp rank ties)
      val e = embs(s, dir)
      Similarity.topK(e, e.filter(pmod(col("vec_id"), lit(50L)) === 0),
        "vec_id", "embedding", k = 5)
    }),

    "q_emb_ann" -> ((s, dir) => { // rows-only (LSH buckets)
      val e = embs(s, dir)
      Similarity.annTopK(e, e.filter(pmod(col("vec_id"), lit(50L)) === 0),
        "vec_id", "embedding", k = 5, nBits = 8, probeRadius = 1)
    }),

    "q_emb_ivf" -> ((s, dir) => { // rows-only (iterative float means)
      val e = embs(s, dir)
      Similarity.ivfTopK(e, e.filter(pmod(col("vec_id"), lit(50L)) === 0),
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 4)
    }),

    "q_mm_meta" -> ((s, dir) =>
      Multimodal.asFakeMedia(docs(s, dir), "doc_id", "text")
        .select(col("doc_id"), length(col("payload")).cast("long").as("n_bytes"))),

    "q_mm_decode" -> ((s, dir) =>
      // oracled: the stub's features are pure byte arithmetic — the DuckDB
      // side re-derives them from HEX(payload) pairs
      Multimodal.decodeStub(
        Multimodal.asFakeMedia(docs(s, dir), "doc_id", "text")).toDF()),

    "q_mm_resize" -> ((s, dir) =>
      // nearest-neighbor 8x8 resize of the fake image body; integer source
      // mapping makes the output checksum engine-independent
      Multimodal.resize(
        Multimodal.asFakeMedia(docs(s, dir), "doc_id", "text"), 8, 8)
        .select("doc_id", "out_w", "out_h", "checksum")),

    "q_mm_frames" -> ((s, dir) =>
      // every 2nd 16-byte frame of the body (trailing partial frame dropped)
      Multimodal.frameSample(
        Multimodal.asFakeMedia(docs(s, dir), "doc_id", "text"),
        frameBytes = 16, every = 2)
        .select("doc_id", "frame_idx", "n_frames", "checksum")),

    "q_mm_embed" -> ((s, dir) =>
      // byte-histogram-mod-8 feature vector, exploded to (doc_id, i, v) rows
      // so the array is oracle-comparable position by position
      Multimodal.featureExtract(
        Multimodal.asFakeMedia(docs(s, dir), "doc_id", "text"), 8)
        .toDF().select(col("doc_id"),
          posexplode(col("embedding")).as(Seq("i", "v")))),

    "q_mm_simsearch" -> ((s, dir) => {
      // cross-modal composition: the extracted media embedding plugs straight
      // into the Similarity operators — integer-count vectors keep the cosine
      // bit-exact across engines (dot and squared norms are exact integers)
      val emb = Multimodal.featureExtract(
        Multimodal.asFakeMedia(docs(s, dir), "doc_id", "text"), 8).toDF()
      Similarity.cosinePairs(emb,
        emb.filter(pmod(col("doc_id"), lit(50L)) === 0),
        "doc_id", "embedding", threshold = 0.99)
    }))

  /** DuckDB recomputation of WebText.cleanBlockText(x): inline tags out,
    * the EntityTable REPLACEs in order (&amp; last), whitespace runs to one
    * space, trim. Plain-string concat — the regexes carry backslashes. */
  private def cleanSql(x: String): String =
    "TRIM(REGEXP_REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(" +
      "REGEXP_REPLACE(" + x + ", '<[^>]*>', '', 'g'), " +
      "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), " +
      "'&nbsp;', ' '), '&amp;', '&'), " +
      """'[ \t\r\n]+', ' ', 'g'))"""

  /** shared CTE chain for the block-scoring oracles: blockCorpus re-derived,
    * script/style/comment strip, block split with zipped-unnest ordinality,
    * per-block clean + anchor-body link chars. Margin-bearing fragment —
    * strip ONCE at the consumer. */
  private val blockCtes: String =
    """WITH p AS (SELECT doc_id,
      |    'http://b.example/p/' || CAST(doc_id AS VARCHAR) AS url,
      |    '<html><body>'
      |    || '<div id="nav"><a href="/">Home</a> <a href="/a">News</a> <a href="/b">Contact</a></div>'
      |    || '<p>This is the main paragraph of document ' || CAST(doc_id AS VARCHAR)
      |    || ' with plenty of plain prose that a curation pipeline keeps.</p>'
      |    || (CASE WHEN doc_id % 3 = 0 THEN '<p>Short.</p>' ELSE '' END)
      |    || (CASE WHEN doc_id % 4 = 0
      |         THEN '<p>A middle paragraph mentioning <a href="/x">one inline link</a>'
      |              || ' inside longer prose text that stays below the density bar for document '
      |              || CAST(doc_id AS VARCHAR) || '.</p>' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 0
      |         THEN '<div>Related: <a href="/r1">first related article</a> <a href="/r2">second related article</a></div>'
      |         ELSE '' END)
      |    || (CASE WHEN doc_id % 7 = 0
      |         THEN '<p>Entities &amp; tags: <b>bold</b> text &quot;quoted&quot; for document '
      |              || CAST(doc_id AS VARCHAR) || '.</p>' ELSE '' END)
      |    || (CASE WHEN doc_id % 11 = 0
      |         THEN '<p><a href="/only">Anchor-only block that is long enough to pass the length bar</a></p>'
      |         ELSE '' END)
      |    || '<div class="footer"><a href="/imprint">Imprint</a> | <a href="/privacy">Privacy</a></div>'
      |    || '</body></html>' AS html
      |  FROM documents),
      |c0 AS (SELECT url, REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(html,
      |  '(?is)<script\b[^>]*>.*?</script>', '', 'g'),
      |  '(?is)<style\b[^>]*>.*?</style>', '', 'g'),
      |  '(?s)<!--.*?-->', '', 'g') AS t FROM p),
      |bl AS (SELECT url, regexp_split_to_array(t,
      |  '(?i)</?(?:p|div|li|ul|ol|h[1-6]|tr|table|br|title|blockquote|section|article|header|footer)\b[^>]*>') AS a
      |  FROM c0),
      |rawb AS (SELECT url, unnest(a) AS raw,
      |  unnest(generate_series(0, len(a) - 1)) AS idx FROM bl),
      |cb AS (SELECT url, idx,
      |  """.stripMargin + cleanSql("raw") + """ AS text,
      |  CAST(COALESCE(list_sum(list_transform(
      |    regexp_extract_all(raw, '(?is)<a\b[^>]*>(.*?)</a>', 1),
      |    b -> LENGTH(""".stripMargin + cleanSql("b") + """))), 0) AS BIGINT) AS link_chars
      |  FROM rawb),
      |blk AS (SELECT url, CAST(idx AS BIGINT) AS block_idx, text,
      |  CAST(LENGTH(text) AS BIGINT) AS n_chars, link_chars
      |  FROM cb WHERE LENGTH(text) > 0),
      |scored AS (SELECT url, block_idx, text, n_chars, link_chars,
      |  (n_chars >= 25 AND link_chars * 100 <= 30 * n_chars) AS keep FROM blk)"""
      .stripMargin

  /** The 9-stage extractText transcription as a reusable CTE fragment:
    * consumes a CTE `in(url, html)`, defines s1..s9 with s9(url, text).
    * Margin-bearing (strip ONCE at the final consumer) and a PLAIN string
    * (the patterns carry `\b`/`\t` that s-interpolation would mis-escape) —
    * the input name is spliced by literal replace. Shared by q_txt_extract
    * and QueriesWebGraph's q_web_ingestpipe; the regex constants are
    * WebText.extractText's VERBATIM. */
  private[graft] def oracleExtractChain(in: String): String =
    """s1 AS (SELECT url, REGEXP_REPLACE(html, '(?is)<script\b[^>]*>.*?</script>', '', 'g') AS t FROM IN_CTE),
      |s2 AS (SELECT url, REGEXP_REPLACE(t, '(?is)<style\b[^>]*>.*?</style>', '', 'g') AS t FROM s1),
      |s3 AS (SELECT url, REGEXP_REPLACE(t, '(?s)<!--.*?-->', '', 'g') AS t FROM s2),
      |s4 AS (SELECT url, REGEXP_REPLACE(t,
      |  '(?i)</?(?:p|div|li|ul|ol|h[1-6]|tr|table|br|title|blockquote|section|article|header|footer)\b[^>]*>',
      |  chr(10), 'g') AS t FROM s3),
      |s5 AS (SELECT url, REGEXP_REPLACE(t, '<[^>]*>', '', 'g') AS t FROM s4),
      |s6 AS (SELECT url,
      |  REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(t,
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |    '&nbsp;', ' '), '&amp;', '&') AS t FROM s5),
      |s7 AS (SELECT url, REGEXP_REPLACE(t, '[ \t\r]+', ' ', 'g') AS t FROM s6),
      |s8 AS (SELECT url, REGEXP_REPLACE(t, ' ?\n ?', chr(10), 'g') AS t FROM s7),
      |s9 AS (SELECT url,
      |  TRIM(REGEXP_REPLACE(t, '\n+', chr(10), 'g'), ' ' || chr(10)) AS text FROM s8)""".replace("IN_CTE", in)

  val oracle: Map[String, String] = Map(
    // word-run matching: the [a-z]+ split is the bpeTrain word domain, so
    // boundaries hold by construction on both engines
    "q_txt_banned" ->
      """WITH banned AS (SELECT * FROM (VALUES ('spark'), ('vector'),
        |    ('dup'), ('forbiddenzzz')) AS t(word)),
        |w AS (SELECT doc_id,
        |    UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
        |      x -> x <> '')) AS word
        |  FROM documents),
        |h AS (SELECT doc_id, COUNT(*) AS n_banned_hits,
        |             CAST(COUNT(DISTINCT w.word) AS BIGINT) AS n_banned_distinct,
        |             MIN(w.word) AS first_banned
        |      FROM w JOIN banned ON banned.word = w.word
        |      GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(h.n_banned_hits, 0) AS n_banned_hits,
        |  COALESCE(h.n_banned_distinct, 0) AS n_banned_distinct,
        |  h.first_banned,
        |  COALESCE(h.n_banned_hits, 0) <= 2 AS kept
        |FROM (SELECT doc_id FROM documents) d
        |LEFT JOIN h ON h.doc_id = d.doc_id""".stripMargin,

    // Spark split(text, ' ') keeps empty tokens from double spaces;
    // regexp_split_to_array has identical semantics
    "q_agg_hll_exact" ->
      """SELECT lang, CAST(COUNT(DISTINCT word) AS BIGINT) AS exact_words
        |FROM (SELECT lang, unnest(regexp_split_to_array(text, ' ')) AS word
        |      FROM documents)
        |GROUP BY lang""".stripMargin,

    // the full composition re-derived: corpus synthesis, the 9-stage
    // extraction chain (constants VERBATIM from extractText), the c4 line
    // rules + doc-reason CASE, exact dedup keyed on clean_text with the
    // min-id representative, and the naive-window pack layout
    "q_txt_curatepipe" ->
      """WITH base AS (SELECT doc_id,
        |    CASE WHEN doc_id % 6 = 0 THEN CAST(doc_id % 40 AS VARCHAR)
        |         ELSE CAST(doc_id AS VARCHAR) END AS slot
        |  FROM documents),
        |p AS (SELECT doc_id,
        |    '<html><body><p>This is a kept opening sentence for slot ' || slot || '.</p>'
        |    || '<p>Another good second sentence number two for slot ' || slot || '.</p>'
        |    || (CASE WHEN doc_id % 5 = 0 THEN '<p>short line.</p>' ELSE '' END)
        |    || (CASE WHEN doc_id % 7 = 0
        |         THEN '<p>lorem ipsum dolor sit amet paragraph here.</p>' ELSE '' END)
        |    || (CASE WHEN doc_id % 11 = 0
        |         THEN '<p>a sentence with braces { code } inside it.</p>' ELSE '' END)
        |    || (CASE WHEN doc_id % 13 = 0
        |         THEN '<p>this long line has no terminal punctuation at all</p>' ELSE '' END)
        |    || '</body></html>' AS html
        |  FROM base),
        |s1 AS (SELECT doc_id, REGEXP_REPLACE(html, '(?is)<script\b[^>]*>.*?</script>', '', 'g') AS t FROM p),
        |s2 AS (SELECT doc_id, REGEXP_REPLACE(t, '(?is)<style\b[^>]*>.*?</style>', '', 'g') AS t FROM s1),
        |s3 AS (SELECT doc_id, REGEXP_REPLACE(t, '(?s)<!--.*?-->', '', 'g') AS t FROM s2),
        |s4 AS (SELECT doc_id, REGEXP_REPLACE(t,
        |  '(?i)</?(?:p|div|li|ul|ol|h[1-6]|tr|table|br|title|blockquote|section|article|header|footer)\b[^>]*>',
        |  chr(10), 'g') AS t FROM s3),
        |s5 AS (SELECT doc_id, REGEXP_REPLACE(t, '<[^>]*>', '', 'g') AS t FROM s4),
        |s6 AS (SELECT doc_id,
        |  REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(REPLACE(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&') AS t FROM s5),
        |s7 AS (SELECT doc_id, REGEXP_REPLACE(t, '[ \t\r]+', ' ', 'g') AS t FROM s6),
        |s8 AS (SELECT doc_id, REGEXP_REPLACE(t, ' ?\n ?', chr(10), 'g') AS t FROM s7),
        |s9 AS (SELECT doc_id,
        |  TRIM(REGEXP_REPLACE(t, '\n+', chr(10), 'g'), ' ' || chr(10)) AS text FROM s8),
        |k AS (SELECT doc_id, text,
        |  LIST_FILTER(STRING_SPLIT(text, chr(10)), x -> REGEXP_MATCHES(TRIM(x), '[.!?"]$')
        |    AND LEN(LIST_FILTER(STRING_SPLIT(TRIM(x), ' '), y -> y <> '')) >= 5
        |    AND NOT CONTAINS(LOWER(TRIM(x)), 'javascript')) AS kept
        |  FROM s9),
        |surv AS (SELECT doc_id,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(kept, x -> TRIM(x)), chr(10)) AS clean_text
        |  FROM k
        |  WHERE (CASE WHEN CONTAINS(LOWER(text), 'lorem ipsum') THEN 'lorem_ipsum'
        |              WHEN CONTAINS(text, '{') THEN 'brace'
        |              WHEN LEN(kept) < 2 THEN 'too_few_sentences' END) IS NULL),
        |rep AS (SELECT clean_text, MIN(doc_id) AS doc_id,
        |        CAST(COUNT(*) AS BIGINT) AS n_dups FROM surv GROUP BY clean_text),
        |t AS (SELECT doc_id, n_dups,
        |  CAST(LEN(LIST_FILTER(STRING_SPLIT(clean_text, ' '), y -> y <> '')) AS BIGINT) AS n_toks
        |  FROM rep),
        |c AS (SELECT doc_id, n_dups, n_toks,
        |  CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM t)
        |SELECT doc_id, n_toks, start_tok,
        |  CAST(start_tok // 64 AS BIGINT) AS first_seq,
        |  CAST(CASE WHEN n_toks > 0 THEN (start_tok + n_toks - 1) // 64
        |       ELSE start_tok // 64 END AS BIGINT) AS last_seq,
        |  CAST(CASE WHEN n_toks > 0
        |       THEN (start_tok + n_toks - 1) // 64 - start_tok // 64 + 1
        |       ELSE 0 END AS BIGINT) AS n_seqs,
        |  n_dups
        |FROM c""".stripMargin,

    "q_txt_blocks" ->
      (blockCtes +
        "\nSELECT url, block_idx, text, n_chars, link_chars, keep FROM scored"),

    "q_txt_maincontent" ->
      (blockCtes + """
        |SELECT url,
        |  COALESCE(STRING_AGG(CASE WHEN keep THEN text END, chr(10) ORDER BY block_idx)
        |    FILTER (WHERE keep), '') AS content,
        |  CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |  CAST(COUNT(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
        |FROM scored GROUP BY url""".stripMargin),

    // re-derives extractCorpus, then applies WebText.extractText's chain
    // step for step — every pattern is the Scala constant VERBATIM (RE2
    // subset; 'g' = Spark's always-global regexp_replace), entity REPLACEs
    // in the same order (&amp; last), TRIM over ' '+newline like the engine
    "q_txt_extract" ->
      ("""WITH p AS (SELECT doc_id,
        |    'http://t.example/d/' || CAST(doc_id AS VARCHAR) AS url,
        |    '<html><head>'
        |    || (CASE WHEN doc_id % 2 = 0
        |         THEN '<script type="text/javascript">var x = ''<p>not text</p>'';'
        |              || chr(10) || 'alert(1);</script>' ELSE '' END)
        |    || (CASE WHEN doc_id % 3 = 0
        |         THEN '<style media="all">body { color: red; }</style>' ELSE '' END)
        |    || '</head><body>'
        |    || (CASE WHEN doc_id % 5 = 0
        |         THEN '<!-- hidden' || chr(10) || 'comment -->' ELSE '' END)
        |    || '<div class="c"><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
        |    || '<p>Para <b>on</b>e ' || chr(9) || ' with  spaces</p>'
        |    || (CASE WHEN doc_id % 7 = 0
        |         THEN '<p>A &amp;amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39; N&nbsp;B</p>'
        |         ELSE '' END)
        |    || '</div></body></html>' AS html
        |  FROM documents),
        |""" + oracleExtractChain("p") + """
        |SELECT url, text, CAST(LENGTH(text) AS BIGINT) AS n_chars FROM s9""").stripMargin,

    // re-derives metaCorpus; matchers are WebText.htmlMeta's verbatim
    "q_txt_htmlmeta" ->
      """WITH p AS (SELECT doc_id,
        |    'http://m.example/p/' || CAST(doc_id AS VARCHAR) AS url,
        |    '<html><head>'
        |    || (CASE WHEN doc_id % 2 = 0 THEN
        |          CASE WHEN doc_id % 5 = 0
        |               THEN '<title><b>Doc ' || CAST(doc_id AS VARCHAR) || '</b></title>'
        |               ELSE '<TITLE> Doc ' || CAST(doc_id AS VARCHAR) || ' </TITLE>' END
        |        ELSE '' END)
        |    || (CASE WHEN doc_id % 3 = 0
        |         THEN '<meta name="description" content="About doc '
        |              || CAST(doc_id AS VARCHAR) || '">' ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '<meta charset="UTF-8">' ELSE '' END)
        |    || (CASE WHEN doc_id % 7 = 0
        |         THEN '<link href="http://m.example/c/' || CAST(doc_id AS VARCHAR)
        |              || '" rel="canonical">' ELSE '' END)
        |    || '</head><body>x</body></html>' AS html
        |  FROM documents)
        |SELECT url,
        |  TRIM(REGEXP_EXTRACT(html, '(?i)<title>([^<]*)</title>', 1)) AS title,
        |  REGEXP_EXTRACT(html,
        |    '(?i)<meta\s+name="description"\s+content="([^"]*)"', 1) AS meta_description,
        |  LOWER(REGEXP_EXTRACT(html, '(?i)<meta\s+charset="([^"]*)"', 1)) AS charset,
        |  REGEXP_MATCHES(html, '(?i)<link\s[^>]*rel="canonical"') AS has_canonical
        |FROM p""".stripMargin,

    // re-derives recrawlCorpus; latest-crawl row = rn = n, status from the
    // LAG against the previous capture — same (ts, text) order as the engine
    "q_txt_crawldelta" ->
      """WITH p AS (SELECT
        |    CASE WHEN doc_id % 9 = 0
        |         THEN 'http://ex.com/solo/' || CAST(doc_id AS VARCHAR)
        |         ELSE 'http://ex.com/p/' || CAST(doc_id % 120 AS VARCHAR) END AS url,
        |    1767225600 + doc_id * 37 AS ts_s,
        |    CASE WHEN doc_id % 2 = 0
        |         THEN 'stable ' || CAST(doc_id % 120 AS VARCHAR)
        |         ELSE 'rev ' || CAST(doc_id AS VARCHAR) END AS text
        |  FROM documents),
        |w AS (SELECT url, text,
        |    ROW_NUMBER() OVER (PARTITION BY url ORDER BY ts_s, text) AS rn,
        |    COUNT(*) OVER (PARTITION BY url) AS n,
        |    MIN(ts_s) OVER (PARTITION BY url) AS first_ts_s,
        |    MAX(ts_s) OVER (PARTITION BY url) AS last_ts_s,
        |    LAG(text) OVER (PARTITION BY url ORDER BY ts_s, text) AS prev
        |  FROM p)
        |SELECT url, CAST(n AS BIGINT) AS n_crawls,
        |  CAST(first_ts_s AS BIGINT) AS first_ts_s,
        |  CAST(last_ts_s AS BIGINT) AS last_ts_s,
        |  CASE WHEN n = 1 THEN 'new'
        |       WHEN text <> prev THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM w WHERE rn = n""".stripMargin,

    // re-derives indexCorpus; df cap + top-3 postings exactly as
    // TextAnalysis.invertedIndex (tfc DESC, doc_id ASC rank order)
    "q_txt_invindex" ->
      """WITH c AS (SELECT doc_id,
        |    'the a' || CAST(doc_id % 97 AS VARCHAR)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '  ' ELSE ' ' END)
        |    || 'a' || CAST(doc_id % 97 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 0
        |         THEN ' a' || CAST(doc_id % 97 AS VARCHAR) ELSE '' END)
        |    || ' b' || CAST(doc_id % 13 AS VARCHAR)
        |    || (CASE WHEN doc_id % 5 = 0
        |         THEN ' u' || CAST(doc_id AS VARCHAR) ELSE '' END) AS text
        |  FROM documents),
        |toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM c),
        |t AS (SELECT word, doc_id, CAST(COUNT(*) AS BIGINT) AS tfc
        |      FROM toks WHERE word <> '' GROUP BY word, doc_id),
        |stats AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df,
        |          CAST(SUM(tfc) AS BIGINT) AS tf_total FROM t GROUP BY word),
        |r AS (SELECT t.word, t.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY t.word ORDER BY t.tfc DESC, t.doc_id) AS rn
        |  FROM t JOIN stats USING (word) WHERE stats.df <= 60),
        |p AS (SELECT word, STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY rn) AS postings
        |  FROM r WHERE rn <= 3 GROUP BY word)
        |SELECT stats.word, stats.df, stats.tf_total, p.postings
        |FROM stats LEFT JOIN p USING (word)""".stripMargin,

    // same integer rationalization as bm25TopK: idf_milli ×1000 of the RSJ
    // ratio, tf_ppm ×10⁶ with constants 22/3/9 = 10(k1+1)/10k1(1−b)/10k1b,
    // DuckDB `//` == Spark `div` on positive BIGINTs
    "q_txt_bm25" ->
      """WITH toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tfc
        |  FROM toks WHERE word <> '' GROUP BY doc_id, word),
        |dfq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
        |dlen AS (SELECT doc_id, CAST(SUM(tfc) AS BIGINT) AS len FROM tf GROUP BY doc_id),
        |tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
        |               (SELECT CAST(SUM(len) AS BIGINT) FROM dlen) AS a_num),
        |q(query_id, word) AS (VALUES
        |  (1,'vector'),(1,'join'),
        |  (2,'customer'),(2,'query'),(2,'merge'),
        |  (3,'spark'),
        |  (4,'batch'),(4,'window'),(4,'stream'),(4,'sort'),
        |  (5,'hash'),(5,'zzz_absent')),
        |sc AS (SELECT q.query_id, tf.doc_id,
        |    ((1000*(2*t.n_docs - 2*df + 1)) // (2*df + 1)) *
        |    ((1000000*22*tfc*a_num) // (10*tfc*a_num + 3*a_num + 9*len*t.n_docs))
        |      AS contrib
        |  FROM tf JOIN q USING (word) JOIN dfq USING (word)
        |    JOIN dlen USING (doc_id) CROSS JOIN tot t),
        |ag AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score
        |  FROM sc GROUP BY query_id, doc_id),
        |rk AS (SELECT query_id, doc_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS rnk
        |  FROM ag)
        |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score,
        |  CAST(rnk AS INT) AS rank
        |FROM rk WHERE rnk <= 10""".stripMargin,

    // hybrid = bm25 chain (k=20) + cosine leg over doc_id-derived integral
    // vectors + fixed-point RRF; multi-referenced CTEs AS MATERIALIZED
    // (q_emb_ivfpq lesson). Spark `div` == `//` on positive operands.
    "q_txt_hybrid" ->
      s"""WITH d AS MATERIALIZED (SELECT doc_id, text,
         |    ${QueriesEmbOracle.vecSqlColsFor("doc_id")}
         |  FROM documents),
         |toks AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word
         |  FROM documents),
         |tf AS MATERIALIZED (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tfc
         |  FROM toks WHERE word <> '' GROUP BY doc_id, word),
         |dfq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
         |dlen AS MATERIALIZED (SELECT doc_id, CAST(SUM(tfc) AS BIGINT) AS len
         |  FROM tf GROUP BY doc_id),
         |tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
         |               (SELECT CAST(SUM(len) AS BIGINT) FROM dlen) AS a_num),
         |qt(query_id, word) AS (VALUES
         |  (1,'vector'),(1,'join'),(2,'customer'),(2,'merge'),(3,'batch'),(3,'stream')),
         |sc AS (SELECT qt.query_id, tf.doc_id,
         |    ((1000*(2*t.n_docs - 2*df + 1)) // (2*df + 1)) *
         |    ((1000000*22*tfc*a_num) // (10*tfc*a_num + 3*a_num + 9*len*t.n_docs))
         |      AS contrib
         |  FROM tf JOIN qt USING (word) JOIN dfq USING (word)
         |    JOIN dlen USING (doc_id) CROSS JOIN tot t),
         |ag AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT) AS score
         |  FROM sc GROUP BY query_id, doc_id),
         |bmr AS (SELECT query_id, doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, doc_id) AS rnk
         |  FROM ag),
         |qv AS MATERIALIZED (SELECT * FROM d WHERE doc_id < 3),
         |es AS (SELECT qv.doc_id AS qdoc, c.doc_id AS nid,
         |    (${QueriesEmbOracle.dotExpr("qv", "c")})
         |      /(${QueriesEmbOracle.normExpr("qv")}*${QueriesEmbOracle.normExpr("c")}) AS cos
         |  FROM qv JOIN d c ON c.doc_id <> qv.doc_id),
         |er AS (SELECT qdoc, nid,
         |    ROW_NUMBER() OVER (PARTITION BY qdoc ORDER BY cos DESC, nid) AS rnk
         |  FROM es),
         |fa AS (SELECT query_id, doc_id, 1000000 // (60 + rnk) AS c
         |  FROM bmr WHERE rnk <= 20),
         |fb AS (SELECT qdoc + 1 AS query_id, nid AS doc_id, 1000000 // (60 + rnk) AS c
         |  FROM er WHERE rnk <= 20),
         |fu AS (SELECT COALESCE(fa.query_id, fb.query_id) AS query_id,
         |    COALESCE(fa.doc_id, fb.doc_id) AS doc_id,
         |    COALESCE(fa.c, 0) + COALESCE(fb.c, 0) AS fused
         |  FROM fa FULL OUTER JOIN fb
         |    ON fa.query_id = fb.query_id AND fa.doc_id = fb.doc_id),
         |rk AS (SELECT query_id, doc_id, fused,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY fused DESC, doc_id) AS rnk
         |  FROM fu)
         |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
         |  CAST(fused AS BIGINT) AS fused, CAST(rnk AS INT) AS rank
         |FROM rk WHERE rnk <= 10""".stripMargin,

    "q_txt_dupspans" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 6 = 0),
        |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM corpus
        |      WHERE LEN(STRING_SPLIT(text, ' ')) >= 8),
        |occ AS (SELECT doc_id, i AS pos,
        |        ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]||' '||ws[i+4]
        |        ||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS gram
        |        FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-7)) AS i) t),
        |hot AS (SELECT gram FROM occ GROUP BY gram HAVING COUNT(*) >= 2),
        |mk AS (SELECT o.doc_id, o.pos, o.pos + 7 AS e FROM occ o JOIN hot USING (gram)),
        |sp AS (SELECT doc_id, pos, e,
        |       MAX(e) OVER (PARTITION BY doc_id ORDER BY pos
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e
        |       FROM mk),
        |sp2 AS (SELECT *, CASE WHEN prev_e IS NULL OR pos > prev_e
        |                       THEN 1 ELSE 0 END AS nw FROM sp),
        |sp3 AS (SELECT *, CAST(SUM(nw) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id FROM sp2)
        |SELECT doc_id, span_id, CAST(MIN(pos) AS BIGINT) AS start_word,
        |  CAST(MAX(e) AS BIGINT) AS end_word,
        |  CAST(MAX(e) - MIN(pos) + 1 AS BIGINT) AS n_words
        |FROM sp3 GROUP BY doc_id, span_id""".stripMargin,
    // re-derives urlCorpus, then canonicalizes with the SAME RE2-subset
    // patterns as WebText.canonicalUrl (shared-verbatim, the q_txt_pii
    // precedent) and ranks newest-first per canonical url
    "q_txt_urldedup" ->
      ("""WITH p AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 7 = 0 THEN 'HTTP' ELSE 'http' END) || '://'
        |  || (CASE WHEN doc_id % 3 = 0 THEN 'Example.COM' ELSE 'example.com' END)
        |  || (CASE WHEN doc_id % 4 = 0 THEN ':80'
        |           WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END)
        |  || '/page/' || CAST(doc_id % 50 AS VARCHAR)
        |  || (CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1'
        |           WHEN doc_id % 3 = 1 THEN '?a=1&b=2' ELSE '?b=2&a=1' END)
        |  || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END) AS url,
        |  TO_TIMESTAMP(1767225600 + doc_id * 37) AS warc_ts FROM documents),
        |c AS (SELECT doc_id, url, warc_ts,
        |  LOWER(REGEXP_EXTRACT(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
        |  REGEXP_EXTRACT(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
        |  REGEXP_EXTRACT(url, '^[^?#]*\?([^#]*)', 1) AS q FROM p),
        |c2 AS (SELECT doc_id, url, warc_ts, scheme,
        |  LOWER(REGEXP_EXTRACT(hostport, '^([^:]*)', 1)) AS host,
        |  REGEXP_EXTRACT(hostport, ':([0-9]+)$', 1) AS port,
        |  CASE WHEN rawpath = '' THEN '/' ELSE rawpath END AS path,
        |  ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(STRING_SPLIT(q, '&'),
        |    x -> LEN(x) > 0 AND NOT REGEXP_MATCHES(x,
        |      '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)='))), '&') AS params
        |  FROM c),
        |canon AS (SELECT doc_id, url, warc_ts,
        |  scheme || '://' || host
        |  || (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
        |           AND NOT (scheme = 'https' AND port = '443')
        |      THEN ':' || port ELSE '' END)
        |  || path || (CASE WHEN params = '' THEN '' ELSE '?' || params END) AS canon_url
        |  FROM c2)
        |SELECT doc_id, url, canon_url,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY canon_url
        |    ORDER BY warc_ts DESC, url) AS BIGINT) AS crawl_rank,
        |  ROW_NUMBER() OVER (PARTITION BY canon_url
        |    ORDER BY warc_ts DESC, url) = 1 AS kept
        |FROM canon""").stripMargin,
    // re-derives lineCorpus, counts distinct docs per trimmed non-empty
    // line, removes hot lines everywhere, reassembles in line order
    "q_txt_linededup" ->
      """WITH c AS (SELECT doc_id,
        |  'ACCEPT COOKIES banner' || chr(10)
        |  || (CASE WHEN doc_id % 4 = 0
        |      THEN 'promo footer ' || CAST(doc_id % 3 AS VARCHAR) || chr(10)
        |      ELSE '' END)
        |  || (CASE WHEN doc_id % 5 = 0 THEN chr(10) ELSE '' END)
        |  || text || chr(10) || 'doc ' || CAST(doc_id AS VARCHAR) || ' tail' AS text
        |  FROM documents),
        |d AS (SELECT doc_id, STRING_SPLIT(text, chr(10)) AS ws FROM c),
        |l AS (SELECT doc_id, i AS pos, ws[i] AS line, TRIM(ws[i]) AS t
        |      FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws))) AS i) u),
        |hot AS (SELECT t FROM (SELECT DISTINCT t, doc_id FROM l WHERE t <> '') dl
        |        GROUP BY t HAVING COUNT(*) >= 3),
        |k AS (SELECT doc_id, pos, line,
        |      (t = '' OR t NOT IN (SELECT t FROM hot)) AS keep FROM l)
        |SELECT doc_id,
        |  COALESCE(ARRAY_TO_STRING(LIST(line ORDER BY pos) FILTER (WHERE keep),
        |    chr(10)), '') AS clean_text,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
        |FROM k GROUP BY doc_id""".stripMargin,
    // re-derives c4Corpus, then replays c4LineFilter's rules: a line is
    // kept iff TRIM ends in [.!?"]$ (TerminalPunctPattern, shared
    // verbatim), has >= 5 non-empty space tokens, and doesn't contain
    // 'javascript' (case-insensitive); doc reason = lorem_ipsum -> brace ->
    // too_few_sentences (< 2 kept), in that order
    "q_txt_c4filter" ->
      """WITH c AS (SELECT doc_id,
        |  'This is a good first sentence for document ' || CAST(doc_id AS VARCHAR)
        |  || '.' || chr(10)
        |  || (CASE WHEN doc_id % 3 = 0 THEN 'Too short.' || chr(10) ELSE '' END)
        |  || (CASE WHEN doc_id % 4 = 0 THEN
        |      'Please enable JavaScript to view the comments powered here.' || chr(10)
        |      ELSE '' END)
        |  || (CASE WHEN doc_id % 5 = 0 THEN
        |      'this line has plenty of words but no terminal punctuation' || chr(10)
        |      ELSE '' END)
        |  || (CASE WHEN doc_id % 6 = 0 THEN
        |      'Another complete sentence that should survive the filter!' || chr(10)
        |      ELSE '' END)
        |  || (CASE WHEN doc_id % 7 = 0 THEN
        |      'He said the quote ends after the period "just like this."' || chr(10)
        |      ELSE '' END)
        |  || text
        |  || (CASE WHEN doc_id % 11 = 0 THEN chr(10) ||
        |      (CASE WHEN doc_id % 2 = 0 THEN 'Lorem Ipsum dolor sit amet.'
        |            ELSE 'lorem ipsum dolor sit amet.' END) ELSE '' END)
        |  || (CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'if (x) { return window.top; }'
        |      ELSE '' END) AS text
        |  FROM documents),
        |d AS (SELECT doc_id, text, STRING_SPLIT(text, chr(10)) AS ls FROM c),
        |k AS (SELECT doc_id, text, LEN(ls) AS n_lines,
        |  LIST_FILTER(ls, x -> REGEXP_MATCHES(TRIM(x), '[.!?"]$')
        |    AND LEN(LIST_FILTER(STRING_SPLIT(TRIM(x), ' '), y -> y <> '')) >= 5
        |    AND NOT CONTAINS(LOWER(TRIM(x)), 'javascript')) AS kept
        |  FROM d),
        |r AS (SELECT doc_id, n_lines, kept,
        |  CASE WHEN CONTAINS(LOWER(text), 'lorem ipsum') THEN 'lorem_ipsum'
        |       WHEN CONTAINS(text, '{') THEN 'brace'
        |       WHEN LEN(kept) < 2 THEN 'too_few_sentences' END AS reason FROM k)
        |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(LEN(kept) AS BIGINT) AS n_kept, reason IS NULL AS keep, reason,
        |  ARRAY_TO_STRING(LIST_TRANSFORM(kept, x -> TRIM(x)), chr(10)) AS clean_text
        |FROM r""".stripMargin,
    // one naive global running sum (fine at oracle scale; the engine's
    // two-level form is the 10^12-row shape); DuckDB's windowed SUM is
    // HUGEINT and // keeps the width -> CAST every derived column
    "q_txt_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), y -> y <> '')) AS BIGINT) AS n_toks
        |  FROM documents),
        |c AS (SELECT doc_id, n_toks,
        |  CAST(COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM t)
        |SELECT doc_id, n_toks, start_tok,
        |  CAST(start_tok // 512 AS BIGINT) AS first_seq,
        |  CAST(CASE WHEN n_toks > 0 THEN (start_tok + n_toks - 1) // 512
        |       ELSE start_tok // 512 END AS BIGINT) AS last_seq,
        |  CAST(CASE WHEN n_toks > 0
        |       THEN (start_tok + n_toks - 1) // 512 - start_tok // 512 + 1
        |       ELSE 0 END AS BIGINT) AS n_seqs
        |FROM c""".stripMargin,
    "q_txt_domaincap" ->
      """SELECT doc_id, source,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) AS BIGINT) AS domain_rank,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id) <= 25 AS kept
        |FROM documents""".stripMargin,
    "q_txt_repetition" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
        |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |       FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-1)) AS i) t),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
        |a2 AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM c2 GROUP BY doc_id),
        |g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |       FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-2)) AS i) t),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
        |a3 AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
        |       SUM(c) AS tot FROM c3 GROUP BY doc_id)
        |SELECT d.doc_id, CAST(LEN(ws) AS BIGINT) AS n_words,
        | ROUND(CAST(LEN(ws) - LEN(LIST_DISTINCT(ws)) AS DOUBLE) / LEN(ws), 4) AS dup_word_frac,
        | COALESCE(ROUND(CAST(a2.mx AS DOUBLE) / a2.tot, 4), 0.0) AS top2_ratio,
        | COALESCE(ROUND(CAST(a3.dup AS DOUBLE) / a3.tot, 4), 0.0) AS dup3_frac
        |FROM d LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)""".stripMargin,
    // the SAME RE2-subset pattern strings as WebText.{Email,Ipv4,Phone}Pattern
    // (DuckDB strings keep backslashes raw); passes chained email -> ip ->
    // phone exactly as withPiiRedacted chains them
    "q_txt_pii" ->
      """WITH c AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 7 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
        |          || '@example.com now' ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR)
        |          || '.0.' || CAST(doc_id % 200 AS VARCHAR) || ' port' ELSE '' END
        |  || CASE WHEN doc_id % 13 = 0 THEN ' call +46 70 123 4567 today' ELSE '' END AS text
        |  FROM documents),
        |e AS (SELECT doc_id,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  REGEXP_REPLACE(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
        |  FROM c),
        |i AS (SELECT doc_id, n_emails,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
        |  REGEXP_REPLACE(t, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t
        |  FROM e)
        |SELECT doc_id, n_emails, n_ips,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(t, '\+[0-9]{1,3}[ -][0-9]{1,4}([ -][0-9]{2,4}){1,4}')) AS BIGINT) AS n_phones,
        |  REGEXP_REPLACE(t, '\+[0-9]{1,3}[ -][0-9]{1,4}([ -][0-9]{2,4}){1,4}', '<PHONE>', 'g') AS redacted
        |FROM i""".stripMargin,
    "q_dedup_canonical" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000, UPPER(text) || '  !! ' FROM documents
        |  WHERE doc_id % 9 = 0),
        |canon AS (SELECT doc_id, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(
        |    LOWER(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS ct
        |  FROM corpus)
        |SELECT MD5(ct) AS fingerprint, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  MIN(doc_id) AS min_id
        |FROM canon GROUP BY MD5(ct) HAVING COUNT(*) > 1""".stripMargin,
    // rank order is integer-only (tf_count DESC, df ASC, word ASC) and the
    // weight is the raw rational tf*N/(len*df) — see WebText.tfidfTopTerms
    "q_txt_tfidf" ->
      """WITH toks AS (SELECT doc_id, LEN(STRING_SPLIT(text, ' ')) AS len,
        |       UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, len, word, COUNT(*) AS tf_count
        |       FROM toks GROUP BY doc_id, len, word),
        |dfq AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY word),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |s AS (SELECT doc_id, word, tf_count, df,
        |      ROUND(CAST(tf_count AS DOUBLE) * n_docs / (len * df), 6) AS tfidf,
        |      ROW_NUMBER() OVER (PARTITION BY doc_id
        |        ORDER BY tf_count DESC, df ASC, word ASC) AS rnk
        |      FROM tf JOIN dfq USING (word) CROSS JOIN n)
        |SELECT doc_id, word, CAST(tf_count AS BIGINT) AS tf_count,
        |  CAST(df AS BIGINT) AS df, tfidf, CAST(rnk AS BIGINT) AS rnk
        |FROM s WHERE rnk <= 5""".stripMargin,
    "q_txt_composition" ->
      """SELECT lang, source,
        |  CAST(2*GROUPING(lang) + GROUPING(source) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_words,
        |  ROUND(AVG(LEN(STRING_SPLIT(text, ' '))), 4) AS avg_words
        |FROM documents GROUP BY ROLLUP (lang, source)""".stripMargin,
    // same rule order and ROUNDED-stat comparisons as WebText.curationFilter
    "q_txt_filter" ->
      """WITH d AS (SELECT doc_id, text, STRING_SPLIT(text, ' ') AS ws FROM documents),
        |g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
        |       FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-1)) AS i) t),
        |c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
        |a2 AS (SELECT doc_id, ROUND(CAST(MAX(c) AS DOUBLE)/SUM(c), 4) AS top2 FROM c2 GROUP BY doc_id),
        |g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |       FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-2)) AS i) t),
        |c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
        |a3 AS (SELECT doc_id, ROUND(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)/SUM(c), 4) AS dup3
        |       FROM c3 GROUP BY doc_id),
        |st AS (SELECT d.doc_id, LEN(ws) AS nw,
        |  ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)/LENGTH(text), 4) AS ar,
        |  ROUND(CAST(LENGTH(text) - (LEN(ws)-1) AS DOUBLE)/LEN(ws), 4) AS mtl,
        |  ROUND(CAST(LEN(ws) - LEN(LIST_DISTINCT(ws)) AS DOUBLE)/LEN(ws), 4) AS dwf,
        |  COALESCE(a2.top2, 0.0) AS top2, COALESCE(a3.dup3, 0.0) AS dup3
        |  FROM d LEFT JOIN a2 USING (doc_id) LEFT JOIN a3 USING (doc_id)),
        |r AS (SELECT doc_id,
        |  CASE WHEN nw < 20 THEN 'too_short' WHEN nw > 100000 THEN 'too_long'
        |       WHEN ar < 0.6 THEN 'low_alpha'
        |       WHEN mtl < 2.0 OR mtl > 12.0 THEN 'token_len'
        |       WHEN dwf > 0.6 THEN 'dup_words'
        |       WHEN top2 > 0.09 THEN 'top_2gram'
        |       WHEN dup3 > 0.05 THEN 'dup_3gram' END AS reason
        |  FROM st)
        |SELECT doc_id, reason IS NULL AS keep, reason FROM r""".stripMargin,
    "q_txt_chunks" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, s AS start_word,
        |      LIST_SLICE(ws, s, LEAST(s + 19, LEN(ws))) AS cws
        |      FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws), 15)) AS s) t)
        |SELECT doc_id, CAST((start_word - 1) // 15 AS BIGINT) AS chunk_idx,
        |  CAST(start_word AS BIGINT) AS start_word,
        |  CAST(LEN(cws) AS BIGINT) AS n_chunk_words,
        |  ARRAY_TO_STRING(cws, ' ') AS chunk_text
        |FROM c""".stripMargin,
    "q_txt_quantiles" ->
      """WITH h AS (SELECT lang AS grp, n_chars AS v, COUNT(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |cum AS (SELECT grp, v, c, SUM(c) OVER (PARTITION BY grp ORDER BY v
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM h),
        |tot AS (SELECT grp, SUM(c) AS n FROM h GROUP BY grp),
        |rk AS (SELECT grp, n, p, CAST(FLOOR((p * n + 99) / 100.0) AS BIGINT) AS rnk
        |       FROM tot, (SELECT UNNEST([10, 50, 90]) AS p) q)
        |SELECT cum.grp AS lang, CAST(p AS INT) AS p, CAST(n AS BIGINT) AS n,
        |  v AS q_value
        |FROM cum JOIN rk ON cum.grp IS NOT DISTINCT FROM rk.grp
        |WHERE cum >= rnk AND cum - c < rnk""".stripMargin,
    "q_dedup_contam" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |bench AS (SELECT text FROM documents WHERE doc_id % 17 = 0),
        |cw AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM corpus
        |       WHERE LEN(STRING_SPLIT(text, ' ')) >= 8),
        |csh AS (SELECT DISTINCT doc_id, ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
        |        ||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS s
        |        FROM cw, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-7)) AS i) t),
        |bw AS (SELECT STRING_SPLIT(text, ' ') AS ws FROM bench
        |       WHERE LEN(STRING_SPLIT(text, ' ')) >= 8),
        |bsh AS (SELECT DISTINCT ws[i]||' '||ws[i+1]||' '||ws[i+2]||' '||ws[i+3]
        |        ||' '||ws[i+4]||' '||ws[i+5]||' '||ws[i+6]||' '||ws[i+7] AS s
        |        FROM bw, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-7)) AS i) t)
        |SELECT csh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
        |FROM csh JOIN bsh USING (s) GROUP BY csh.doc_id""".stripMargin,
    // the SAME RE2-subset pattern string as TextAnalysis.BpePattern (leading
    // apostrophe doubled for the SQL literal; DuckDB strings keep backslashes
    // raw, so \p{L} / \t reach RE2 verbatim)
    "q_txt_bpe" ->
      """WITH toks AS (SELECT doc_id,
        |  LIST_FILTER(REGEXP_EXTRACT_ALL(text,
        |      '''(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^ \t\n\r\f\p{L}\p{N}]+|[ \t\n\r\f]+'),
        |    t -> NOT REGEXP_MATCHES(t, '^[ \t\n\r\f]+$')) AS tk
        | FROM documents)
        |SELECT doc_id, CAST(LEN(tk) AS BIGINT) AS n_bpe_tokens,
        | CAST(LEN(LIST_DISTINCT(tk)) AS BIGINT) AS uniq_bpe_tokens
        |FROM toks""".stripMargin,
    "q_stream_dedup" ->
      """WITH c AS (SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0),
        |r AS (SELECT MD5(text) AS fp, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rk
        |  FROM c)
        |SELECT fp, doc_id FROM r WHERE rk = 1""".stripMargin,
    // crawlChurn: same rank-2 pivot + distinct-trimmed-line set algebra;
    // counts non-negative so `//` == Spark div
    "q_txt_churn" ->
      """WITH p AS (SELECT doc_id,
        |    'http://c' || CAST(doc_id % 50 AS VARCHAR) || '.example/p' AS url,
        |    doc_id AS ts,
        |    'shared header' || chr(10) || 'L' || CAST(doc_id % 7 AS VARCHAR)
        |      || chr(10)
        |      || (CASE WHEN doc_id % 3 = 0 THEN 'extra line' || chr(10) ELSE '' END)
        |      || '  ' || chr(10) || 'tail ' || CAST(doc_id % 5 AS VARCHAR) AS text
        |  FROM documents),
        |r AS (SELECT url, text,
        |    ROW_NUMBER() OVER (PARTITION BY url ORDER BY ts DESC, text ASC) AS rn
        |  FROM p),
        |tw AS (SELECT url,
        |         MAX(CASE WHEN rn = 1 THEN text END) AS t1,
        |         MAX(CASE WHEN rn = 2 THEN text END) AS t2
        |       FROM r WHERE rn <= 2 GROUP BY url HAVING COUNT(*) = 2),
        |ls AS (SELECT url,
        |  LIST_DISTINCT(LIST_FILTER(LIST_TRANSFORM(STRING_SPLIT(t1, chr(10)),
        |    x -> TRIM(x)), x -> x <> '')) AS a,
        |  LIST_DISTINCT(LIST_FILTER(LIST_TRANSFORM(STRING_SPLIT(t2, chr(10)),
        |    x -> TRIM(x)), x -> x <> '')) AS b
        |  FROM tw),
        |c AS (SELECT url,
        |  CAST(LEN(LIST_FILTER(a, x -> NOT LIST_CONTAINS(b, x))) AS BIGINT) AS n_added,
        |  CAST(LEN(LIST_FILTER(b, x -> NOT LIST_CONTAINS(a, x))) AS BIGINT) AS n_removed,
        |  CAST(LEN(LIST_FILTER(a, x -> LIST_CONTAINS(b, x))) AS BIGINT) AS n_common
        |  FROM ls)
        |SELECT url, n_added, n_removed, n_common,
        |  CASE WHEN n_added + n_removed + n_common > 0
        |       THEN CAST((100 * (n_added + n_removed))
        |                 // (n_added + n_removed + n_common) AS BIGINT)
        |       ELSE 0 END AS churn100
        |FROM c""".stripMargin,

    // bigram surprisal: zipped slice unnests (the q_txt_bpe precedent) give
    // adjacent pairs; LENGTH(BIN(x)) = Spark length(bin(x)) exactly; every
    // SUM is CAST to BIGINT (DuckDB sums to HUGEINT — the q_tm_sessions
    // lesson) and the mean uses `//` = Spark `div` on non-negative Longs
    "q_txt_surprisal" ->
      """WITH w AS (SELECT doc_id,
        |  LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
        |    x -> x <> '') AS ws FROM documents),
        |b AS (SELECT doc_id, UNNEST(ws[1:LEN(ws)-1]) AS w1,
        |             UNNEST(ws[2:LEN(ws)]) AS w2
        |      FROM w WHERE LEN(ws) >= 2),
        |inst AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n
        |         FROM b GROUP BY doc_id, w1, w2),
        |pc AS (SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS c_pair
        |       FROM inst GROUP BY w1, w2),
        |lc AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c_left
        |       FROM inst GROUP BY w1),
        |sc AS (SELECT i.doc_id,
        |    CAST(SUM(i.n * (LENGTH(BIN(lc.c_left)) - LENGTH(BIN(pc.c_pair))))
        |         AS BIGINT) AS ss,
        |    CAST(SUM(i.n) AS BIGINT) AS nb
        |  FROM inst i
        |  JOIN pc ON pc.w1 = i.w1 AND pc.w2 = i.w2
        |  JOIN lc ON lc.w1 = i.w1
        |  GROUP BY i.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(nb, 0) AS n_bigrams,
        |  COALESCE(ss, 0) AS sum_surprisal,
        |  CASE WHEN COALESCE(nb, 0) > 0
        |       THEN CAST((100 * ss) // nb AS BIGINT) ELSE 0 END AS mean_surp100
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN sc ON sc.doc_id = d.doc_id""".stripMargin,
    "q_txt_tokens" ->
      """SELECT doc_id,
        | CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        | CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS uniq_tokens,
        | ROUND(CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS DOUBLE)
        |   / LEN(STRING_SPLIT(text, ' ')), 4) AS ttr
        |FROM documents""".stripMargin,
    "q_txt_quality" ->
      """SELECT doc_id,
        | CAST(LENGTH(text) AS BIGINT) AS n_chars,
        | CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens,
        | ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / LENGTH(text), 4) AS alpha_ratio,
        | ROUND(CAST(LENGTH(text) - (LEN(STRING_SPLIT(text, ' ')) - 1) AS DOUBLE)
        |   / LEN(STRING_SPLIT(text, ' ')), 4) AS mean_token_len
        |FROM documents""".stripMargin,
    "q_txt_langid" ->
      """WITH p AS (SELECT doc_id, ' ' || LOWER(text) || ' ' AS pt FROM documents)
        |SELECT doc_id,
        | CAST((LENGTH(pt)-LENGTH(REPLACE(pt,' the ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' a ','')))/3
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' and ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' of ','')))/4 AS BIGINT) AS en_hits,
        | CAST((LENGTH(pt)-LENGTH(REPLACE(pt,' och ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' att ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' det ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' en ','')))/4 AS BIGINT) AS sv_hits,
        | CASE WHEN CAST((LENGTH(pt)-LENGTH(REPLACE(pt,' och ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' att ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' det ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' en ','')))/4 AS BIGINT)
        |    > CAST((LENGTH(pt)-LENGTH(REPLACE(pt,' the ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' a ','')))/3
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' and ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' of ','')))/4 AS BIGINT) THEN 'sv'
        |  WHEN CAST((LENGTH(pt)-LENGTH(REPLACE(pt,' the ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' a ','')))/3
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' and ','')))/5
        |    + (LENGTH(pt)-LENGTH(REPLACE(pt,' of ','')))/4 AS BIGINT) > 0 THEN 'en'
        |  ELSE 'und' END AS pred_lang
        |FROM p""".stripMargin,
    "q_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)
        |SELECT MD5(text) AS fingerprint, COUNT(*) AS cnt, MIN(doc_id) AS min_id
        |FROM corpus GROUP BY MD5(text) HAVING COUNT(*) > 1""".stripMargin,
    "q_dedup_ngram" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents
        |           WHERE LEN(STRING_SPLIT(text, ' ')) >= 3),
        |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-2)) AS i) t),
        |sh AS (SELECT * FROM sh0 WHERE s IN
        |       (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 100)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS shared
        |          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |          GROUP BY x.doc_id, y.doc_id)
        |SELECT a_id, b_id,
        |  ROUND(CAST(shared AS DOUBLE)/(sa.n + sb.n - shared), 4) AS jac
        |FROM pairs JOIN sizes sa ON sa.doc_id = a_id JOIN sizes sb ON sb.doc_id = b_id
        |WHERE CAST(shared AS DOUBLE)/(sa.n + sb.n - shared) >= 0.5""".stripMargin,
    "q_dedup_containment" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:8], ' ')
        |  FROM documents WHERE doc_id % 5 = 0),
        |d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM corpus
        |      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3),
        |sh0 AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
        |       FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-2)) AS i) t),
        |sh AS (SELECT * FROM sh0 WHERE s IN
        |       (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 100)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |pairs AS (SELECT x.doc_id AS a_id, y.doc_id AS b_id, COUNT(*) AS shared
        |          FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
        |          GROUP BY x.doc_id, y.doc_id),
        |dir2 AS (
        |  SELECT a_id AS src_id, b_id AS dst_id,
        |    CAST(shared AS DOUBLE)/sa.n AS c
        |  FROM pairs JOIN sizes sa ON sa.doc_id = a_id
        |  UNION ALL
        |  SELECT b_id, a_id, CAST(shared AS DOUBLE)/sb.n
        |  FROM pairs JOIN sizes sb ON sb.doc_id = b_id)
        |SELECT src_id, dst_id, ROUND(c, 4) AS containment
        |FROM dir2 WHERE c >= 0.6""".stripMargin,
    "q_emb_cospairs" ->
      """WITH ev AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |            FROM embeddings, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i) t),
        |norms AS (SELECT vec_id, SQRT(SUM(v*v)) AS nrm FROM ev GROUP BY vec_id),
        |qv AS (SELECT * FROM ev WHERE vec_id % 50 = 0),
        |dots AS (SELECT qv.vec_id AS qid, ev.vec_id AS nid, SUM(qv.v*ev.v) AS dot
        |         FROM qv JOIN ev ON qv.i = ev.i WHERE qv.vec_id <> ev.vec_id
        |         GROUP BY qv.vec_id, ev.vec_id)
        |SELECT qid, nid, ROUND(dot/(nq.nrm*nc.nrm), 4) AS cos
        |FROM dots JOIN norms nq ON nq.vec_id = qid JOIN norms nc ON nc.vec_id = nid
        |WHERE dot/(nq.nrm*nc.nrm) >= 0.4""".stripMargin,
    "q_mm_meta" ->
      """SELECT doc_id,
        | CAST(OCTET_LENGTH(ENCODE('IMG|' || CAST(doc_id % 63 + 1 AS VARCHAR)
        |   || '|' || CAST(doc_id % 47 + 1 AS VARCHAR) || '|' || text)) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,
    "q_mm_decode" ->
      // bytes of the payload re-derived from its HEX dump (charset-agnostic);
      // mean_byte is the exact truncated 4-decimal rational, as in the stub
      """WITH p AS (SELECT doc_id, ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |    || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|' || text) AS payload
        |  FROM documents),
        |h AS (SELECT doc_id, HEX(payload) AS hx, OCTET_LENGTH(payload) AS n FROM p),
        |bytes AS (SELECT doc_id, n,
        |    (STRPOS('0123456789ABCDEF', SUBSTR(hx, 2*i-1, 1))-1)*16
        |    + STRPOS('0123456789ABCDEF', SUBSTR(hx, 2*i, 1))-1 AS bv
        |  FROM h, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, n)) AS i) t)
        |SELECT doc_id, 'IMG' AS kind,
        |  CAST(doc_id%63+1 AS INT) AS width, CAST(doc_id%47+1 AS INT) AS height,
        |  CAST(n AS BIGINT) AS n_bytes,
        |  (CAST(SUM(bv) AS BIGINT)*10000 // CAST(n AS BIGINT)) / 10000.0 AS mean_byte,
        |  CAST(COUNT(DISTINCT bv) AS INT) AS distinct_bytes
        |FROM bytes GROUP BY doc_id, n""".stripMargin,
    "q_mm_resize" ->
      // nearest-neighbor 8x8: source pixel (ty*h/8, tx*w/8), row-major body
      // after the ASCII header; bytes past a short body read 0
      """WITH p AS (SELECT doc_id, doc_id%63+1 AS sw, doc_id%47+1 AS sh,
        |    ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|' || text) AS payload,
        |    OCTET_LENGTH(ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|')) AS noff
        |  FROM documents),
        |hx AS (SELECT doc_id, sw, sh, noff, HEX(payload) AS hs,
        |       OCTET_LENGTH(payload) AS n FROM p),
        |px AS (SELECT doc_id,
        |    CASE WHEN noff + ((ty*sh)//8)*sw + (tx*sw)//8 < n THEN
        |      (STRPOS('0123456789ABCDEF',
        |         SUBSTR(hs, 2*(noff + ((ty*sh)//8)*sw + (tx*sw)//8)+1, 1))-1)*16
        |      + STRPOS('0123456789ABCDEF',
        |         SUBSTR(hs, 2*(noff + ((ty*sh)//8)*sw + (tx*sw)//8)+2, 1))-1
        |    ELSE 0 END AS bv
        |  FROM hx,
        |    LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS ty) a,
        |    LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS tx) b)
        |SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
        |  CAST(SUM(bv) AS BIGINT) AS checksum
        |FROM px GROUP BY doc_id""".stripMargin,
    "q_mm_frames" ->
      // every 2nd complete 16-byte frame of the body, byte-sum checksums
      """WITH p AS (SELECT doc_id,
        |    ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|' || text) AS payload,
        |    OCTET_LENGTH(ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|')) AS noff
        |  FROM documents),
        |hx AS (SELECT doc_id, noff, HEX(payload) AS hs,
        |       (OCTET_LENGTH(payload)-noff)//16 AS nf FROM p),
        |fr AS (SELECT doc_id, noff, hs, nf, fi FROM hx,
        |       LATERAL (SELECT UNNEST(GENERATE_SERIES(0, nf-1)) AS fi) f
        |       WHERE fi % 2 = 0),
        |bb AS (SELECT doc_id, nf, fi,
        |    (STRPOS('0123456789ABCDEF', SUBSTR(hs, 2*(noff + fi*16 + k)+1, 1))-1)*16
        |    + STRPOS('0123456789ABCDEF', SUBSTR(hs, 2*(noff + fi*16 + k)+2, 1))-1 AS bv
        |  FROM fr, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 15)) AS k) t)
        |SELECT doc_id, CAST(fi AS INT) AS frame_idx, CAST(nf AS INT) AS n_frames,
        |  CAST(SUM(bv) AS BIGINT) AS checksum
        |FROM bb GROUP BY doc_id, fi, nf""".stripMargin,
    "q_mm_embed" ->
      // body byte-value histogram folded mod 8; zero buckets present (the
      // dense cross join), counts as DOUBLE like the Spark embedding
      """WITH p AS (SELECT doc_id,
        |    ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|' || text) AS payload,
        |    OCTET_LENGTH(ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|')) AS noff
        |  FROM documents),
        |hx AS (SELECT doc_id, noff, HEX(payload) AS hs,
        |       OCTET_LENGTH(payload) AS n FROM p),
        |bytes AS (SELECT doc_id,
        |    ((STRPOS('0123456789ABCDEF', SUBSTR(hs, 2*j+1, 1))-1)*16
        |     + STRPOS('0123456789ABCDEF', SUBSTR(hs, 2*j+2, 1))-1) % 8 AS bucket
        |  FROM hx, LATERAL (SELECT UNNEST(GENERATE_SERIES(noff, n-1)) AS j) t),
        |cnt AS (SELECT doc_id, bucket, COUNT(*) AS c FROM bytes
        |        GROUP BY doc_id, bucket)
        |SELECT d.doc_id, CAST(s.i AS INT) AS i,
        |  CAST(COALESCE(c.c, 0) AS DOUBLE) AS v
        |FROM documents d
        |CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS i) s
        |LEFT JOIN cnt c ON c.doc_id = d.doc_id AND c.bucket = s.i""".stripMargin,
    "q_mm_simsearch" ->
      // pairwise cosine over the folded histograms: dot and squared norms
      // are exact integer sums, SQRT/division IEEE-identical in both engines
      """WITH p AS (SELECT doc_id,
        |    ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|' || text) AS payload,
        |    OCTET_LENGTH(ENCODE('IMG|' || CAST(doc_id%63+1 AS VARCHAR)
        |      || '|' || CAST(doc_id%47+1 AS VARCHAR) || '|')) AS noff
        |  FROM documents),
        |hx AS (SELECT doc_id, noff, HEX(payload) AS hs,
        |       OCTET_LENGTH(payload) AS n FROM p),
        |bytes AS (SELECT doc_id,
        |    ((STRPOS('0123456789ABCDEF', SUBSTR(hs, 2*j+1, 1))-1)*16
        |     + STRPOS('0123456789ABCDEF', SUBSTR(hs, 2*j+2, 1))-1) % 8 AS bucket
        |  FROM hx, LATERAL (SELECT UNNEST(GENERATE_SERIES(noff, n-1)) AS j) t),
        |hist AS (SELECT doc_id, bucket, CAST(COUNT(*) AS DOUBLE) AS c
        |         FROM bytes GROUP BY doc_id, bucket),
        |norms AS (SELECT doc_id, SQRT(SUM(c*c)) AS nrm FROM hist GROUP BY doc_id),
        |qh AS (SELECT * FROM hist WHERE doc_id % 50 = 0),
        |dots AS (SELECT qh.doc_id AS qid, hist.doc_id AS nid, SUM(qh.c*hist.c) AS dot
        |         FROM qh JOIN hist ON qh.bucket = hist.bucket
        |           AND qh.doc_id <> hist.doc_id
        |         GROUP BY qh.doc_id, hist.doc_id)
        |SELECT qid, nid, ROUND(dot/(nq.nrm*nc.nrm), 4) AS cos
        |FROM dots JOIN norms nq ON nq.doc_id = qid
        |JOIN norms nc ON nc.doc_id = nid
        |WHERE dot/(nq.nrm*nc.nrm) >= 0.99""".stripMargin)
}
