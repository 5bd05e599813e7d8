package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis, WebText}
import graft.operators.Dedup.PortableHash

/**
 * Oracle twins for the hash-based dedup/fingerprint operators: the SAME
 * operator machinery (shingling, min-signatures, banding, candidate dedup,
 * Jaccard verify, simhash votes, winnowing window-min) run with the portable
 * polynomial hashes of `Dedup.PortableHash` instead of xxhash64/JVM hashes,
 * so DuckDB can recompute every value from the same recurrences and the
 * driver gate hash-checks them (these were the last rows-only LLM-pipeline
 * entries; the xxhash64 production entries stay in QueriesText unchanged).
 *
 * The corpus is the real `documents` table with the q_dedup_exact duplicate
 * injection (doc_id%10==0 re-keyed +1e6) so exact-dup cliques, near-dup
 * chains and singletons are all exercised.
 */
object QueriesDedupOracle {

  /** documents.parquet is ONE input split at every test scale, so the
    * hash-heavy shingle/token map stage would run in a single task until the
    * first shuffle — spread it across the cluster up front. */
  private def docsParallel(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      .repartition(s.sparkContext.defaultParallelism, col("doc_id"))

  private def dupCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = docsParallel(s, dir)
    d.unionByName(d.filter(pmod(col("doc_id"), lit(10L)) === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_minhash_oracle" -> ((s, dir) =>
      Dedup.minhashLshPairs(dupCorpus(s, dir), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5, maxDocFreq = 100L,
        hashFn = PortableHash.shingleHash, bandHashFn = PortableHash.bandHash)),

    "q_dedup_simhash_oracle" -> ((s, dir) =>
      Dedup.simhashPairs(dupCorpus(s, dir), "doc_id", "text", maxHamming = 3,
        tokenHashFn = PortableHash.tokenHash)),

    "q_dedup_pipeline_oracle" -> ((s, dir) =>
      Dedup.dedupPipeline(dupCorpus(s, dir), "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5, maxDocFreq = 100L,
        hashFn = PortableHash.shingleHash, bandHashFn = PortableHash.bandHash)),

    "q_txt_fingerprint_oracle" -> ((s, dir) =>
      TextAnalysis.portableFingerprints(docsParallel(s, dir), "doc_id", "text")),

    // Bloom-bitset decontamination: same corpus/benchmark split as
    // q_dedup_contam (bench = docs %17), positions from the portable affine
    // family mod 2^16 — saturated enough for real false positives, which
    // surface as n_bloom > 0, n_exact = 0, contaminated = false rows
    "q_dedup_bloom_oracle" -> ((s, dir) =>
      WebText.bloomContamination(dupCorpus(s, dir),
        docsParallel(s, dir).filter(pmod(col("doc_id"), lit(17L)) === 0),
        "doc_id", "text", n = 8, numBits = 65536, numHashes = 3)),

    // incremental near-dup: new crawl batch vs the persisted corpus
    // signature table — %3 variant classes: exact dup / appended tail
    // (partial signature agreement) / fresh content (no match)
    "q_dedup_incr_oracle" -> ((s, dir) =>
      Dedup.incrementalMinhash(
        newBatch(s, dir),
        Dedup.minhashSignatures(docsParallel(s, dir), "doc_id", "text",
          n = 3, numHashes = 16, maxDocFreq = 100L,
          hashFn = PortableHash.shingleHash),
        "doc_id", "text", n = 3, numHashes = 16, bands = 4, minMatches = 8,
        maxDocFreq = 100L,
        hashFn = PortableHash.shingleHash, bandHashFn = PortableHash.bandHash)))

  /** new-crawl batch for incrementalMinhash: ids re-keyed +5e6; %3==0 exact
    * corpus dup, %3==1 the corpus text with an appended tail (near dup),
    * %3==2 fresh unique content. Reproduced verbatim in the oracle. */
  private def newBatch(s: SparkSession, dir: String): DataFrame =
    docsParallel(s, dir).select(
      (col("doc_id") + 5000000L).as("doc_id"),
      when(pmod(col("doc_id"), lit(3L)) === 0, col("text"))
        .when(pmod(col("doc_id"), lit(3L)) === 1,
          concat(col("text"), lit(" appended crawl tail words")))
        .otherwise(concat(lit("fresh content for document "),
          col("doc_id").cast("string"),
          lit(" entirely new words never seen before"))).as("text"))

  // ---------------- generated oracle SQL ----------------

  private val P1 = PortableHash.P1 // 1000000007
  private val P2 = PortableHash.P2 // 2147483647

  /** DuckDB recomputation of PortableHash.charPoly(s, b, p). */
  private def digestSql(s: String, b: Long, p: Long): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(generate_series(1, LENGTH($s)), ii ->
       |        CAST(ascii(substr($s, CAST(ii AS INT), 1)) AS BIGINT))),
       |      (acc, c) -> (acc*$b + c) % $p)""".stripMargin

  private val corpusCte =
    """corpus AS (SELECT doc_id, text FROM documents
      |           UNION ALL
      |           SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 10 = 0)"""
      .stripMargin

  /** shingle + capped-shingle + digest CTEs over a (doc_id, text) relation. */
  private def shingleCtes(rel: String): String =
    s"""d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM $rel
       |      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3),
       |sh0 AS (SELECT DISTINCT doc_id AS id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |        FROM d, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-2)) AS i) t),
       |sh AS (SELECT * FROM sh0 WHERE s IN
       |       (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 100)),
       |dg AS (SELECT id, s, ${digestSql("s", 131L, P1)} AS dv FROM sh)""".stripMargin

  /** sig/bucket/candidate/Jaccard CTEs (16 affine minhashes, 4 bands). */
  private val minhashCtes: String = {
    val sigCols = (0 until 16).map(i =>
      s"MIN(((${37 + 2 * i}*dv + ${1000003L * i + 17}) % $P1)) AS h$i").mkString(",\n    ")
    val bandRows = (0 until 4).map { b =>
      val expr = (0 until 4).foldLeft(s"CAST(${1000003L + b} AS BIGINT)") { (acc, r) =>
        s"(($acc)*1048573 + h${b * 4 + r}) % $P1"
      }
      s"SELECT id, $b AS band, $expr AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""sig AS (SELECT id,
       |    $sigCols
       |  FROM dg GROUP BY id),
       |bk AS ($bandRows),
       |cand AS (SELECT DISTINCT x.id AS a_id, y.id AS b_id FROM bk x JOIN bk y
       |         ON x.band = y.band AND x.bh = y.bh AND x.id < y.id),
       |sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
       |shared AS (SELECT c.a_id, c.b_id, COUNT(*) AS shared
       |           FROM cand c JOIN sh xa ON xa.id = c.a_id
       |                       JOIN sh xb ON xb.id = c.b_id AND xb.s = xa.s
       |           GROUP BY c.a_id, c.b_id),
       |pr AS (SELECT a_id, b_id,
       |    ROUND(CAST(shared AS DOUBLE)/(sa.n + sb.n - shared), 4) AS jac
       |  FROM shared JOIN sizes sa ON sa.id = a_id JOIN sizes sb ON sb.id = b_id
       |  WHERE CAST(shared AS DOUBLE)/(sa.n + sb.n - shared) >= 0.5)""".stripMargin
  }

  /** suffix-parameterized shingle+digest CTEs over a (doc_id, text)
    * relation (maxDocFreq = 100, like [[shingleCtes]]) — the incremental
    * oracle needs TWO independent shingle pipelines (corpus + new batch). */
  private def shingleCtesSfx(rel: String, x: String): String =
    s"""d$x AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM $rel
       |      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3),
       |sh0$x AS (SELECT DISTINCT doc_id AS id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
       |        FROM d$x, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-2)) AS i) t),
       |sh$x AS (SELECT * FROM sh0$x WHERE s IN
       |       (SELECT s FROM sh0$x GROUP BY s HAVING COUNT(*) <= 100)),
       |dg$x AS (SELECT id, s, ${digestSql("s", 131L, P1)} AS dv FROM sh$x)""".stripMargin

  /** 16 affine minhashes over dg<x> -> sig<x>. */
  private def sigCteSfx(x: String): String = {
    val sigCols = (0 until 16).map(i =>
      s"MIN(((${37 + 2 * i}*dv + ${1000003L * i + 17}) % $P1)) AS h$i").mkString(",\n    ")
    s"""sig$x AS (SELECT id,
       |    $sigCols
       |  FROM dg$x GROUP BY id)""".stripMargin
  }

  /** 4 band-bucket keys over sig<x> -> bk<x>. */
  private def bandCteSfx(x: String): String = {
    val bandRows = (0 until 4).map { b =>
      val expr = (0 until 4).foldLeft(s"CAST(${1000003L + b} AS BIGINT)") { (acc, r) =>
        s"(($acc)*1048573 + h${b * 4 + r}) % $P1"
      }
      s"SELECT id, $b AS band, $expr AS bh FROM sig$x"
    }.mkString("\n  UNION ALL ")
    s"bk$x AS ($bandRows)"
  }

  val oracle: Map[String, String] = Map(
    // re-derives every bloom decision: shingle digests -> 3 affine positions
    // mod 65536, benchmark bit set = distinct positions, a corpus shingle is
    // bloom-positive iff ALL its positions are set (COUNT of matched j-rows
    // = 3), exact verify joins the positive sliver on the raw shingle
    "q_dedup_bloom_oracle" -> {
      val posExpr = s"((37 + 2*j)*dv + (1000003*j + 17)) % $P1 % 65536"
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
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
         |        FROM bw, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(ws)-7)) AS i) t),
         |bdg AS (SELECT s, ${digestSql("s", 131L, P1)} AS dv FROM bsh),
         |bpos AS (SELECT DISTINCT $posExpr AS pos
         |         FROM bdg, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS j) g),
         |cdg AS (SELECT doc_id, s, ${digestSql("s", 131L, P1)} AS dv FROM csh),
         |cpos AS (SELECT doc_id, s, $posExpr AS pos
         |         FROM cdg, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS j) g),
         |hit AS (SELECT doc_id, s FROM cpos LEFT JOIN bpos ON cpos.pos = bpos.pos
         |        GROUP BY doc_id, s HAVING COUNT(bpos.pos) = 3),
         |ex AS (SELECT doc_id, COUNT(*) AS n_exact
         |       FROM hit JOIN bsh USING (s) GROUP BY doc_id),
         |nb AS (SELECT doc_id, COUNT(*) AS n_bloom FROM hit GROUP BY doc_id)
         |SELECT nb.doc_id, CAST(nb.n_bloom AS BIGINT) AS n_bloom,
         |  CAST(COALESCE(ex.n_exact, 0) AS BIGINT) AS n_exact,
         |  COALESCE(ex.n_exact, 0) >= 1 AS contaminated
         |FROM nb LEFT JOIN ex USING (doc_id)""".stripMargin
    },
    "q_dedup_incr_oracle" -> {
      val agree = (0 until 16)
        .map(i => s"(CASE WHEN a.h$i = b.h$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH newrel AS (SELECT doc_id + 5000000 AS doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN text
         |         WHEN doc_id % 3 = 1 THEN text || ' appended crawl tail words'
         |         ELSE 'fresh content for document ' || CAST(doc_id AS VARCHAR)
         |              || ' entirely new words never seen before' END AS text
         |  FROM documents),
         |${shingleCtesSfx("documents", "c")},
         |${sigCteSfx("c")},
         |${bandCteSfx("c")},
         |${shingleCtesSfx("newrel", "nb")},
         |${sigCteSfx("nb")},
         |${bandCteSfx("nb")},
         |cand AS (SELECT DISTINCT n.id AS id, c.id AS cid
         |         FROM bknb n JOIN bkc c ON n.band = c.band AND n.bh = c.bh),
         |score AS (SELECT cand.id, cand.cid, CAST($agree AS BIGINT) AS agree
         |          FROM cand JOIN signb a ON a.id = cand.id
         |                    JOIN sigc b ON b.id = cand.cid),
         |best AS (SELECT id, cid, agree,
         |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY agree DESC, cid ASC) AS rn
         |  FROM score WHERE agree >= 8),
         |allnew AS (SELECT DISTINCT doc_id AS id FROM newrel)
         |SELECT allnew.id, best.cid AS matched_id, best.agree,
         |  best.cid IS NOT NULL AS is_dup
         |FROM allnew LEFT JOIN best ON best.id = allnew.id AND best.rn = 1""".stripMargin
    },

    "q_dedup_minhash_oracle" ->
      s"""WITH $corpusCte,
         |${shingleCtes("corpus")},
         |$minhashCtes
         |SELECT a_id, b_id, jac FROM pr""".stripMargin,

    "q_dedup_simhash_oracle" ->
      s"""WITH $corpusCte,
         |tok AS (SELECT doc_id AS id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM corpus),
         |dgt AS (SELECT id, ${digestSql("tok", 131L, P2)} * 2147483648
         |          + ${digestSql("tok", 137L, P2)} AS h FROM tok),
         |votes AS (SELECT id, b,
         |    SUM(CASE WHEN ((h >> CAST(b AS INT)) & 1) = 1 THEN 1 ELSE -1 END) AS v
         |  FROM dgt, LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 63)) AS b) t
         |  GROUP BY id, b),
         |sig AS (SELECT id, CAST(SUM(CASE WHEN v > 0
         |    THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE CAST(0 AS BIGINT) END)
         |    AS BIGINT) AS sh FROM votes GROUP BY id)
         |SELECT a.id AS a_id, b.id AS b_id,
         |  CAST(BIT_COUNT(XOR(a.sh, b.sh)) AS INT) AS hamming
         |FROM sig a JOIN sig b ON a.id < b.id
         |WHERE BIT_COUNT(XOR(a.sh, b.sh)) <= 3""".stripMargin,

    "q_dedup_pipeline_oracle" ->
      s"""WITH RECURSIVE $corpusCte,
         |rep AS (SELECT text, MIN(doc_id) AS rep_id FROM corpus GROUP BY text),
         |reps AS (SELECT rep_id AS doc_id, text FROM rep),
         |${shingleCtes("reps")},
         |$minhashCtes,
         |e AS (SELECT a_id AS u, b_id AS v FROM pr
         |      UNION SELECT b_id, a_id FROM pr),
         |reach(id, lbl) AS (
         |  SELECT rep_id, rep_id FROM rep
         |  UNION
         |  SELECT e.u, r.lbl FROM reach r JOIN e ON e.v = r.id WHERE r.lbl < e.u),
         |comp AS (SELECT id, MIN(lbl) AS comp FROM reach GROUP BY id)
         |SELECT c.doc_id AS id, COALESCE(cp.comp, c.doc_id) AS canonical_id
         |FROM corpus c LEFT JOIN rep rp ON rp.text = c.text
         |              LEFT JOIN comp cp ON cp.id = rp.rep_id""".stripMargin,

    "q_txt_fingerprint_oracle" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE LENGTH(text) >= 23),
         |hs AS (SELECT doc_id, list_transform(generate_series(1, LENGTH(text)-7), i ->
         |    list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(generate_series(i, i+7), j ->
         |        CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
         |      (acc, c) -> (acc*31 + c) % $P2)) AS hl
         |  FROM docs)
         |SELECT DISTINCT doc_id, list_min(hl[(s*16+1):(s*16+16)]) AS fp
         |FROM hs, LATERAL (SELECT UNNEST(GENERATE_SERIES(0,
         |  CAST((LEN(hl)-16)//16 AS BIGINT))) AS s) w""".stripMargin)
}
