package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling/splitting gate (operators/Sampling.scala): the
 * affine hash is exact 64-bit integer arithmetic, so DuckDB recomputes the
 * SAME sample — a reproducible train/val/test split is exactly the property
 * being oracled. Cut points are computed ONCE here and embedded into both
 * the Spark call (internally identical formula) and the SQL literal, so an
 * off-by-one at a boundary hash value would hash-mismatch.
 */
object QueriesSampling {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val P = graft.operators.Sampling.P
  // the EXACT cut values withSplit/hashSample use (same fp computation)
  private val Seq(cut80, cut90, cut100) =
    graft.operators.Sampling.cutPoints(Seq(0.8, 0.1, 0.1))
  private val cut25 = math.floor(0.25 * P).toLong
  // q_sample_dsir keep threshold — interpolated into the oracle so the
  // gate entry and SQL can never drift (the q_txt_filter ADVICE lesson)
  private val dsirMin = -50L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // train/val/test split over documents; exact integer observables
    "q_sample_split" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Sampling
        .withSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = 42L)
        .groupBy("split")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_ids"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // Bernoulli(0.25) hash sample over events
    "q_sample_rate" -> ((s, dir) =>
      graft.operators.Sampling.hashSample(t(s, dir, "events"), "event_id", 0.25, salt = 3L)
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_ids"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))),

    // deterministic 50-per-stratum sample of events by type
    "q_sample_strat" -> ((s, dir) =>
      graft.operators.Sampling
        .stratifiedTopK(t(s, dir, "events"), Seq("event_type"), "event_id", k = 50, salt = 7L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_ids"))),

    // DSIR importance resampling: raw = all documents, target = the 'de'
    // slice; integer bit-length log-ratio scores, threshold shared with
    // the oracle via dsirMin
    "q_sample_dsir" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Sampling.importanceResample(
        docs, "doc_id", "text",
        docs.filter(col("lang") === "de"), "text",
        minMeanImp100 = dsirMin)
    }),

    // mixture token-budget allocation over a synthetic domain ladder with
    // a deliberately under-resourced 'rare' class (doc_id%1000 — high
    // weight, tiny corpus → rate caps at 1.0 and shortfall > 0 at every
    // sf) and a zero-weight 'micro' class (absent from the weight list →
    // rate 0); weights/budget/salt shared with the oracle as literals
    "q_sample_mixture" -> ((s, dir) =>
      graft.operators.Sampling.mixtureAllocate(
        t(s, dir, "documents").withColumn("domain",
          when(pmod(col("doc_id"), lit(1000L)) === 0, "rare")
            .when(pmod(col("doc_id"), lit(2L)) === 0, "mega")
            .when(pmod(col("doc_id"), lit(4L)) === 1, "mid")
            .when(pmod(col("doc_id"), lit(8L)) === 3, "small")
            .otherwise("micro")),
        "doc_id", "domain", "text",
        weightsPpm = Seq("mega" -> 350000L, "mid" -> 100000L,
          "small" -> 50000L, "rare" -> 500000L),
        budgetTokens = 20000L, salt = 13L)),

    // sqrt-temperature domain rebalancing over a skewed synthetic domain
    // column (geometric class sizes 1/2, 1/4, 1/8, 1/16, 1/16 — real
    // down-sampling at every rate tier incl. the kept-whole smallest)
    "q_sample_temp" -> ((s, dir) =>
      graft.operators.Sampling.temperatureRebalance(
        t(s, dir, "documents").withColumn("domain",
          when(pmod(col("doc_id"), lit(2L)) === 0, "mega")
            .when(pmod(col("doc_id"), lit(4L)) === 1, "mid")
            .when(pmod(col("doc_id"), lit(8L)) === 3, "small")
            .when(pmod(col("doc_id"), lit(16L)) === 7, "tiny")
            .otherwise("micro")),
        "doc_id", "domain", salt = 11L)))

  private def hsql(idExpr: String, salt: Long): String = {
    val m = graft.operators.Sampling.mixedMultiplier(salt)
    val b = graft.operators.Sampling.B + java.lang.Math.floorMod(salt, P)
    s"(($idExpr % $P) * $m + $b) % $P"
  }

  val oracle: Map[String, String] = Map(
    "q_sample_split" ->
      s"""WITH h AS (SELECT doc_id, n_chars, ${hsql("doc_id", 42L)} AS u FROM documents)
         |SELECT CASE WHEN u < $cut80 THEN 'train'
         |            WHEN u < $cut90 THEN 'val'
         |            WHEN u < $cut100 THEN 'test' ELSE 'rest' END AS split,
         |       COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
         |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM h GROUP BY 1""".stripMargin,
    "q_sample_rate" ->
      s"""SELECT COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_ids,
         |       MIN(event_id) AS min_id, MAX(event_id) AS max_id
         |FROM events WHERE ${hsql("event_id", 3L)} < $cut25""".stripMargin,
    "q_sample_strat" ->
      s"""WITH r AS (SELECT event_type, event_id,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY ${hsql("event_id", 7L)}, event_id) AS rn
         |  FROM events)
         |SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_ids
         |FROM r WHERE rn <= 50 GROUP BY event_type""".stripMargin,
    // mirrors importanceResample exactly; the mean is TRUNCATED toward
    // zero on both sides — Spark `div` truncates, DuckDB `//` FLOORS, so
    // the negative branch is written as -((100·|imp|) // n) explicitly
    "q_sample_dsir" ->
      s"""WITH rw AS (SELECT doc_id,
         |    UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
         |      x -> x <> '')) AS word FROM documents),
         |inst AS (SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS n
         |         FROM rw GROUP BY doc_id, word),
         |rc AS (SELECT word, CAST(SUM(n) + 1 AS BIGINT) AS r_w
         |       FROM inst GROUP BY word),
         |tw AS (SELECT
         |    UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '[^a-z]+'),
         |      x -> x <> '')) AS word FROM documents WHERE lang = 'de'),
         |tc AS (SELECT word, CAST(COUNT(*) + 1 AS BIGINT) AS t_w
         |       FROM tw GROUP BY word),
         |tot AS (SELECT (SELECT CAST(SUM(r_w) AS BIGINT) FROM rc) AS rt,
         |               (SELECT CAST(SUM(t_w) AS BIGINT) FROM tc) AS tt),
         |sc AS (SELECT i.doc_id,
         |    CAST(SUM(i.n * ((LENGTH(BIN(COALESCE(t.t_w, 1))) + LENGTH(BIN(tot.rt)))
         |                  - (LENGTH(BIN(r.r_w)) + LENGTH(BIN(tot.tt))))) AS BIGINT) AS iss,
         |    CAST(SUM(i.n) AS BIGINT) AS nw
         |  FROM inst i
         |  JOIN rc r ON r.word = i.word
         |  LEFT JOIN tc t ON t.word = i.word
         |  CROSS JOIN tot
         |  GROUP BY i.doc_id),
         |fin AS (SELECT d.doc_id, COALESCE(nw, 0) AS n_words,
         |               COALESCE(iss, 0) AS imp_sum
         |        FROM (SELECT doc_id FROM documents) d
         |        LEFT JOIN sc ON sc.doc_id = d.doc_id),
         |fm AS (SELECT doc_id, n_words, imp_sum,
         |    CASE WHEN n_words > 0 THEN
         |      CAST(CASE WHEN imp_sum >= 0 THEN (100 * imp_sum) // n_words
         |                ELSE -((100 * (-imp_sum)) // n_words) END AS BIGINT)
         |    ELSE 0 END AS mean_imp100 FROM fin)
         |SELECT doc_id, n_words, imp_sum, mean_imp100,
         |  (n_words > 0 AND mean_imp100 >= $dsirMin) AS kept FROM fm""".stripMargin,
    // mirrors mixtureAllocate step for step; every quantity is
    // non-negative BIGINT so DuckDB // == Spark div, and the per-doc keep
    // decision recomputes the affine hash (salt 13)
    "q_sample_mixture" ->
      s"""WITH d AS (SELECT doc_id,
         |    CASE WHEN doc_id % 1000 = 0 THEN 'rare'
         |         WHEN doc_id % 2 = 0 THEN 'mega'
         |         WHEN doc_id % 4 = 1 THEN 'mid'
         |         WHEN doc_id % 8 = 3 THEN 'small'
         |         ELSE 'micro' END AS domain,
         |    CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> ''))
         |      AS BIGINT) AS n_toks
         |  FROM documents),
         |hist AS (SELECT domain, COUNT(*) AS n_docs,
         |                CAST(SUM(n_toks) AS BIGINT) AS tokens
         |         FROM d GROUP BY domain),
         |w AS (SELECT * FROM (VALUES ('mega', CAST(350000 AS BIGINT)),
         |        ('mid', 100000), ('small', 50000), ('rare', 500000))
         |      AS t(domain, w_ppm)),
         |r AS (SELECT hist.domain, n_docs, tokens,
         |    COALESCE(w.w_ppm, 0) AS w_ppm,
         |    (20000 * COALESCE(w.w_ppm, 0)) // 1000000 AS target_tokens,
         |    CASE WHEN tokens > 0 THEN
         |      LEAST(1000000, (20000 * COALESCE(w.w_ppm, 0)) // tokens)
         |    ELSE 0 END AS rate_ppm
         |  FROM hist LEFT JOIN w ON w.domain = hist.domain),
         |r2 AS (SELECT *, (tokens * rate_ppm) // 1000000 AS expected_tokens
         |       FROM r),
         |r3 AS (SELECT *, GREATEST(0, target_tokens - expected_tokens)
         |         AS shortfall FROM r2),
         |a AS (SELECT d.domain, COUNT(*) AS n_kept,
         |             CAST(SUM(d.n_toks) AS BIGINT) AS kept_tokens
         |      FROM d JOIN r3 ON r3.domain = d.domain
         |      WHERE (${hsql("d.doc_id", 13L)}) * 1000000 < r3.rate_ppm * $P
         |      GROUP BY d.domain)
         |SELECT r3.domain, r3.n_docs, r3.tokens, r3.w_ppm,
         |  CAST(r3.rate_ppm AS BIGINT) AS rate_ppm,
         |  CAST(r3.target_tokens AS BIGINT) AS target_tokens,
         |  CAST(r3.expected_tokens AS BIGINT) AS expected_tokens,
         |  CAST(r3.shortfall AS BIGINT) AS shortfall,
         |  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
         |  COALESCE(a.kept_tokens, 0) AS kept_tokens
         |FROM r3 LEFT JOIN a ON a.domain = r3.domain""".stripMargin,
    // SQRT is IEEE-correctly-rounded, so keep_rate and the keep decision
    // (exact-int hash compared to rate * P as doubles) are bit-portable
    "q_sample_temp" ->
      s"""WITH d AS (SELECT doc_id,
         |    CASE WHEN doc_id % 2 = 0 THEN 'mega'
         |         WHEN doc_id % 4 = 1 THEN 'mid'
         |         WHEN doc_id % 8 = 3 THEN 'small'
         |         WHEN doc_id % 16 = 7 THEN 'tiny'
         |         ELSE 'micro' END AS domain
         |  FROM documents),
         |c AS (SELECT domain, COUNT(*) AS n_domain FROM d GROUP BY domain),
         |m AS (SELECT MIN(n_domain) AS n_min FROM c),
         |r AS (SELECT domain, n_domain,
         |        SQRT(CAST(n_min AS DOUBLE) / n_domain) AS keep_rate FROM c, m)
         |SELECT d.doc_id AS id, d.domain, r.n_domain, r.keep_rate,
         |  (CAST(${hsql("d.doc_id", 11L)} AS DOUBLE) < r.keep_rate * ${P}.0) AS kept
         |FROM d JOIN r USING (domain)""".stripMargin)
}
