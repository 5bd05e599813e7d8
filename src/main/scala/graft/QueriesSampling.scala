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
