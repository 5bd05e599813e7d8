package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/**
 * Similarity / embedding-dedup operators behind the DuckDB oracle on an
 * INTEGRAL-vector fixture (the modular-arithmetic synthesis trick): 16-dim
 * vectors with small-integer components derived from `o_orderkey`, so dot
 * products and squared norms are exact in DOUBLE regardless of summation
 * order — cosine values are bit-identical in Spark and DuckDB, which makes
 * rank ORDER and threshold crossings reproducible (the reason `q_emb_topk`
 * on random float embeddings had to stay rows-only).
 *
 * Components depend on k through k%1000, so vector patterns REPEAT across
 * the corpus: exact-duplicate vectors produce exact cosine ties (the
 * `nid`-ascending tie-break is really exercised) and give the near-dup
 * grouping non-trivial duplicate cliques plus cross-pattern merges.
 *
 *  - `q_emb_topk_oracle`: brute-force top-5 by cosine; oracle recomputes the
 *    full ranking with a ROW_NUMBER window.
 *  - `q_emb_ivf_oracle`: `ivfTopK` probing ALL cells (nprobe = nlist) — the
 *    exactness property SimilaritySpec asserts, now hash-checked against the
 *    same brute-force SQL (IVF == exact when every inverted list is probed).
 *  - `q_dedup_embcos_oracle`: embedding-cosine near-dup grouping at 0.8 →
 *    connected components; the oracle recomputes components from first
 *    principles with a recursive min-label reachability CTE.
 */
object QueriesEmbOracle {

  private val mults = Seq(3, 5, 7, 11, 13, 17, 37, 41, 43, 47, 53, 59, 61, 67, 71, 73)
  private val mods  = Seq(19, 23, 29, 31, 19, 23, 29, 31, 19, 23, 29, 31, 19, 23, 29, 31)

  /** 16 small-integer components: v_i = (k%1000 * m_i) % M_i - (M_i-1)/2 —
    * zero-mean per dim, mixed moduli so distinct patterns de-correlate; an
    * all-zero vector would need k%1000 ≡ (M_i-1)/(2 m_i) mod M_i for all 16
    * dims at once (does not happen below lcm of the moduli). */
  private def vecCol: Column = array(mults.zip(mods).map { case (m, md) =>
    (pmod(pmod(col("k"), lit(1000L)) * m, lit(md.toLong)) - (md - 1) / 2)
      .cast("float")
  }: _*)

  /** Fixture corpus capped at the first 20k keys: these entries verify the
    * EXACT brute-force baselines, whose cost is quadratic in the corpus —
    * uncapped, the fixture grows with the scale factor and q_emb_topk_oracle
    * alone took ~30 min at sf0.1 (150k orders -> 450M scored pairs) for zero
    * extra verification value. ORDER BY k LIMIT is a TakeOrdered in Spark
    * and deterministic in both engines; sf0.001/sf0.01 sit below the cap,
    * so their results are unchanged. The SCALE paths (ANN/LSH/IVF pruning)
    * are exercised on uncapped corpora elsewhere. */
  private val CorpusCap = 20000
  private def base(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .orderBy("k").limit(CorpusCap)
      // limit() collapses to ONE partition; without this repartition the
      // whole corpus×queries pair fan-out downstream runs in a single task
      // (observed: one core pegged on the interpreted aggregate() dot
      // product at sf0.1 while 31 idled)
      .repartition(32, col("k"))
      .select(col("k").as("vid"), vecCol.as("emb"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_emb_topk_oracle" -> ((s, dir) => {
      val f = base(s, dir)
      Similarity.topK(f, f.filter(pmod(col("vid"), lit(50L)) === 0),
        "vid", "emb", k = 5)
    }),

    "q_emb_ivf_oracle" -> ((s, dir) => {
      val f = base(s, dir)
      Similarity.ivfTopK(f, f.filter(pmod(col("vid"), lit(50L)) === 0),
        "vid", "emb", k = 5, nlist = 8, nprobe = 8)
        .select("qid", "nid", "rank")
    }),

    "q_dedup_embcos_oracle" -> ((s, dir) =>
      Dedup.embeddingNearDupGroups(
        base(s, dir).filter(pmod(col("vid"), lit(7L)) === 0),
        "vid", "emb", threshold = 0.8)),

    "q_emb_ann_oracle" -> ((s, dir) => {
      // multi-probe hyperplane ANN: the oracle embeds the exact plane
      // coefficients as double literals and expresses the radius-1 probe set
      // as bit_count(xor(bucket_q, bucket_c)) <= 1
      val f = base(s, dir)
      Similarity.annTopK(f, f.filter(pmod(col("vid"), lit(50L)) === 0),
        "vid", "emb", k = 5, nBits = 8, probeRadius = 1)
    }))

  // ---- oracle SQL (generated — 16 explicit dims keep DuckDB plan simple) --

  private val vecSqlCols: String = mults.zip(mods).zipWithIndex.map {
    case ((m, md), i) =>
      s"CAST((o_orderkey%1000*$m)%$md-${(md - 1) / 2} AS DOUBLE) AS v$i"
  }.mkString(",\n    ")

  private def dotExpr(a: String, c: String): String =
    (0 until 16).map(i => s"$a.v$i*$c.v$i").mkString("+")
  private def normExpr(a: String): String =
    "SQRT(" + (0 until 16).map(i => s"$a.v$i*$a.v$i").mkString("+") + ")"

  private val topkSql: String =
    s"""WITH b AS (SELECT o_orderkey AS k,
       |    $vecSqlCols
       |  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20000)),
       |q AS (SELECT * FROM b WHERE k%50=0),
       |s AS (SELECT q.k AS qid, c.k AS nid,
       |  (${dotExpr("q", "c")})/(${normExpr("q")}*${normExpr("c")}) AS cos
       |  FROM q JOIN b c ON c.k <> q.k),
       |r AS (SELECT qid, nid,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
       |  FROM s)
       |SELECT qid, nid, CAST(rk AS INT) AS rank FROM r WHERE rk <= 5""".stripMargin

  /** per-plane signed projection, chained left-to-right in dimension order
    * (matches the UDF's accumulation order bit for bit). */
  private val annSql: String = {
    val planes = Similarity.lshPlanes(8, 16)
    val sCols = planes.zipWithIndex.map { case (cs, p) =>
      cs.zipWithIndex.map { case (c, d) => s"v$d*(${c})" }.mkString(" + ") + s" AS s$p"
    }.mkString(",\n    ")
    val bucket = (0 until 8)
      .map(p => s"(CASE WHEN s$p > 0 THEN ${1L << p} ELSE 0 END)").mkString(" + ")
    s"""WITH b AS (SELECT o_orderkey AS k,
       |    $vecSqlCols
       |  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20000)),
       |sp AS (SELECT *,
       |    $sCols
       |  FROM b),
       |bk AS (SELECT *, CAST($bucket AS BIGINT) AS bucket FROM sp),
       |q AS (SELECT * FROM bk WHERE k%50=0),
       |sc AS (SELECT q.k AS qid, c.k AS nid,
       |  (${dotExpr("q", "c")})/(${normExpr("q")}*${normExpr("c")}) AS cos
       |  FROM q JOIN bk c ON c.k <> q.k
       |    AND BIT_COUNT(XOR(q.bucket, c.bucket)) <= 1),
       |r AS (SELECT qid, nid, cos,
       |  ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rk
       |  FROM sc)
       |SELECT qid, nid, CAST(rk AS INT) AS rank, ROUND(cos, 4) AS cos
       |FROM r WHERE rk <= 5""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_emb_topk_oracle" -> topkSql,
    // IVF probing all cells is exactly the brute-force ranking
    "q_emb_ivf_oracle" -> topkSql,
    "q_emb_ann_oracle" -> annSql,

    "q_dedup_embcos_oracle" ->
      s"""WITH RECURSIVE b AS (SELECT o_orderkey AS k,
         |    $vecSqlCols
         |  FROM (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20000) WHERE o_orderkey%7=0),
         |e AS (SELECT a.k AS u, c.k AS v FROM b a JOIN b c ON a.k <> c.k
         |  WHERE (${dotExpr("a", "c")})/(${normExpr("a")}*${normExpr("c")}) >= 0.8),
         |reach(id, lbl) AS (
         |  SELECT k, k FROM b
         |  UNION
         |  SELECT e.u, r.lbl FROM reach r JOIN e ON e.v = r.id WHERE r.lbl < e.u)
         |SELECT id, MIN(lbl) AS canonical_id FROM reach GROUP BY id""".stripMargin)
}
