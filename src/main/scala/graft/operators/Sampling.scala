package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, reproducible sampling and dataset splitting for training
 * pipelines (builder brief "operations a large-scale training-data pipeline
 * would need"): every decision is a pure function of (id, salt) — no RNG
 * state, no partition-order dependence — so a split is stable across
 * re-runs, cluster sizes, AND engines (the affine hash is exact 64-bit
 * integer arithmetic, recomputable verbatim in the DuckDB oracle).
 *
 * The hash: u(id) = ((id mod P) * mixedMultiplier(salt) + B + (salt mod P))
 * mod P, uniform over [0, P) with P = 2^31 - 1 (prime); the salt mixes the
 * MULTIPLIER (see [[mixedMultiplier]]) so different salts permute rather
 * than shift. (P-1) * mixedMultiplier stays well under 2^63 so the
 * product never overflows a BIGINT in either engine. Selection compares
 * u(id) < rate * P — one codegen'd comparison per row, no shuffle at all
 * for `hashSample`/`withSplit` (pure filters/projections: they compose
 * with any scan and push down past nothing because they ARE map-side).
 */
object Sampling {

  val P: Long = 2147483647L           // 2^31 - 1 (prime)
  private val A: Long = 1103515245L
  val B: Long = 12345L

  /** Salt-dependent multiplier in [1, P-1]. The salt must change the
    * PERMUTATION, not just shift it: an additive salt moves every hash by
    * the same offset, so two salts give near-identical samples (membership
    * flips only at boundary hash values — caught by SamplingSpec). All
    * intermediate products stay under 2^63 (salt reduced mod P first). */
  def mixedMultiplier(salt: Long): Long = {
    val sm = java.lang.Math.floorMod(salt, P)
    java.lang.Math.floorMod(A + sm * 2654435761L, P - 1) + 1
  }

  /** The uniform hash in [0, P) as a column (exact integer arithmetic —
    * (P-1) * m < 2^62, so no 64-bit overflow in any engine). */
  def uniformHash(id: Column, salt: Long): Column =
    pmod(pmod(id, lit(P)) * mixedMultiplier(salt) + B + java.lang.Math.floorMod(salt, P), lit(P))

  /**
   * Assign each row to a named split with the given weights (sum <= 1.0;
   * any remainder falls into `restLabel`). Cut points are computed in
   * integer space (floor(cumWeight * P)) so the boundary is exact and
   * engine-independent. Map-side only — no shuffle, stable under
   * repartitioning and incremental appends (a new row's split never
   * depends on other rows).
   */
  def withSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)], salt: Long = 0L,
                splitCol: String = "split", restLabel: String = "rest"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0), "weights must be non-negative")
    val total = weights.map(_._2).sum
    require(total <= 1.0 + 1e-12, s"weights must sum to <= 1, got $total")
    require(!df.columns.contains(splitCol), s"input already has a $splitCol column")
    val cuts = cutPoints(weights.map(_._2))
    val h = uniformHash(col(idCol), salt)
    val expr = weights.zip(cuts).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), cut)) =>
        Some(acc.fold(when(h < cut, label))(_.when(h < cut, label)))
    }.get.otherwise(restLabel)
    df.withColumn(splitCol, expr)
  }

  /** Integer cut points for cumulative weights — public so oracles embed
    * the EXACT same values (the cumulative double sum is not associative;
    * recomputing it differently can move a boundary by one hash value). */
  def cutPoints(weights: Seq[Double]): Seq[Long] =
    weights.scanLeft(0.0)(_ + _).tail.map(w => math.floor(w * P).toLong)

  /** Keep each row iff u(id) < rate * P — deterministic Bernoulli(rate)
    * sampling, reproducible with the same salt, disjoint across disjoint
    * [lo, hi) hash bands if callers partition the rate space manually. */
  def hashSample(df: DataFrame, idCol: String, rate: Double, salt: Long = 0L): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(uniformHash(col(idCol), salt) < math.floor(rate * P).toLong)
  }

  /**
   * Deterministic k-per-group subsample: rank rows inside each group by
   * (hash, id) and keep the first k — an unbiased fixed-size sample that is
   * identical on every run and engine. One shuffle on the group key; the
   * running rank window keeps O(1) state. For heavily skewed groups at the
   * 10^12 design point, pre-filter with `hashSample` at ~k/E[group size]
   * to cap the sorted volume, then take exact k from the survivors.
   */
  def stratifiedTopK(df: DataFrame, groupCols: Seq[String], idCol: String,
                     k: Int, salt: Long = 0L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(uniformHash(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /**
   * DSIR-style data selection via importance resampling (Xie et al.,
   * NeurIPS'23): score every raw-corpus document by how much more likely
   * its words are under a small TARGET corpus (the domain you want the
   * training mix to look like) than under the raw corpus itself, then keep
   * the high-importance slice. The published method samples with
   * probability ∝ exp(log-importance) over hashed n-gram features; this
   * engine keeps the log-importance formulation but measures it in INTEGER
   * bit-length units (the [[graft.operators.TextAnalysis.bigramSurprisal]]
   * portability rule — no float log whose last ulp could flip a boundary
   * doc between engines):
   *
   *   imp(w)  = (len(bin(t_w)) + len(bin(R))) - (len(bin(r_w)) + len(bin(T)))
   *   score   = Σ_w n_w · imp(w)   over the doc's words
   *
   * with t_w/r_w the add-one-smoothed word counts in target/raw, T/R the
   * corpora's total smoothed word masses — i.e. imp(w) ≈ log2 p_target(w)
   * − log2 p_raw(w), positive for target-flavored words. `mean_imp100` is
   * the fixed-point per-word mean; `kept` thresholds it at `minMeanImp100`
   * (compose [[hashSample]] downstream for rate control inside the kept
   * slice). Words the target never saw contribute the smoothed floor, so
   * an all-unknown doc scores negative and drops — the designed behavior.
   * Word domain is lowercased `[a-z]+` runs.
   *
   * Scale: the raw corpus is scanned ONCE into a checkpointed per-doc
   * (word, n) table ([[graft.operators.TextAnalysis.invertedIndex]]
   * lesson); the raw model re-aggregates it vocabulary-sized, the target
   * model aggregates the (small) target corpus and is BROADCAST into the
   * scoring join — the corpus-sized join keys on `word` alone, where the
   * per-doc pre-collapse already compressed the stopword skew.
   */
  def importanceResample(raw: DataFrame, idCol: String, textCol: String,
                         target: DataFrame, targetTextCol: String,
                         minMeanImp100: Long = 0L): DataFrame = {
    def words(c: Column) = filter(split(lower(c), "[^a-z]+"), w => length(w) > 0)
    val inst = raw
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("word"))
      .groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rawCounts = inst.groupBy("word").agg((sum("n") + 1L).as("r_w"))
    val tgtCounts = target
      .select(explode(words(col(targetTextCol))).as("word"))
      .groupBy("word").agg((count(lit(1)) + 1L).as("t_w"))
    // totals: every vocabulary word is +1-smoothed on both sides; words
    // only in the target still score via r_w = 1 (left join below).
    // A corpus with zero in-domain words yields a NULL sum — fall back to
    // mass 1 (bit-length 1) so degenerate inputs score 0 instead of NPEing
    // the driver or feeding numberOfLeadingZeros(0).
    def totalOf(agg: DataFrame): Long = {
      val row = agg.collect()(0)
      if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
    }
    val rTotal = totalOf(rawCounts.agg(sum("r_w")))
    val tTotal = totalOf(tgtCounts.agg(sum("t_w")))
    val rTotBits = 64 - java.lang.Long.numberOfLeadingZeros(rTotal)
    val tTotBits = 64 - java.lang.Long.numberOfLeadingZeros(tTotal)
    val binlen = (c: Column) => length(bin(c))
    val scored = inst
      .join(rawCounts, Seq("word"))
      .join(broadcast(tgtCounts), Seq("word"), "left")
      .withColumn("__imp",
        ((binlen(coalesce(col("t_w"), lit(1L))) + lit(rTotBits)) -
          (binlen(col("r_w")) + lit(tTotBits))).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("__imp")).as("imp_sum"), sum("n").as("n_words"))
    raw.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("imp_sum"), lit(0L)).as("imp_sum"))
      .withColumn("mean_imp100",
        when(col("n_words") > 0, expr("(100 * imp_sum) div n_words"))
          .otherwise(lit(0L)))
      .withColumn("kept",
        col("n_words") > 0 && col("mean_imp100") >= minMeanImp100)
  }

  /**
   * Temperature-based domain rebalancing (the multilingual-BERT /
   * data-mixing downsampling rule at temperature alpha = 0.5): per-domain
   * keep probability `sqrt(n_min / n_domain)`, so post-sample domain mass
   * scales with `sqrt(n_domain)` — mega-domains are damped, the smallest
   * domain is kept whole (rate exactly 1.0). Alpha is FIXED at 0.5 because
   * `SQRT` is the one power IEEE-754 requires correctly rounded — the
   * keep decision (`uniformHash(id, salt) < keep_rate * P`, one multiply +
   * one compare of exactly-representable values) is therefore bit-identical
   * across engines; a general `POWER(x, a)` is not and would flip boundary
   * docs between Spark and the oracle.
   *
   * Output: `(id, domain, n_domain, keep_rate, kept)` for every row —
   * filter `kept` for the sample, keep the rest as the audit trail. Scale
   * shape: ONE map-side-combined shuffle for the domain histogram; the
   * histogram (domain-cardinality-sized) broadcasts back, so the corpus
   * itself never shuffles.
   */
  /**
   * Training-mixture token-budget allocation — the data-mixing PLANNER a
   * pretraining run starts from (fixed target weights à la Pile/DoReMi,
   * complementing [[temperatureRebalance]]'s heuristic rule): given the
   * corpus's per-domain token mass and target mixture weights in ppm,
   * derive each domain's deterministic sampling rate so the sampled corpus
   * approaches `budgetTokens` distributed by the weights:
   *
   *   target_d   = (budgetTokens * w_ppm_d) div 10^6
   *   rate_ppm_d = min(10^6, (budgetTokens * w_ppm_d) div tokens_d)
   *   expected_d = (tokens_d * rate_ppm_d) div 10^6
   *   shortfall_d = max(0, target_d - expected_d)
   *
   * All BIGINT arithmetic (engine-portable; budgetTokens ≤ ~9·10^12 keeps
   * budget·w_ppm < 2^63). `shortfall > 0` flags an under-resourced domain:
   * the rate caps at 1.0 because sampling cannot mint tokens — the
   * epochs-vs-mixture tension surfaces as data instead of a silent
   * re-normalization. Domains absent from `weightsPpm` get weight 0 (rate
   * 0 — dropped from the mix but present in the output for audit). Tokens
   * are non-empty space-split words (the packSequences convention). The
   * per-doc decision is applied in the same pass —
   * `kept(id) = uniformHash(id, salt) * 10^6 < rate_ppm * P` — and
   * reported as (n_kept, kept_tokens) per domain, so the allocation AND
   * its realized sample are both in the audit row.
   *
   * Scale: TWO map-side-combined domain-histogram aggregations (allocate,
   * then apply — inherently two passes since rates derive from the
   * histogram); the weight table (mixture-sized, tens of rows) and the
   * rate table broadcast; the corpus itself never shuffles.
   */
  def mixtureAllocate(docs: DataFrame, idCol: String, domainCol: String,
                      textCol: String, weightsPpm: Seq[(String, Long)],
                      budgetTokens: Long, salt: Long = 0L): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(weightsPpm.forall(_._2 >= 0), "weights must be non-negative ppm")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col(idCol).as("id"), col(domainCol).as("domain"),
      size(filter(split(col(textCol), " "), w => w =!= ""))
        .cast("long").as("n_toks"))
    val hist = toks.groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("tokens"))
    val rates = hist
      .join(broadcast(weightsPpm.toDF("domain", "w_ppm")), Seq("domain"), "left")
      .withColumn("w_ppm", coalesce(col("w_ppm"), lit(0L)))
      .withColumn("target_tokens", expr(s"($budgetTokens * w_ppm) div 1000000"))
      .withColumn("rate_ppm",
        when(col("tokens") > 0,
          least(lit(1000000L), expr(s"($budgetTokens * w_ppm) div tokens")))
          .otherwise(lit(0L)))
      .withColumn("expected_tokens", expr("(tokens * rate_ppm) div 1000000"))
      .withColumn("shortfall",
        greatest(lit(0L), expr("target_tokens - expected_tokens")))
    val applied = toks
      .join(broadcast(rates.select(col("domain"), col("rate_ppm"))), Seq("domain"))
      .filter(uniformHash(col("id"), salt) * 1000000L < col("rate_ppm") * P)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_kept"), sum("n_toks").as("kept_tokens"))
    rates.join(applied, Seq("domain"), "left")
      .select(col("domain"), col("n_docs"), col("tokens"), col("w_ppm"),
        col("rate_ppm"), col("target_tokens"), col("expected_tokens"),
        col("shortfall"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
  }

  def temperatureRebalance(df: DataFrame, idCol: String, domainCol: String,
                           salt: Long = 0L): DataFrame = {
    val counts = df.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_domain"))
    val nmin = counts.agg(min(col("n_domain")).as("__n_min"))
    val rates = counts.crossJoin(broadcast(nmin))
      .withColumn("keep_rate",
        sqrt(col("__n_min").cast("double") / col("n_domain")))
      .select(col("domain"), col("n_domain"), col("keep_rate"))
    df.select(col(idCol).as("id"), col(domainCol).as("domain"))
      .join(broadcast(rates), Seq("domain"))
      .select(col("id"), col("domain"), col("n_domain"), col("keep_rate"),
        (uniformHash(col("id"), salt).cast("double") <
          col("keep_rate") * lit(P.toDouble)).as("kept"))
  }
}
