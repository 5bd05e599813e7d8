package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Document deduplication operators for large-scale training-data pipelines.
 * All shuffle-friendly: exact dedup is one hash groupBy; near-dup methods
 * block candidates (LSH bands / simhash chunks / shared shingles) so the
 * pairwise verification never goes quadratic — the only joins are equi-joins
 * on block keys, which partition cleanly at 10^12-row scale.
 */
object Dedup {

  /**
   * Portable arithmetic hashes for the oracle twins of the hash-based dedup
   * operators: a polynomial character digest mod a prime, computable as pure
   * column expressions here AND as plain SQL in any engine (DuckDB recomputes
   * it with list_reduce over the same recurrence) — so minhash/simhash/
   * fingerprint outputs become hash-checkable instead of rows-only. The
   * production default stays xxhash64 (faster, wider); only the hash is
   * swapped, the operator machinery (shingling, min-signatures, banding,
   * candidate dedup, verification) is IDENTICAL in both modes.
   */
  object PortableHash {
    val P1: Long = 1000000007L   // minhash digest / affine modulus
    val P2: Long = 2147483647L   // simhash half-digest + fingerprint modulus

    /** digest(s) = fold over chars: acc <- (acc*b + code(c)) mod p, init 0.
      *
      * Folds over split(s, "") (one O(len) pass to per-codepoint strings),
      * NOT over position indexes with substr(s, i, 1): UTF8String.substring
      * seeks from the start of the string, so the positional form cost
      * O(len^2) per digest inside the interpreted higher-order fold —
      * jstack'd as the dominant cost of the portable-hash gate entries at
      * sf0.1. Values are identical: split("") yields the same code-point
      * sequence substr walked (Java regex zero-width matches never split
      * surrogate pairs), the trailing "" is filtered out, and the empty
      * string folds to 0 under both forms. */
    def charPoly(s: Column, b: Long, p: Long): Column =
      aggregate(filter(split(s, ""), c => c =!= lit("")), lit(0L),
        (acc, c) => pmod(acc * b + ascii(c), lit(p)))

    /** minhash family member i: affine transform of the base-131 digest. */
    val shingleHash: (Int, Column) => Column = (i, sh) =>
      pmod(lit(37L + 2 * i) * charPoly(sh, 131L, P1) + lit(1000003L * i + 17L), lit(P1))

    /** band-bucket key: polynomial fold of the band's minhash values. */
    val bandHash: (Int, Seq[Column]) => Column = (b, hs) =>
      hs.foldLeft(lit(1000003L + b): Column)((acc, h) => pmod(acc * 1048573L + h, lit(P1)))

    /** 62-bit token hash: two independent digests packed side by side. */
    val tokenHash: Column => Column = tok =>
      charPoly(tok, 131L, P2) * 2147483648L + charPoly(tok, 137L, P2)
  }

  /** word n-gram shingles, distinct per doc. Output: (id, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    docs
      .withColumn("__ws", split(col(textCol), " "))
      .filter(size(col("__ws")) >= n)
      .select(col(idCol).as("id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("__ws")) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(col("__ws"), i + k)): _*))))
          .as("shingle"))
  }

  /** exact duplicate groups by content hash (md5 over UTF-8 bytes). */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(encode(col(textCol), "UTF-8")).as("fingerprint"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("min_id"))
      .filter(col("cnt") > 1)

  /** `shingles` with a document-frequency cap: shingles appearing in more
    * than `maxDocFreq` documents are dropped BEFORE any pairing. On web text
    * one ubiquitous stop-phrase shingle shared by 10^8 docs makes a
    * shared-shingle block quadratic (VERDICT r1 #5) — the standard fix is to
    * treat such shingles as carrying no dedup signal. The anti-join side is
    * tiny (only ubiquitous shingles) so Catalyst/AQE broadcasts it. */
  def cappedShingles(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = shingles(docs, idCol, textCol, n)
    if (maxDocFreq == Long.MaxValue) sh
    else {
      val hot = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDocFreq).select("shingle")
      sh.join(hot, Seq("shingle"), "left_anti")
    }
  }

  /** exact Jaccard for an explicit pair list: shared-shingle counts come from
    * two equi-joins of the pairs against the shingle table — work is
    * O(|pairs| × shingles/doc), never a corpus self-join. */
  private def jaccardOfPairs(pairs: DataFrame, sh: DataFrame,
                             threshold: Double): DataFrame = {
    val shared = pairs
      .join(sh.select(col("id").as("a_id"), col("shingle")), Seq("a_id"))
      .join(sh.select(col("id").as("b_id"), col("shingle")), Seq("b_id", "shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("shared"))
    jaccardTail(shared, sh, threshold)
  }

  /** shared tail of both Jaccard paths: attach set sizes, compute and
    * threshold the coefficient (ONE formula/rounding contract to keep in
    * sync with the oracle SQL). */
  private def jaccardTail(shared: DataFrame, sh: DataFrame,
                          threshold: Double): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    shared
      .join(sizes.select(col("id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .withColumn("jac", col("shared").cast("double") / (col("na") + col("nb") - col("shared")))
      .filter(col("jac") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jac"), 4).as("jac"))
  }

  /** exact n-gram Jaccard similarity pairs (a < b) above `threshold` —
    * blocked by shared shingle, so only docs sharing ≥1 shingle ever pair;
    * `maxDocFreq` bounds the block width (gate query + oracle mirror it). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = cappedShingles(docs, idCol, textCol, n, maxDocFreq).cache()
    val shared = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    // materialize the (small) pair output, then free the shingle cache — a
    // lazy return would leave it pinned in executor storage for the session
    val out = jaccardTail(shared, sh, threshold).transform(Materialize(_))
    sh.unpersist()
    out
  }

  /**
   * Directional shingle-containment pairs (Broder's containment
   * c(A,B) = |S(A)∩S(B)| / |S(A)|, the resemblance metric's asymmetric
   * sibling): detects PARTIAL duplication — a quoted excerpt, a page
   * embedding another page's paragraph — where symmetric Jaccard stays low
   * because the containing document is much larger. Output:
   * (src_id, dst_id, containment) for ordered pairs with c(src→dst) ≥
   * threshold — "src is (nearly) contained in dst"; a full duplicate
   * reports both directions.
   *
   * Scale: identical blocking to [[jaccardPairs]] — the only join is the
   * shared-shingle equi-join (`maxDocFreq` bounds block width); shared
   * counts are computed ONCE per unordered pair and both directions come
   * out of a single 2-element explode over that frame (NOT a self-union —
   * Catalyst's partial-agg rewrite makes union branches non-identical, so
   * ReuseExchange would not serve the second scan; the session-4
   * anchorStats lesson).
   */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.8,
                       maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sh = cappedShingles(docs, idCol, textCol, n, maxDocFreq).cache()
    val shared = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val out = shared
      .join(sizes.select(col("id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(sizes.select(col("id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .select(explode(array(
        struct(col("a_id").as("src_id"), col("b_id").as("dst_id"),
          (col("shared").cast("double") / col("na")).as("c")),
        struct(col("b_id").as("src_id"), col("a_id").as("dst_id"),
          (col("shared").cast("double") / col("nb")).as("c")))).as("r"))
      .select(col("r.src_id"), col("r.dst_id"), col("r.c"))
      .filter(col("c") >= threshold)
      .select(col("src_id"), col("dst_id"), round(col("c"), 4).as("containment"))
      .transform(Materialize(_))
    sh.unpersist()
    out
  }

  /**
   * MinHash + LSH near-dup pairs: `numHashes` xxhash64 min-signatures,
   * banded into `bands` buckets; bucket-collision candidates verified with
   * exact Jaccard ≥ threshold. Candidate generation is linear in corpus size
   * (explode bands -> groupBy bucket), never all-pairs — and the verify step
   * computes Jaccard ONLY for candidate pairs (r1 recomputed the full blocked
   * self-join, defeating the LSH entirely; VERDICT r1 #4).
   */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.4,
                      maxDocFreq: Long = Long.MaxValue,
                      hashFn: (Int, Column) => Column = defaultShingleHash,
                      bandHashFn: (Int, Seq[Column]) => Column = defaultBandHash): DataFrame = {
    val sh = cappedShingles(docs, idCol, textCol, n, maxDocFreq).cache()
    // materialize, then free the shingle cache (see jaccardPairs)
    val out = jaccardOfPairs(
      lshCandidates(sh, numHashes, bands, hashFn, bandHashFn), sh, threshold)
      .transform(Materialize(_))
    sh.unpersist()
    out
  }

  /** production minhash member i (xxhash64-seeded, full 64-bit spread). */
  val defaultShingleHash: (Int, Column) => Column = (i, sh) => xxhash64(lit(i), sh)
  /** production band-bucket key (xxhash64 over the band's signature slice). */
  val defaultBandHash: (Int, Seq[Column]) => Column =
    (b, hs) => xxhash64((lit(b) +: hs): _*)

  /** (id, h0..h{numHashes-1}) minhash signature table — the PERSISTABLE
    * corpus dedup state ([[incrementalMinhash]] consumes it): numHashes
    * longs per doc, no shingles retained. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 16,
                        maxDocFreq: Long = Long.MaxValue,
                        hashFn: (Int, Column) => Column = defaultShingleHash): DataFrame = {
    val hashCols: Seq[Column] =
      (0 until numHashes).map(i => min(hashFn(i, col("shingle"))).as(s"h$i"))
    cappedShingles(docs, idCol, textCol, n, maxDocFreq)
      .groupBy("id").agg(hashCols.head, hashCols.tail: _*)
  }

  /** (id, band, bh) LSH band keys of a signature table. */
  private def bandKeys(sig: DataFrame, numHashes: Int, bands: Int,
      bandHashFn: (Int, Seq[Column]) => Column): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        bandHashFn(b, (0 until rows).map(r => col(s"h${b * rows + r}"))).as("bh"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.bh"))
  }

  /**
   * Incremental near-dup: mark each NEW document against a persisted corpus
   * [[minhashSignatures]] table WITHOUT touching corpus text — the per-crawl
   * increment of a rolling dedup (the element-store MERGE idea on the dedup
   * axis). New docs are signed, band-joined against the corpus band keys
   * (candidates are bucket collisions, linear not all-pairs), and each
   * candidate pair is scored by exact signature agreement
   * (#{i : h_i == g_i}, the unbiased minhash Jaccard estimate ×numHashes —
   * corpus shingles are gone, so estimate-by-signature IS the contract);
   * pairs with agree >= `minMatches` are dups. One row per new doc:
   * (id, matched_id, agree, is_dup) — matched_id is the best corpus match
   * (max agree, min corpus id tie — pinned), NULL when none.
   *
   * Scale: corpus state is numHashes longs/doc; the increment costs
   * O(new + collisions), never O(corpus). The new-side signature table is
   * localCheckpoint'ed (3 consumers). Run [[exactGroups]] collapse on the
   * new batch first when it can carry identical docs (the [[dedupPipeline]]
   * discipline) — N identical new docs hit the same corpus buckets N times.
   */
  def incrementalMinhash(newDocs: DataFrame, corpusSigs: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                         minMatches: Int = 8,
                         maxDocFreq: Long = Long.MaxValue,
                         hashFn: (Int, Column) => Column = defaultShingleHash,
                         bandHashFn: (Int, Seq[Column]) => Column = defaultBandHash): DataFrame = {
    require(minMatches >= 1 && minMatches <= numHashes)
    val newSigs = minhashSignatures(newDocs, idCol, textCol, n, numHashes,
      maxDocFreq, hashFn).localCheckpoint()
    val cSigs = corpusSigs.select(col("id").as("__cid") +:
      (0 until numHashes).map(i => col(s"h$i").as(s"g$i")): _*)
    val cand = bandKeys(newSigs, numHashes, bands, bandHashFn)
      .join(bandKeys(cSigs.select(col("__cid").as("id") +:
          (0 until numHashes).map(i => col(s"g$i").as(s"h$i")): _*),
          numHashes, bands, bandHashFn)
          .select(col("id").as("__cid"), col("band"), col("bh")),
        Seq("band", "bh"))
      .select("id", "__cid").distinct()
    val agree = (0 until numHashes)
      .map(i => when(col(s"h$i") === col(s"g$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val best = cand
      .join(newSigs, "id").join(cSigs, "__cid")
      .select(col("id"), col("__cid"), agree.as("agree"))
      .filter(col("agree") >= minMatches)
      .groupBy("id")
      .agg(max(struct(col("agree"), (-col("__cid")).as("__negid"))).as("__b"))
      .select(col("id"), (-col("__b.__negid")).as("matched_id"),
        col("__b.agree").as("agree"))
    newDocs.select(col(idCol).as("id")).distinct()
      .join(best, Seq("id"), "left")
      .withColumn("is_dup", col("matched_id").isNotNull)
  }

  /** band-bucket candidate pairs over a shingle table (the LSH core of
    * `minhashLshPairs`, exposed for pipeline composition + tests).
    *
    * SCALE CAVEAT (VERDICT r2 #4): N byte-identical documents share every
    * band hash, so one bucket holds N rows and emits N² candidates — run
    * `exactGroups` first and band only one representative per distinct text,
    * as `dedupPipeline` does. */
  private[operators] def lshCandidates(sh: DataFrame, numHashes: Int, bands: Int,
      hashFn: (Int, Column) => Column = defaultShingleHash,
      bandHashFn: (Int, Seq[Column]) => Column = defaultBandHash): DataFrame = {
    require(numHashes % bands == 0)
    val hashCols: Seq[Column] =
      (0 until numHashes).map(i => min(hashFn(i, col("shingle"))).as(s"h$i"))
    val sig = sh.groupBy("id").agg(hashCols.head, hashCols.tail: _*)
    val buckets = bandKeys(sig, numHashes, bands, bandHashFn)
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id")).distinct()
  }

  /** 64-bit SimHash over whitespace tokens (deterministic, hash = xxhash64
    * of the token via Spark's own function for engine-wide consistency). */
  def withSimhash(docs: DataFrame, idCol: String, textCol: String,
                  tokenHashFn: Column => Column = xxhash64(_)): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("h", tokenHashFn(col("tok")))
    // per-bit vote: sum(+1/-1), sign -> bit
    val bitCols: Seq[Column] = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1).otherwise(-1)).as(s"b$b")
    }
    tok.groupBy("id").agg(bitCols.head, bitCols.tail: _*)
      .select(col("id"),
        (0 until 64).map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** 6 chunks covering the 64-bit signature: (startBit, width). */
  private val simhashChunks: Seq[(Int, Int)] = {
    val widths = Seq(11, 11, 11, 11, 10, 10)
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** Blocking key table (id, simhash, c, v) for `simhashPairs`: one row per
    * COMBINATION of (6 - maxHamming) chunks, keyed by the packed chunk
    * values. Pigeonhole: hamming <= m flips bits in <= m chunks, so some
    * (6-m)-subset of chunks is bit-identical and the pair shares that
    * combination's key. With m=3 the key is >= 31 bits wide (C(6,3)=20 keys
    * per doc) — bucket width ~N/2^31, vs the r2 scheme's four 16-bit chunks
    * whose buckets grew as N/65536 and went quadratic near 10^8 docs
    * (VERDICT r2 #3). This is the multi-block permutation scheme of the
    * published web-scale simhash dedup design (Manku/Jain/Sarma, WWW'07). */
  private[operators] def simhashKeyTable(sig: DataFrame, maxHamming: Int): DataFrame = {
    val combos = simhashChunks.indices.combinations(simhashChunks.size - maxHamming).toSeq
    val keyCols = combos.zipWithIndex.map { case (combo, ci) =>
      val packed = combo.foldLeft((lit(0L), 0)) { case ((acc, off), i) =>
        val (s, w) = simhashChunks(i)
        (acc.bitwiseOR(shiftleft(
          shiftright(col("simhash"), s).bitwiseAND(lit((1L << w) - 1)), off)), off + w)
      }._1
      struct(lit(ci).as("c"), packed.as("v"))
    }
    sig.select(col("id"), col("simhash"), explode(array(keyCols: _*)).as("k"))
      .select(col("id"), col("simhash"), col("k.c"), col("k.v"))
  }

  /** near-dup pairs with simhash Hamming distance <= maxHamming (exact
    * recall for maxHamming <= 3, via combination blocking — see
    * `simhashKeyTable`). As with LSH, compose `exactGroups` first on
    * duplicate-heavy corpora (`dedupPipeline`). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   tokenHashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "combination blocking keys narrow below 31 bits beyond hamming 3")
    val sig = withSimhash(docs, idCol, textCol, tokenHashFn)
    val keys = simhashKeyTable(sig, maxHamming).cache()
    val out = keys.as("x").join(keys.as("y"),
        col("x.c") === col("y.c") && col("x.v") === col("y.v") && col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"),
        // native bit_count stays in WholeStageCodegen (was a popcount UDF)
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      // filter BEFORE distinct: a pair colliding on any of the 20 combination
      // keys but differing by > maxHamming bits would otherwise carry up to
      // 20 duplicate rows through the distinct's shuffle just to be dropped
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .transform(Materialize(_)) // materialize, then free the 20-keys/doc cache
    keys.unpersist()
    out
  }

  /**
   * Connected components over an undirected pair list (a_id, b_id) →
   * (id, comp) with comp = min id of the component. Iterated min-label
   * propagation (one equi-join + one agg per round, no per-key row
   * collection), converging in O(component diameter) rounds — duplicate
   * clusters are near-cliques (diameter ≤ ~3), so 2-4 rounds in practice;
   * `maxIter` bounds adversarial chains (beyond it, labels are still a valid
   * refinement: over-segmented, never wrongly merged).
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 15): DataFrame = {
    val e = edges.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionByName(edges.select(col("b_id").as("u"), col("a_id").as("v")))
      .distinct().cache()
    var labels = e.select(col("u").as("id")).distinct()
      .withColumn("comp", col("id")).cache()
    labels.count()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbr = e.join(labels.select(col("id").as("v"), col("comp")), "v")
        .groupBy(col("u").as("id")).agg(min(col("comp")).as("nbr_comp"))
      // localCheckpoint (eager) rather than cache: each round's plan embeds
      // the previous round's TWICE (comp appears in both branches of the
      // least/coalesce), so without lineage truncation the logical plan grows
      // exponentially — a 24-round chain overflows the 2 GiB plan-string
      // limit before any data moves. Checkpointing makes every round O(1)
      // plan size, which is what a deep component chain needs at scale.
      val next = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
        .transform(Materialize(_))
      val changed = next.join(labels.select(col("id"), col("comp").as("old")), "id")
        .filter(col("comp") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      i += 1
    }
    e.unpersist()
    labels
  }

  /**
   * The composed dedup pipeline a web-scale corpus needs (VERDICT r2 #4/#5):
   *
   *  1. exact-collapse byte-identical texts (md5 fingerprint → min-id
   *     representative) — kills the N²-candidate failure mode where N copies
   *     of a boilerplate page share every band hash;
   *  2. MinHash-LSH near-dup pairs over ONE representative per distinct text;
   *  3. connected components over the near-dup pairs;
   *  4. re-expand: every doc maps to the canonical id of its cluster.
   *
   * Returns (id, canonical_id); singletons map to themselves. Keep-one
   * dedup = `filter(col("id") === col("canonical_id"))`.
   */
  def dedupPipeline(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, numHashes: Int = 16, bands: Int = 4,
                    threshold: Double = 0.4,
                    maxDocFreq: Long = Long.MaxValue,
                    hashFn: (Int, Column) => Column = defaultShingleHash,
                    bandHashFn: (Int, Seq[Column]) => Column = defaultBandHash): DataFrame = {
    val d0 = docs.select(col(idCol).as("id"), col(textCol).as("text"))
    // null-text docs carry no content signal: they map to themselves (the
    // md5 equi-join would otherwise null-reject them and DROP them from the
    // returned mapping, so a keep-one filter would delete them outright)
    val d = d0.filter(col("text").isNotNull)
    val nullSelf = d0.filter(col("text").isNull)
      .select(col("id"), col("id").as("canonical_id"))
    val withFp = d.withColumn("fp", md5(encode(col("text"), "UTF-8")))
    val repByFp = withFp.groupBy("fp").agg(min(col("id")).as("rep_id"))
    val mapped = withFp.join(repByFp, "fp").select(col("id"), col("rep_id")).cache()
    val reps = mapped.filter(col("id") === col("rep_id")).select("id").join(d, "id")
    val nearPairs = minhashLshPairs(reps, "id", "text", n, numHashes, bands,
      threshold, maxDocFreq, hashFn, bandHashFn).select(col("a_id"), col("b_id"))
    val comps = connectedComponents(nearPairs)
    val repCanon = mapped.select(col("rep_id").as("id")).distinct()
      .join(comps, Seq("id"), "left")
      .select(col("id").as("rep_id"), coalesce(col("comp"), col("id")).as("canonical_id"))
    // materialize the final (id, canonical_id) mapping, then free the
    // exact-collapse cache (it is read twice above; a lazy return would
    // leave it pinned for the session)
    val out = mapped.join(repCanon, "rep_id").select(col("id"), col("canonical_id"))
      .unionByName(nullSelf)
      .transform(Materialize(_))
    mapped.unpersist()
    out
  }

  /**
   * Embedding-cosine near-duplicate grouping — the embedding-space sibling of
   * `dedupPipeline`: candidate pairs → exact-cosine verify at `threshold` →
   * connected components → (id, canonical_id); singletons map to themselves.
   *
   * `nTables = 0` scores ALL pairs (exact baseline — O(N²), oracle/test scale
   * only). `nTables > 0` is the web-scale path: each of the nTables
   * independent hyperplane-LSH tables (seed-stable planes, table t uses
   * planes [t*nBits, (t+1)*nBits)) hashes every row to ONE nBits-bit bucket;
   * candidates are same-(table, bucket) pairs, deduped across tables before
   * the one exact-cosine verification per pair. OR-ing tables recovers recall
   * exactly like minhash banding: a pair at cosine angle θ collides in ≥1
   * table with prob 1-(1-(1-θ/π)^nBits)^nTables. At the 10^12 design point
   * nBits ≈ 30 bounds buckets to ~10^3 rows, so per-table candidate volume
   * is ~N·bucketWidth, never all-pairs; the join shuffles by (table, bucket).
   */
  def embeddingNearDupGroups(docs: DataFrame, idCol: String, embCol: String,
                             threshold: Double, nTables: Int = 0,
                             nBits: Int = 12, maxIter: Int = 64): DataFrame = {
    val base = Similarity.withNorm(
        docs.select(col(idCol).as("id"), col(embCol).as("emb")), "emb")
      .select(col("id"), col("vd"), col("vnorm"))
    val edges = embeddingCandidates(base, nTables, nBits)
      .withColumn("cos",
        Similarity.dot(col("avd"), col("bvd")) / (col("an") * col("bn")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"))
    // embedding clusters can be CHAINS (a~b~c with cos(a,c) < threshold), not
    // just near-cliques — allow a deeper propagation bound than the text path
    val comps = connectedComponents(edges, maxIter)
    docs.select(col(idCol).as("id")).join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("canonical_id"))
  }

  /** candidate (a_id, b_id) pairs with both vectors/norms attached — exposed
    * for the plan-shape test: the multi-table path must be ONE bucketing
    * pass posexploded (no per-table unions of corpus scans). */
  private[operators] def embeddingCandidates(base: DataFrame, nTables: Int,
                                             nBits: Int): DataFrame = {
    val withKeys = nTables > 0
    val aSide = (d: DataFrame) => d.select(
      (Seq(col("id").as("a_id"), col("vd").as("avd"), col("vnorm").as("an")) ++
        (if (withKeys) Seq(col("tbl"), col("bucket")) else Nil)): _*)
    val bSide = (d: DataFrame) => d.select(
      (Seq(col("id").as("b_id"), col("vd").as("bvd"), col("vnorm").as("bn")) ++
        (if (withKeys) Seq(col("tbl"), col("bucket")) else Nil)): _*)
    if (!withKeys)
      aSide(base).join(bSide(base), col("a_id") < col("b_id"))
    else {
      // all nTables buckets in ONE corpus scan (an array per row), then
      // posexplode to (tbl, bucket) — vs a unionByName of nTables scans
      val keyed = Similarity.withLshBucketsAll(base, "vd", nBits, nTables)
        .select(col("id"), col("vd"), col("vnorm"),
          posexplode(col("buckets")).as(Seq("tbl", "bucket")))
      aSide(keyed).join(bSide(keyed), Seq("tbl", "bucket"))
        .filter(col("a_id") < col("b_id"))
        // a pair colliding in several tables is verified once; the key is
        // scalar (no array hashing in the dedup shuffle)
        .dropDuplicates("a_id", "b_id")
    }
  }
}
