package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** Near-dup scale fixes (VERDICT r2 #3/#4/#5): simhash combination blocking
  * keeps exact recall while bounding bucket width on skewed corpora, and the
  * composed dedupPipeline collapses exact duplicates BEFORE LSH so
  * boilerplate floods never produce N² candidates. */
class DedupSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  // synthetic corpus: 60 base docs of 30 words + for every third doc a
  // near-copy with 1-2 words changed (small but not guaranteed <=3 hamming —
  // the brute-force comparison is the ground truth either way)
  private val simDocs: Seq[(Long, String)] = {
    val r = rng(7)
    val vocab = (0 until 400).map(i => s"w$i")
    val base = (0L until 60L).map { i =>
      (i, (0 until 30).map(_ => vocab(r.nextInt(vocab.size))).mkString(" "))
    }
    val nearDups = base.filter(_._1 % 3 == 0).map { case (i, t) =>
      val ws = t.split(" ")
      ws(r.nextInt(ws.length)) = vocab(r.nextInt(vocab.size))
      (i + 1000L, ws.mkString(" "))
    }
    base ++ nearDups
  }

  test("simhashPairs == brute-force hamming pairs (combination blocking is lossless)") {
    val docs = simDocs.toDF("doc_id", "text")
    val sigs = Dedup.withSimhash(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    assert(expected.nonEmpty, "fixture must contain some <=3-hamming pairs")
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("simhash blocking bounds bucket width on a 10^5-doc skewed corpus") {
    // 100k signatures all sharing their LOW 16 BITS — the r2 scheme's first
    // 16-bit chunk put ALL of them in one bucket (10^10 candidate pairs);
    // combination keys need >=3 whole chunks (>=31 bits) equal, of which >=16
    // bits stay random here, so buckets stay tiny
    val sigs = spark.range(100000).select(
      col("id"),
      xxhash64(col("id")).bitwiseAND(lit(0xFFFFFFFFFFFF0000L))
        .bitwiseOR(lit(0x1234L)).as("simhash"))
    val widths = Dedup.simhashKeyTable(sigs, maxHamming = 3)
      .groupBy("c", "v").count().agg(max("count")).collect()(0).getLong(0)
    assert(widths <= 50, s"max blocking bucket $widths — quadratic pairing risk")
  }

  test("dedupPipeline: 1000 copies of one page stay O(distinct) in LSH candidates") {
    val r = rng(11)
    val vocab = (0 until 300).map(i => s"t$i")
    def page(seed: Int) = { val q = rng(seed); (0 until 25).map(_ => vocab(q.nextInt(vocab.size))).mkString(" ") }
    val boiler = page(1)
    val flood = (0L until 1000L).map(i => (i, boiler))
    val distinctDocs = (0 until 20).map(i => (2000L + i, page(100 + i)))
    val docs = (flood ++ distinctDocs).toDF("doc_id", "text")

    // candidate counts: the raw corpus floods one bucket (~1000²/2 pairs);
    // the rep set stays at O(distinct²) worst case
    val rawCands = Dedup.lshCandidates(
      Dedup.cappedShingles(docs, "doc_id", "text", 3), 16, 4).count()
    val reps = docs.dropDuplicates("text")
    val repCands = Dedup.lshCandidates(
      Dedup.cappedShingles(reps, "doc_id", "text", 3), 16, 4).count()
    assert(rawCands >= 499500, s"flood fixture should saturate a bucket: $rawCands")
    assert(repCands <= 210, s"rep candidates must be O(distinct): $repCands")

    // the pipeline output: every copy maps to the flood's min id
    val canon = Dedup.dedupPipeline(docs, "doc_id", "text").cache()
    val floodCanon = canon.filter(col("id") < 1000).select("canonical_id")
      .distinct().collect().map(_.getLong(0))
    assert(floodCanon.toSeq == Seq(0L), s"flood cluster canon: ${floodCanon.toSeq}")
    // keep-one dedup keeps exactly one flood row
    assert(canon.filter(col("id") === col("canonical_id")).filter(col("id") < 1000).count() == 1)
    canon.unpersist()
  }

  // clustered embedding corpus: 15 centers × 5 jittered members (dims 8);
  // within-cluster cosine ~0.999, cross-cluster ~uniform — ground truth is
  // recomputed in the test by union-find over the operator's OWN edge
  // predicate, so no distribution assumption leaks into the assertion
  private val embDocs: Seq[(Long, Array[Float])] = {
    val r = rng(23)
    (0 until 15).flatMap { cl =>
      val center = Array.fill(8)(r.nextGaussian())
      (0 until 5).map { j =>
        val v = center.map(x => (x + 0.02 * r.nextGaussian()).toFloat)
        ((cl * 5 + j).toLong, v)
      }
    }
  }

  private def bruteComponents(threshold: Double): Map[Long, Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val parent = scala.collection.mutable.Map(embDocs.map(d => d._1 -> d._1): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for { (a, va) <- embDocs; (b, vb) <- embDocs if a < b && cos(va, vb) >= threshold } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    embDocs.map(d => d._1 -> find(d._1)).toMap
  }

  test("embeddingNearDupGroups (brute) == driver-side union-find ground truth") {
    val docs = embDocs.toDF("doc_id", "emb")
    val expected = bruteComponents(0.9)
    assert(expected.values.toSet.size < embDocs.size, "fixture must form clusters")
    val got = Dedup.embeddingNearDupGroups(docs, "doc_id", "emb", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected,
      s"diff=${expected.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }.take(5)}")
  }

  test("embeddingNearDupGroups (multi-table LSH) recovers the exact components") {
    val docs = embDocs.toDF("doc_id", "emb")
    val expected = bruteComponents(0.9)
    // 8 tables × 4 bits: per-pair miss prob at within-cluster angles is
    // ~(1-0.95^4)^8 < 1e-6 — deterministic planes make this repeatable
    val got = Dedup.embeddingNearDupGroups(docs, "doc_id", "emb",
      threshold = 0.9, nTables = 8, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("embeddingNearDupGroups LSH buckets stay balanced on a random corpus") {
    val r = rng(31)
    val big = (0L until 20000L).map(i => (i, Array.fill(8)(r.nextGaussian().toFloat)))
      .toDF("doc_id", "emb")
    val base = Similarity.withNorm(big.select(col("doc_id").as("id"), col("emb")), "emb")
    val widest = Similarity.withLshBucketAt(base, "vd", 12, 0)
      .groupBy("bucket").count().agg(max("count")).collect()(0).getLong(0)
    // 20k rows over 12 hyperplanes: in only 8 ambient dims the realizable
    // sign patterns carve UNEQUAL solid angles (observed hot bucket ~350),
    // but the hot bucket still sits >1 order below the corpus — candidate
    // volume stays ~N·bucketWidth, not N². At real embedding dims (>=64)
    // the cells equalize further.
    assert(widest <= 1000, s"hot LSH bucket $widest of 20000")
  }

  test("portable-hash simhashPairs == brute-force hamming over portable signatures") {
    val docs = simDocs.toDF("doc_id", "text")
    val sigs = Dedup.withSimhash(docs, "doc_id", "text", Dedup.PortableHash.tokenHash)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // portable token hash is 62-bit — signatures must stay non-negative
    assert(sigs.forall(_._2 >= 0))
    val expected = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3,
        tokenHashFn = Dedup.PortableHash.tokenHash)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(expected.nonEmpty, "fixture must produce close pairs")
  }

  test("portable-hash minhashLshPairs: sound vs exact Jaccard, complete on exact dups") {
    val docs = simDocs.toDF("doc_id", "text")
      // inject exact duplicates: every 5th doc re-keyed
      .unionByName(simDocs.filter(_._1 % 5 == 0).map { case (i, t) => (i + 5000L, t) }
        .toDF("doc_id", "text"))
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text",
        n = 3, numHashes = 16, bands = 4, threshold = 0.5,
        hashFn = Dedup.PortableHash.shingleHash,
        bandHashFn = Dedup.PortableHash.bandHash)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every LSH pair passed the exact-Jaccard verify -> subset of ground truth
    assert(lsh.subsetOf(exact), s"unsound pairs: ${(lsh -- exact).take(5)}")
    // exact duplicates agree on every band -> always candidates -> always found
    val dupPairs = simDocs.filter(_._1 % 5 == 0)
      .map { case (i, _) => (i, i + 5000L) }.toSet
    assert(dupPairs.subsetOf(lsh), s"missed dups: ${(dupPairs -- lsh).take(5)}")
  }

  test("containmentPairs == brute force; excerpt→original reads 1.0, reverse direction small") {
    val excerpt = simDocs.filter(_._1 % 4 == 0).map { case (i, t) =>
      (i + 5000L, t.split(" ").take(8).mkString(" "))
    }
    val all = simDocs ++ excerpt
    val got = Dedup.containmentPairs(all.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // driver-side brute force over the same shingle sets
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = all.toMap.map { case (i, t) => i -> sh(t) }
    val brute = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a != b && sa.nonEmpty
      c = (sa & sb).size.toDouble / sa.size
      if c >= 0.6
    } yield (a, b) -> BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    assert(got == brute)
    // every 8-word excerpt is fully contained in its original...
    for ((i, _) <- excerpt) assert(got((i, i - 5000L)) == 1.0)
    // ...and never contains a 30-word original (6 of ~28 shingles shared)
    for ((i, _) <- excerpt) assert(!got.contains((i - 5000L, i)))
  }

  test("dedupPipeline maps null-text docs to themselves instead of dropping them") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, null))
      .toDF("doc_id", "text")
    val out = Dedup.dedupPipeline(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("multi-table LSH candidates: one bucketing pass, no per-table unions") {
    val docs = embDocs.toDF("doc_id", "emb")
    val base = Similarity.withNorm(
        docs.select(col("doc_id").as("id"), col("emb")), "emb")
      .select(col("id"), col("vd"), col("vnorm"))
    val plan = Dedup.embeddingCandidates(base, nTables = 8, nBits = 4)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Union"), plan.take(1500))
    // one Generate (posexplode) per self-join side
    assert("Generate".r.findAllMatchIn(plan).size == 2, plan.take(1500))
  }

  test("charPoly == code-point fold reference on random unicode strings") {
    // pins the split(s, "")-based digest to the definition the oracle SQL
    // recomputes: fold over CODE POINTS, left to right. The generator mixes
    // ASCII, 2-byte (åäö), 3-byte (∑) and 4-byte/surrogate-pair (emoji)
    // characters — Java's zero-width regex split must not cut a surrogate
    // pair in half for the values to agree.
    val r = rng(42)
    val alphabet: Array[String] =
      (('a' to 'z').map(_.toString) ++ Seq(" ", "å", "ä", "ö", "∑", "猫",
        new String(Character.toChars(0x1F600)),
        new String(Character.toChars(0x1F4A9)))).toArray
    val texts = (0L until 40L).map { i =>
      (i, (0 until r.nextInt(50)).map(_ => alphabet(r.nextInt(alphabet.length)))
        .mkString)
    } :+ (99L, "") // empty string folds to 0
    def ref(s: String, b: Long, p: Long): Long =
      s.codePoints.toArray.foldLeft(0L)((acc, c) => (acc * b + c) % p)
    val got = texts.toDF("id", "t")
      .select(col("id"),
        Dedup.PortableHash.charPoly(col("t"), 131L, Dedup.PortableHash.P1).as("d"))
      .collect().map(r0 => r0.getLong(0) -> r0.getLong(1)).toMap
    texts.foreach { case (id, s) =>
      assert(got(id) == ref(s, 131L, Dedup.PortableHash.P1), s"id=$id text=$s")
    }
  }

  test("connectedComponents: chains merge to min id, disjoint stay apart") {
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(comps(10L) == 10L && comps(11L) == 10L)
  }

  test("incrementalMinhash: exact dup agrees 16/16, fresh doc no match, short doc survives") {
    val mk = (s: String) => s // readability
    val corpus = Seq(
      (1L, mk("alpha beta gamma delta epsilon zeta eta theta")),
      (2L, mk("one two three four five six seven eight nine")),
      (3L, mk("totally different corpus entry with many words here")))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
    val newDocs = Seq(
      (101L, mk("alpha beta gamma delta epsilon zeta eta theta")), // exact dup of 1
      (102L, mk("fresh words nobody in the corpus ever wrote down")),
      (103L, mk("too short"))) // <3 words -> no shingles, must still appear
      .toDF("doc_id", "text")
    val got = Dedup.incrementalMinhash(newDocs, sigs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(101L) == ((1L, 16L, true)))
    assert(got(102L) == ((-1L, -1L, false)))
    assert(got(103L) == ((-1L, -1L, false)))
  }

  test("incrementalMinhash: best match = max agree, min corpus id tie; minMatches gates") {
    // two identical corpus docs -> new exact dup agrees 16 with both, tie
    // must pick the smaller corpus id
    val corpus = Seq(
      (7L, "w1 w2 w3 w4 w5 w6"), (4L, "w1 w2 w3 w4 w5 w6"),
      (9L, "x1 x2 x3 x4 x5 x6")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
    val newDocs = Seq((201L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val got = Dedup.incrementalMinhash(newDocs, sigs, "doc_id", "text").head()
    assert(got.getLong(1) == 4L && got.getLong(2) == 16L && got.getBoolean(3))
    // the strictest legal bar: an exact dup still clears 16/16
    val strict = Dedup.incrementalMinhash(newDocs, sigs, "doc_id", "text",
      minMatches = 16)
    assert(strict.head().getBoolean(3))
  }

  test("incrementalMinhash == self-consistency: signatures of corpus match themselves") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text")
    // feed the corpus back as the 'new' batch: every doc matches itself 16/16
    val got = Dedup.incrementalMinhash(corpus, sigs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(1L -> ((1L, 16L)), 2L -> ((2L, 16L))))
  }
}
