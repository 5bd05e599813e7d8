package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** SemDeDup + product-quantization invariants:
  *  - one cell ⇒ semDedup IS the global embedding near-dup grouping;
  *  - multi-cell semDedup REFINES the global grouping (cell scoping can
  *    only split groups, never merge across cells);
  *  - PQ codes are in range, training rows reconstruct exactly;
  *  - ksub == |corpus| ⇒ ADC distance is the exact L2 distance, so pqTopK
  *    equals the brute-force L2 ranking;
  *  - probe-all IVF-PQ equals the full compressed-domain scan. */
class EmbedCurateSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  // integral-component vectors (exact double arithmetic), patterns repeating
  // mod 25 so genuine duplicate cliques exist
  private val mults = Seq(3, 5, 7, 11)
  private val mods = Seq(19, 23, 29, 31)
  private def vecOf(pat: org.apache.spark.sql.Column) =
    array(mults.zip(mods).map { case (m, md) =>
      (pmod(pat * m, lit(md.toLong)) - (md - 1) / 2).cast("float")
    }: _*)
  private def corpus(n: Int) = {
    val df = (0 until n).map(_.toLong).toDF("vid")
    df.select(col("vid"), vecOf(pmod(col("vid"), lit(25L))).as("emb"))
  }

  private def groupsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("id", "canonical_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("nlist=1 semDedup equals the global near-dup grouping") {
    val c = corpus(120)
    val one = EmbedCurate.semDedup(c, "vid", "emb", nlist = 1, threshold = 0.8)
    val global = Dedup.embeddingNearDupGroups(c, "vid", "emb", threshold = 0.8)
    assert(groupsOf(one) == groupsOf(global))
    assert(one.select("cell").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
  }

  test("multi-cell semDedup refines the global grouping and stays cell-consistent") {
    val c = corpus(120)
    val sd = EmbedCurate.semDedup(c, "vid", "emb", nlist = 4, threshold = 0.8)
    val global = groupsOf(Dedup.embeddingNearDupGroups(c, "vid", "emb", 0.8))
    val rows = sd.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every semDedup group lives inside ONE global group and ONE cell
    val byCanon = rows.groupBy(_._3)
    byCanon.foreach { case (_, members) =>
      assert(members.map(m => global(m._1)).distinct.length == 1,
        "a cell-scoped group crossed a global group")
      assert(members.map(_._2).distinct.length == 1,
        "a duplicate group crossed a cell boundary")
    }
    // exact duplicates (identical vectors ⇒ identical cell) always collapse
    val exact = rows.groupBy(r => r._1 % 25).values
    exact.foreach { ms => assert(ms.map(_._3).distinct.length == 1,
      "identical vectors must share a canonical id even under cell scoping") }
  }

  test("pq codes in range; training rows reconstruct exactly") {
    val c = corpus(64)
    val enc = EmbedCurate.pqEncode(c, "vid", "emb", m = 2, ksub = 8)
    val rows = enc.collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length == 2 && codes.forall(x => x >= 0 && x < 8))
    }
    // the 8 smallest ids ARE the codebook — zero reconstruction error
    val trainErr = enc.filter(col("id") < 8).select(max("recon2")).head.getLong(0)
    assert(trainErr == 0L)
    // and repeats of their patterns (vid % 25 equal) also reconstruct exactly
    val repeatErr = enc.filter(pmod(col("id"), lit(25L)) < 8)
      .select(max("recon2")).head.getLong(0)
    assert(repeatErr == 0L)
  }

  test("ksub == |corpus| makes ADC exact: pqTopK equals brute-force L2 ranking") {
    val c = corpus(8).cache()
    val got = EmbedCurate.pqTopK(c, c, "vid", "emb", k = 3, m = 2, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3))).toMap
    // brute-force exact L2 on the driver
    val vecs = c.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def d2(a: Seq[Double], b: Seq[Double]): Long =
      a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum.toLong
    for (q <- vecs.keys) {
      val exact = vecs.keys.filter(_ != q).toSeq
        .map(n => (d2(vecs(q), vecs(n)), n)).sorted.take(3)
      exact.zipWithIndex.foreach { case ((dist, nid), i) =>
        assert(got((q, i + 1)) == (nid, dist),
          s"query $q rank ${i + 1}: got ${got((q, i + 1))}, want ($nid, $dist)")
      }
    }
  }

  test("incrementalSemDedup marks exactly the earlier-batch same-cell neighbors") {
    // repeating patterns for vid < 60 (cross-batch copies → dups) plus a
    // unique-pattern tail (vid ≥ 60 → genuinely novel docs)
    val c = (0 until 90).map(_.toLong).toDF("vid")
      .select(col("vid"), vecOf(when(col("vid") < 60,
        pmod(col("vid"), lit(25L))).otherwise(col("vid") + 1000L)).as("emb"))
    val b01 = c.filter(pmod(col("vid"), lit(3L)) < 2)
    val b2 = c.filter(pmod(col("vid"), lit(3L)) === 2)
    val centroids = Similarity.trainIvfCentroids(
      c.filter(pmod(col("vid"), lit(3L)) === 0), "vid", "emb", nlist = 4, iters = 0)
    val state = EmbedCurate.assignCells(b01, "vid", "emb", centroids)
    val dec = EmbedCurate.incrementalSemDedup(b2, state, "vid", "emb",
        centroids, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(3))).toMap
    // driver recompute from the assigned cells
    val cells = EmbedCurate.assignCells(c, "vid", "emb", centroids).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Double](2), r.getDouble(3)))
      .toMap
    def cos(a: Long, b: Long): Double = {
      val (_, va, na) = cells(a); val (_, vb, nb) = cells(b)
      va.zip(vb).map { case (x, y) => x * y }.sum / (na * nb)
    }
    val earlier = cells.keys.filter(k => k % 3 < 2).toSeq
    var dups = 0
    for (d <- cells.keys if d % 3 == 2) {
      val matches = earlier
        .filter(e => cells(e)._1 == cells(d)._1 && cos(d, e) >= 0.9)
      val best = if (matches.isEmpty) None
        else Some(matches.map(e => (-cos(d, e), e)).min._2)
      assert(dec(d) == (best, best.nonEmpty),
        s"doc $d: got ${dec(d)}, want ($best, ${best.nonEmpty})")
      if (best.nonEmpty) dups += 1
    }
    assert(dups > 0 && dups < dec.size,
      "fixture should split dup vs novel non-trivially")
  }

  test("sq codes span [0,255] per dim; sqTopK equals driver brute-force in code space") {
    val c = corpus(100)
    val enc = EmbedCurate.sqEncode(c, "vid", "emb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc.values.flatten.forall(x => x >= 0 && x <= 255))
    for (d <- 0 until enc.values.head.length) {
      val codes = enc.values.map(_(d))
      assert(codes.min == 0 && codes.max == 255,
        s"dim $d: the min/max rows must land on 0/255 exactly")
    }
    val got = EmbedCurate.sqTopK(c,
        c.filter(pmod(col("vid"), lit(20L)) === 0), "vid", "emb", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> (r.getLong(1), r.getLong(3)))
      .toMap
    for (qid <- enc.keys if qid % 20 == 0) {
      val exact = enc.keys.filter(_ != qid).toSeq
        .map(n => (enc(qid).zip(enc(n)).map { case (a, b) =>
          val dd = (a - b).toLong; dd * dd }.sum, n))
        .sorted.take(3)
      exact.zipWithIndex.foreach { case ((dist, nid), i) =>
        assert(got((qid, i + 1)) == (nid, dist),
          s"query $qid rank ${i + 1}") }
    }
  }

  test("r6: out-of-range query values clamp to [0,255] in sqTopK's query encode") {
    import spark.implicits._
    // 1-dim corpus [0, 10] trains rng=10; a query at 20 used to encode 510
    // (outside int8 space). Clamped to 255 it is code-identical to the max
    // corpus row, so its nearest neighbor is vid=2 at dist2 = 0.
    val c = Seq((1L, Seq(0.0f)), (2L, Seq(10.0f))).toDF("vid", "emb")
    val q = Seq((99L, Seq(20.0f))).toDF("vid", "emb")
    val got = EmbedCurate.sqTopK(c, q, "vid", "emb", k = 1).collect()
    assert(got.length == 1)
    assert((got(0).getLong(0), got(0).getLong(1), got(0).getLong(3)) == (99L, 2L, 0L),
      s"clamped query must sit on the max corpus code: ${got.mkString}")
  }

  test("r6: prototype seed sum is id-ordered, independent of seed-list order") {
    import spark.implicits._
    // dim0 is non-associative bait (1e16 + 1 - 1e16 = 0 summed left-to-right
    // in id order; other orders give 1); dim1 keeps the prototype norm > 0.
    val c = Seq(
      (1L, Seq(1.0e16f, 1.0f)), (2L, Seq(1.0f, 1.0f)), (3L, Seq(-1.0e16f, 1.0f)),
      (4L, Seq(0.0f, -1.0f)), (5L, Seq(1.0f, -1.0f)),
      (10L, Seq(2.0f, 5.0f))).toDF("vid", "emb")
    def run(ids: Seq[Long]) =
      EmbedCurate.prototypeFilter(c, "vid", "emb", ids, Seq(4L, 5L))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .sortBy(_._1).toSeq
    assert(run(Seq(1L, 2L, 3L)) == run(Seq(3L, 1L, 2L)),
      "seed-list order must not change the prototype")
  }

  test("prototypeFilter decides by cosine against exact-sum prototypes") {
    val c = corpus(100)
    val goodIds = Seq(0L, 1L, 2L, 3L); val badIds = Seq(4L, 5L, 6L, 7L)
    val got = EmbedCurate.prototypeFilter(c, "vid", "emb", goodIds, badIds).collect()
    val vecs = c.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def sumv(ids: Seq[Long]): Seq[Double] = ids.map(vecs).transpose.map(_.sum)
    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val g = sumv(goodIds); val b = sumv(badIds)
    val gn = math.sqrt(dot(g, g)); val bn = math.sqrt(dot(b, b))
    assert(got.length == 100)
    got.foreach { r =>
      val v = vecs(r.getLong(0))
      assert(r.getLong(1) == dot(v, g).toLong && r.getLong(2) == dot(v, b).toLong)
      assert(r.getBoolean(3) == (dot(v, g) * bn >= dot(v, b) * gn))
    }
    assert(got.exists(_.getBoolean(3)) && got.exists(!_.getBoolean(3)),
      "fixture should split keep vs drop non-trivially")
  }

  test("prototypeFilter fails loudly on missing seed ids") {
    val c = corpus(10)
    intercept[IllegalArgumentException] {
      EmbedCurate.prototypeFilter(c, "vid", "emb", Seq(0L, 999L), Seq(1L))
    }
  }

  test("probe-all IVF-PQ equals the full compressed-domain scan") {
    val c = corpus(100)
    val q = c.filter(pmod(col("vid"), lit(10L)) === 0)
    val full = EmbedCurate.pqTopK(c, q, "vid", "emb", k = 5, m = 2, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getLong(3))).toSet
    val ivf = EmbedCurate.ivfPqTopK(c, q, "vid", "emb", k = 5,
      nlist = 4, nprobe = 4, m = 2, ksub = 8)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(1), r.getLong(3))).toSet
    assert(ivf == full)
  }
}
