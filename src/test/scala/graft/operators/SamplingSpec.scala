package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** Deterministic sampling/splitting: proportions, reproducibility,
  * partition-order independence, the monotone-rate subset property, and
  * exact per-group sizes for the stratified sampler. */
class SamplingSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def ids(n: Long) = spark.range(n).select(col("id"))

  test("withSplit proportions track the weights and are reproducible") {
    val df = ids(100000)
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = Sampling.withSplit(df, "id", w, salt = 42L)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") - 80000.0) / 80000.0 < 0.01)
    assert(math.abs(counts("val") - 10000.0) / 10000.0 < 0.05)
    assert(math.abs(counts("test") - 10000.0) / 10000.0 < 0.05)
    // identical on a re-run and under a different physical partitioning
    val again = Sampling.withSplit(df.repartition(13), "id", w, salt = 42L)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("withSplit remainder falls into the rest label; full split has none") {
    val df = ids(20000)
    val counts = Sampling.withSplit(df, "id", Seq("a" -> 0.5), salt = 1L)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("a", "rest"))
    assert(math.abs(counts("a") - 10000.0) / 10000.0 < 0.03)
  }

  test("hashSample: rate respected, salt changes the sample, rates nest") {
    val df = ids(50000)
    val s20 = Sampling.hashSample(df, "id", 0.2, salt = 5L).as[Long].collect().toSet
    val s10 = Sampling.hashSample(df, "id", 0.1, salt = 5L).as[Long].collect().toSet
    val other = Sampling.hashSample(df, "id", 0.2, salt = 6L).as[Long].collect().toSet
    assert(math.abs(s20.size - 10000.0) / 10000.0 < 0.03)
    assert(s10.subsetOf(s20), "lower rate must be a subset of higher at the same salt")
    assert(other != s20, "different salt must select a different sample")
  }

  test("stratifiedTopK: exactly min(k, group size) per group, deterministic") {
    val df = (0 until 1000).map(i => (s"g${i % 7}", i.toLong)).toDF("g", "id")
      .union(Seq(("tiny", 100000L)).toDF("g", "id"))
    val got = Sampling.stratifiedTopK(df, Seq("g"), "id", k = 30, salt = 9L)
    val sizes = got.groupBy("g").count().as[(String, Long)].collect().toMap
    assert((0 until 7).forall(i => sizes(s"g$i") == 30))
    assert(sizes("tiny") == 1)
    val again = Sampling.stratifiedTopK(df.repartition(17), Seq("g"), "id", k = 30, salt = 9L)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(again == got.select("g", "id").as[(String, Long)].collect().toSet)
  }

  test("temperatureRebalance == brute force; smallest domain kept whole; mass damped") {
    // skewed domains: sizes 600 / 250 / 100 / 50
    val rows = (0L until 1000L).map { i =>
      val d = if (i < 600) "mega" else if (i < 850) "mid" else if (i < 950) "small" else "tiny"
      (i, d)
    }
    val got = Sampling.temperatureRebalance(rows.toDF("doc_id", "domain"), "doc_id", "domain", salt = 5L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    val sizes = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nMin = sizes.values.min
    val P = Sampling.P
    val m = Sampling.mixedMultiplier(5L)
    val b = Sampling.B + java.lang.Math.floorMod(5L, P)
    rows.foreach { case (id, d) =>
      val rate = math.sqrt(nMin.toDouble / sizes(d))
      val u = ((id % P) * m + b) % P
      assert(got(id) === ((d, sizes(d), rate, u.toDouble < rate * P.toDouble)), s"doc $id")
    }
    // the smallest domain's rate is exactly 1.0 -> every row kept
    assert(rows.filter(_._2 == "tiny").forall(r => got(r._1)._4))
    // kept mega mass ~ sqrt damping: expected 600*sqrt(50/600) = ~173
    val keptMega = rows.count(r => r._2 == "mega" && got(r._1)._4)
    assert(keptMega > 120 && keptMega < 230, s"mega kept $keptMega")
  }

  private def bruteDsir(raw: Seq[(Long, String)], tgt: Seq[String],
                        minMean: Long): Map[Long, (Long, Long, Long, Boolean)] = {
    def words(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val instAll = raw.flatMap { case (id, t) => words(t).map(id -> _) }
    val rW = instAll.groupBy(_._2).map { case (w, v) => w -> (v.size.toLong + 1L) }
    val tW = tgt.flatMap(words).groupBy(identity).map { case (w, v) => w -> (v.size.toLong + 1L) }
    val rt = rW.values.sum
    val tt = tW.values.sum
    raw.map { case (id, t) =>
      val ws = words(t)
      val ss = ws.map { w =>
        (bitlen(tW.getOrElse(w, 1L)) + bitlen(rt) - bitlen(rW(w)) - bitlen(tt)).toLong
      }.sum
      val nw = ws.size.toLong
      val mean = if (nw > 0) 100L * ss / nw else 0L   // Java / truncates like Spark div
      id -> ((nw, ss, mean, nw > 0 && mean >= minMean))
    }.toMap
  }

  test("importanceResample: brute force; target-flavored docs kept, negative mean truncation") {
    val raw = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "delta epsilon zeta"),
      (3L, "alpha alpha alpha beta"),
      (4L, ""),
      (5L, "unknownword otherunknown strange"),
      (6L, "beta gamma"))
    val tgt = Seq("alpha beta alpha beta gamma", "alpha beta")
    val got = Sampling.importanceResample(raw.toDF("doc_id", "text"), "doc_id", "text",
        tgt.toDF("text"), "text", minMeanImp100 = 50L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val exp = bruteDsir(raw, tgt, 50L)
    assert(got == exp)
    // doc 5 (words the target never saw) scores strictly below the
    // target-flavored docs and is dropped at the threshold
    assert(got(5L)._3 < got(3L)._3 && !got(5L)._4)
    // zero-word doc: all zeros, not kept
    assert(got(4L) == ((0L, 0L, 0L, false)))
    // target-flavored doc 3 is kept
    assert(got(3L)._4)
  }

  test("mixtureAllocate: rates, cap, zero weight, shortfall, applied sample") {
    // domains: big = 3 docs x 4 tokens = 12; tiny = 1 doc x 2 tokens;
    // unweighted = 1 doc (absent from weights -> rate 0)
    val docs = Seq(
      (1L, "big", "a b c d"), (2L, "big", "a b c d"), (3L, "big", "a b c d"),
      (4L, "tiny", "a b"),
      (5L, "other", "x y z")).toDF("id", "dom", "text")
    val got = Sampling.mixtureAllocate(docs, "id", "dom", "text",
        weightsPpm = Seq("big" -> 250000L, "tiny" -> 750000L),
        budgetTokens = 8L, salt = 5L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))).toMap
    // big: target (8*250000) div 1e6 = 2; rate (8*250000) div 12 = 166666
    assert(got("big")._1 == 3L && got("big")._2 == 12L)
    assert(got("big")._4 == 166666L && got("big")._5 == 2L)
    assert(got("big")._6 == (12L * 166666L) / 1000000L) // expected = 1
    assert(got("big")._7 == 1L) // shortfall from integer floor
    // tiny: target 6 > tokens 2 -> rate caps at 1e6, ALL docs kept
    assert(got("tiny")._4 == 1000000L && got("tiny")._6 == 2L &&
      got("tiny")._7 == 4L && got("tiny")._8 == 1L && got("tiny")._9 == 2L)
    // unweighted domain: rate 0, nothing kept, still present for audit
    assert(got("other")._3 == 0L && got("other")._4 == 0L &&
      got("other")._8 == 0L)
    // applied decision matches a hand recompute of the hash rule
    val bigKept = Seq(1L, 2L, 3L).count { id =>
      val m = Sampling.mixedMultiplier(5L)
      val u = ((id % Sampling.P) * m + Sampling.B + 5L) % Sampling.P
      u * 1000000L < 166666L * Sampling.P
    }
    assert(got("big")._8 == bigKept.toLong)
  }

  test("guards: bad weights, rates, k") {
    val df = ids(10)
    intercept[IllegalArgumentException] {
      Sampling.withSplit(df, "id", Seq("a" -> 0.9, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] { Sampling.hashSample(df, "id", 1.5) }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedTopK(df, Seq("id"), "id", k = 0)
    }
  }
}
