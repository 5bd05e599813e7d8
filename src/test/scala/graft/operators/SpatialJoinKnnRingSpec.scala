package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.engine.SparkTestBase

/** knnRing — guaranteed-k ring-expansion kNN (north star's "k-ring-expansion
  * kNN"). The stop rule must yield the EXACT global top-k: every candidate at
  * round radius R has dist <= R and nothing unseen can be that close, so a
  * full top-k is final. Differential-tested against brute force across
  * several doubling rounds, plus the <k-global, maxRadius-cap, tie-break and
  * multi-cell-build edges. */
class SpatialJoinKnnRingSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def pts(ids: Seq[Long], fx: Long => Double, fy: Long => Double) =
    SpatialJoin.withGeoMeta(
      ids.map(i => (i, Geom.toWkb(Geom.point(fx(i), fy(i))))).toDF("id", "geom"),
      "geom")

  test("ring expansion reproduces brute-force global top-k across rounds") {
    // integral coords -> dist^2 exact in Long; a 100x100 km domain with a
    // 500 m start radius forces many doubling rounds for sparse probes
    val bIds = 0L until 300L
    val pIds = 0L until 120L
    val bx = (i: Long) => ((i * 48271L) % 100000L).toDouble
    val by = (i: Long) => ((i * 69621L) % 100000L).toDouble
    val px = (i: Long) => ((i * 94261L) % 100000L).toDouble
    val py = (i: Long) => ((i * 57301L) % 100000L).toDouble
    val out = SpatialJoin.knnRing(
        build = pts(bIds, bx, by), probe = pts(pIds, px, py),
        buildGeom = "geom", probeGeom = "geom",
        probeKey = "id", buildKey = "id",
        k = 4, startRadius = 500.0, maxRadius = 200000.0)
      .select(col("p_id"), col("b_id"), col("rank")).collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    assert(out.size == pIds.size * 4)
    for (p <- pIds) {
      val expect = bIds
        .map(b => (b, {
          val dx = (bx(b) - px(p)).toLong; val dy = (by(b) - py(p)).toLong
          dx * dx + dy * dy
        }))
        .sortBy { case (b, d2) => (d2, b) }.take(4).map(_._1)
      for ((b, r) <- expect.zipWithIndex)
        assert(out((p, r + 1)) == b, s"probe $p rank ${r + 1}")
    }
  }

  test("fewer than k build rows globally returns what exists") {
    val build = pts(Seq(1L, 2L), i => i * 50000.0, _ => 0.0)
    val probe = pts(Seq(7L), _ => 10.0, _ => 10.0)
    val out = SpatialJoin.knnRing(build, probe, "geom", "geom", "id", "id",
        k = 3, startRadius = 100.0, maxRadius = 1000000.0)
      .select(col("b_id"), col("rank")).collect().sortBy(_.getInt(1))
    assert(out.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((1L, 1), (2L, 2)))
  }

  test("maxRadius caps the expansion: out-of-cap builds are not returned") {
    val build = pts(Seq(1L, 2L, 3L), i => i * 300.0, _ => 0.0) // 300, 600, 900
    val probe = pts(Seq(7L), _ => 0.0, _ => 0.0)
    val out = SpatialJoin.knnRing(build, probe, "geom", "geom", "id", "id",
        k = 3, startRadius = 100.0, maxRadius = 700.0)
      .select(col("b_id")).collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L), "the 900 m build sits past maxRadius=700")
  }

  test("equal distances break ties by build key in every round") {
    // four builds on a circle of radius 500; ids deliberately unsorted
    val build = SpatialJoin.withGeoMeta(Seq(
        (9L, Geom.toWkb(Geom.point(500, 0))), (3L, Geom.toWkb(Geom.point(-500, 0))),
        (5L, Geom.toWkb(Geom.point(0, 500))), (1L, Geom.toWkb(Geom.point(0, -500))))
      .toDF("id", "geom"), "geom")
    val probe = pts(Seq(7L), _ => 0.0, _ => 0.0)
    val out = SpatialJoin.knnRing(build, probe, "geom", "geom", "id", "id",
        k = 3, startRadius = 600.0, maxRadius = 600.0)
      .select(col("b_id"), col("rank")).collect().sortBy(_.getInt(1))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
  }

  test("a build polygon spanning cells occupies exactly one rank") {
    val poly = Geom.toWkb(Geom.envelopePoly(900, 0, 1100, 1000))
    val nearPt = Geom.toWkb(Geom.point(50, 500))   // dist 450
    val farPt = Geom.toWkb(Geom.point(0, 500))     // dist 500
    val build = SpatialJoin.withGeoMeta(
      Seq((10L, poly), (11L, nearPt), (12L, farPt)).toDF("bid", "geom"), "geom")
    val probe = SpatialJoin.withGeoMeta(
      Seq((1L, Geom.toWkb(Geom.point(500, 500)))).toDF("pid", "geom"), "geom")
    val out = SpatialJoin.knnRing(build, probe, "geom", "geom", "pid", "bid",
        k = 2, startRadius = 1000.0, maxRadius = 4000.0)
      .select(col("b_bid"), col("rank"), col("dist")).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length == 2)
    assert(out(0).getAs[Long]("b_bid") == 10L && out(0).getAs[Double]("dist") == 400.0)
    assert(out(1).getAs[Long]("b_bid") == 11L)
  }

  test("NULL probe keys are dropped, not re-emitted every round") {
    // a null key can never leave the unresolved set (left_anti on NULL never
    // matches), so before the fix such a probe re-emitted its top-k once per
    // doubling round — assert exactly-once semantics and no null-key rows
    val build = pts(0L until 20L, i => (i * 37L % 1000L).toDouble,
      i => (i * 53L % 1000L).toDouble)
    val probe = SpatialJoin.withGeoMeta(
      Seq((Option(1L), Geom.toWkb(Geom.point(100, 100))),
          (Option.empty[Long], Geom.toWkb(Geom.point(200, 200))),
          (Option(2L), Geom.toWkb(Geom.point(900, 900))))
        .toDF("id", "geom"), "geom")
    val out = SpatialJoin.knnRing(build, probe, "geom", "geom", "id", "id",
        k = 3, startRadius = 50.0, maxRadius = 100000.0)
      .select(col("p_id"), col("b_id")).collect()
    assert(out.forall(!_.isNullAt(0)), "null-key probes must be dropped")
    assert(out.length == 6, s"exactly k rows per non-null probe, got ${out.length}")
  }
}
