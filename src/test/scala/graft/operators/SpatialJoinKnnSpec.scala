package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.engine.SparkTestBase

/** knn over non-point build geometries: a geometry covering several cells
  * surfaces its (probe, build) pair once per shared cell — without the key
  * dedup it would occupy multiple ranks and crowd true neighbors out. */
class SpatialJoinKnnSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("a build polygon spanning two cells occupies exactly one rank") {
    // cellSize 1000: the polygon straddles x=1000, so its envelope (expanded
    // build cover) touches two cells; nearest edge to the probe is x=900
    val poly = Geom.toWkb(Geom.envelopePoly(900, 0, 1100, 1000))
    val nearPt = Geom.toWkb(Geom.point(50, 500))   // dist 450
    val farPt = Geom.toWkb(Geom.point(0, 500))     // dist 500
    val build = SpatialJoin.withGeoMeta(
      Seq((10L, poly), (11L, nearPt), (12L, farPt)).toDF("bid", "geom"), "geom")
    val probe = SpatialJoin.withGeoMeta(
      Seq((1L, Geom.toWkb(Geom.point(500, 500)))).toDF("pid", "geom"), "geom")
    val out = SpatialJoin.knn(build, probe,
        buildGeom = "geom", probeGeom = "geom",
        probeKey = "pid", buildKey = "bid",
        k = 2, radius = 1000.0, cellSize = 1000.0)
      .select(col("b_bid"), col("rank"), col("dist")).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length == 2, s"k=2 must return 2 DISTINCT neighbors, got ${out.length}")
    assert(out(0).getAs[Long]("b_bid") == 10L && out(0).getAs[Double]("dist") == 400.0,
      "polygon (dist 400) is rank 1 — once, despite covering two cells")
    assert(out(1).getAs[Long]("b_bid") == 11L,
      "the dist-450 point must not be crowded out by a duplicated polygon pair")
  }
}
