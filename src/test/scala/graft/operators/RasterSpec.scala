package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** Raster<->vector density grid (north-star "rasterization of deviation
  * density onto z14 tiles"): pixel assignment vs the reference slippy-map
  * math, weighted density, tile-local 4-connected polygonization with
  * deterministic min-linear-index labels, and the 3857 envelope affine. */
class RasterSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private val Z = 14
  private val Res = 16
  private val N = (1L << Z) * Res // global pixels per axis

  /** reference pixel math, independently written (plain scala doubles) */
  private def pixelOf(lon: Double, lat: Double): (Long, Long) = {
    val gx = math.floor((lon + 180.0) / 360.0 * N).toLong
    val latR = math.toRadians(lat)
    val gy = math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * N).toLong
    (gx, gy)
  }

  test("rasterize: counts per pixel match an independent per-point computation") {
    val pts = (1 to 500).map { i =>
      (11.0 + (i % 7) * 0.001, 57.0 + (i % 11) * 0.001)
    }
    val df = pts.toDF("lon", "lat")
    val out = Raster.rasterize(df, col("lon"), col("lat"), Z, Res)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)), r.getLong(4)))
      .toMap
    val expected = pts
      .map { case (lon, lat) => pixelOf(lon, lat) }
      .groupBy(identity).map { case ((gx, gy), v) =>
        ((gx / Res, gy / Res, (gx % Res).toInt, (gy % Res).toInt), v.size.toLong)
      }
    assert(out === expected)
    assert(out.values.sum === 500L)
  }

  test("rasterize: weighted density sums the weight column") {
    val df = Seq((11.0, 57.0, 2L), (11.0, 57.0, 5L), (12.0, 58.0, 1L))
      .toDF("lon", "lat", "w")
    val out = Raster.rasterize(df, col("lon"), col("lat"), Z, Res, Some(col("w")))
      .collect().map(_.getLong(4)).sorted
    assert(out.toSeq === Seq(1L, 7L))
  }

  /** hand-built raster rows: (tile_x, tile_y, px, py, density) */
  private def raster(rows: (Long, Long, Int, Int, Long)*) =
    rows.toDF("tile_x", "tile_y", "px", "py", "density")

  test("regions: L-shaped component + isolated pixel, deterministic labels") {
    // L-shape: (1,1),(1,2),(2,2) + isolated (5,5); below-threshold (8,8)
    val r = raster(
      (10L, 20L, 1, 1, 3L), (10L, 20L, 1, 2, 4L), (10L, 20L, 2, 2, 2L),
      (10L, 20L, 5, 5, 9L), (10L, 20L, 8, 8, 1L))
    val out = Raster.regions(r, minDensity = 2L, Z, Res)
      .select("region", "n_pixels", "density", "px_min", "py_min", "px_max", "py_max")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).sortBy(_._1)
    // labels: L-shape min linear idx = 1*16+1 = 17; isolated = 5*16+5 = 85
    assert(out.toSeq === Seq(
      (17L, 3L, 9.0, 1, 1, 2, 2),
      (85L, 1L, 9.0, 5, 5, 5, 5)))
  }

  test("regions: diagonal pixels do NOT merge (4-connectivity, not 8)") {
    val r = raster((0L, 0L, 3, 3, 5L), (0L, 0L, 4, 4, 5L))
    val out = Raster.regions(r, 2L, Z, Res).collect()
    assert(out.length === 2)
  }

  test("regions: adjacency across a tile boundary does NOT merge (tile-local by contract)") {
    // px=15 of tile 10 and px=0 of tile 11 are physically adjacent pixels
    val r = raster((10L, 20L, 15, 7, 5L), (11L, 20L, 0, 7, 5L))
    val out = Raster.regions(r, 2L, Z, Res).collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("tile_x")).sorted.toSeq === Seq(10L, 11L))
  }

  test("regionsGlobal: adjacency across a tile boundary DOES merge") {
    // the same fixture regions() must keep separate (tile-local contract):
    // px=15 of tile 10 and px=0 of tile 11, same gy
    val r = raster((10L, 20L, 15, 7, 5L), (11L, 20L, 0, 7, 4L))
    val out = Raster.regionsGlobal(r, 2L, Z, Res).collect()
    assert(out.length === 1)
    val row = out.head
    assert(row.getAs[Long]("n_pixels") === 2L)
    assert(row.getAs[Double]("density") === 9.0)
    assert(row.getAs[Long]("n_tiles") === 2L)
    // global region id = min global pixel index = (20*16+7)*N + 10*16+15
    val n = Raster.gridSize(Z, Res)
    assert(row.getAs[Long]("global_region") === (20L * 16 + 7) * n + 10 * 16 + 15)
    assert(row.getAs[Long]("gx_min") === 175L && row.getAs[Long]("gx_max") === 176L)
  }

  test("regionsGlobal: a chain across three tiles becomes one region") {
    val r = raster(
      (10L, 20L, 14, 3, 5L), (10L, 20L, 15, 3, 5L), // tile 10 pair
      (11L, 20L, 0, 3, 5L),                         // bridges into tile 11
      (11L, 20L, 15, 3, 5L), (12L, 20L, 0, 3, 5L))  // second bridge -> tile 12
    // the middle of tile 11 is NOT contiguous between px=0 and px=15, so
    // the chain is 10–11 merged and 11(e)–12 merged but the two groups stay
    // apart (px 0 and 15 of tile 11 are not adjacent)
    val out = Raster.regionsGlobal(r, 2L, Z, Res).collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("n_pixels")).sorted.toSeq === Seq(2L, 3L))
  }

  test("regionsGlobal: a 24-tile corridor merges fully (propagation depth > 15)") {
    // a horizontal strip crossing 24 tile boundaries: full rows of py=5
    // through tiles 0..24 — min-label needs ~24 rounds to reach the far end
    val rows = (0L to 24L).flatMap { tx =>
      (0 until Res).map(px => (tx, 3L, px, 5, 2L))
    }
    val out = Raster.regionsGlobal(raster(rows: _*), 2L, Z, Res).collect()
    assert(out.length === 1, s"corridor must be ONE region, got ${out.length}")
    assert(out.head.getAs[Long]("n_tiles") === 25L)
    assert(out.head.getAs[Long]("n_pixels") === 25L * Res)
  }

  test("regionsGlobal: diagonal across a tile corner does NOT merge") {
    // (15,15) of tile (0,0) vs (0,0) of tile (1,1): corner-diagonal
    val r = raster((0L, 0L, 15, 15, 5L), (1L, 1L, 0, 0, 5L))
    assert(Raster.regionsGlobal(r, 2L, Z, Res).count() === 2)
  }

  test("regionsGlobal: conserves pixels and density of the tile-local form") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { _ =>
      (rnd.nextInt(2).toLong, rnd.nextInt(2).toLong,
        rnd.nextInt(Res), rnd.nextInt(Res), (1 + rnd.nextInt(4)).toLong)
    }
    val r = raster(rows: _*)
    val local = Raster.regions(r, 3L, Z, Res)
    val global = Raster.regionsGlobal(r, 3L, Z, Res)
    assert(global.agg(sum("n_pixels")).head.getLong(0) ===
      local.agg(sum("n_pixels")).head.getLong(0))
    assert(global.agg(sum("density")).head.getDouble(0) ===
      local.agg(sum("density")).head.getDouble(0))
    // merging can only reduce the region count
    assert(global.count() <= local.count())
  }

  test("regions: duplicate pixel rows are aggregated, not silently dropped") {
    // the same pixel twice at density 2+2: threshold 3 must see density 4,
    // and the adjacent pixel must land in the SAME component
    val r = raster((0L, 0L, 4, 4, 2L), (0L, 0L, 4, 4, 2L), (0L, 0L, 5, 4, 3L))
    val out = Raster.regions(r, 3L, Z, Res).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_pixels") === 2L)
    assert(out.head.getAs[Double]("density") === 7.0)
  }

  test("regions: partition property — every above-threshold pixel in exactly one region") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { _ =>
      (rnd.nextInt(3).toLong, rnd.nextInt(3).toLong,
        rnd.nextInt(Res), rnd.nextInt(Res), (1 + rnd.nextInt(4)).toLong)
    }.distinct
    // duplicate pixels collapse inside the operator now; pre-aggregate here
    // only to compute the expected totals
    val r = raster(rows: _*).groupBy("tile_x", "tile_y", "px", "py")
      .agg(sum("density").as("density"))
    val thresholded = r.filter(col("density") >= 3).count()
    val regs = Raster.regions(r, 3L, Z, Res)
    assert(regs.agg(sum("n_pixels")).head.getLong(0) === thresholded)
    // density conservation
    val totalDensity = r.filter(col("density") >= 3)
      .agg(sum("density")).head.getLong(0)
    assert(regs.agg(sum("density")).head.getDouble(0) === totalDensity.toDouble)
  }

  test("regions: 3857 envelope is the pixel-edge affine of the bbox") {
    val r = raster((100L, 200L, 2, 3, 5L), (100L, 200L, 3, 3, 5L))
    val row = Raster.regions(r, 2L, Z, Res)
      .select("env_min_x", "env_max_x", "env_min_y", "env_max_y").head()
    val world = 2.0 * math.Pi * 6378137.0
    val psz = world / N
    assert(row.getDouble(0) === (100L * Res + 2) * psz - world / 2.0)
    assert(row.getDouble(1) === (100L * Res + 3 + 1) * psz - world / 2.0)
    assert(row.getDouble(3) === world / 2.0 - (200L * Res + 3) * psz)
    assert(row.getDouble(2) === world / 2.0 - (200L * Res + 3 + 1) * psz)
    // envelope width = 2 pixels, height = 1 pixel
    assert(math.abs((row.getDouble(1) - row.getDouble(0)) - 2 * psz) < 1e-9)
    assert(math.abs((row.getDouble(2) - row.getDouble(3)) + psz) < 1e-9 ||
      math.abs((row.getDouble(2) - row.getDouble(3)) - psz) < 1e-9)
  }

  test("withPixel: NULL coordinates are dropped, not clamped into pixel 0") {
    // greatest/least skip nulls, so without the guard a null lon would fall
    // through the clamp as gx=0 and inflate tile (0,0)
    val df = Seq(
      (java.lang.Double.valueOf(11.0), java.lang.Double.valueOf(57.0)),
      (null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(57.0)),
      (java.lang.Double.valueOf(11.0), null.asInstanceOf[java.lang.Double]))
      .toDF("lon", "lat")
    val out = Raster.rasterize(df, col("lon"), col("lat"), Z, Res).collect()
    assert(out.length === 1 && out.head.getLong(4) === 1L,
      "only the fully-geocoded row may be counted")
    assert(out.head.getLong(0) !== 0L, "the surviving row is not in tile 0")
  }

  test("regions: fractional weighted densities survive polygonization (no long cast)") {
    val pts = Seq((11.0, 57.0, 0.6), (11.0, 57.0, 0.9)).toDF("lon", "lat", "w")
    val rast = Raster.rasterize(pts, col("lon"), col("lat"), Z, Res, Some(col("w")))
    val regs = Raster.regions(rast, minDensity = 1L, Z, Res).collect()
    assert(regs.length === 1)
    assert(math.abs(regs.head.getAs[Double]("density") - 1.5) < 1e-12,
      "weighted density 0.6+0.9 must stay 1.5, not truncate to 1")
  }

  test("rasterizeSweref: round-trips the engine's native plane") {
    // a SWEREF-ish point cloud; every point must land in exactly one pixel
    val pts = (1 to 100).map(i => (500000.0 + i * 10, 6500000.0 + i * 10))
    val df = pts.toDF("x", "y")
    val out = Raster.rasterizeSweref(df, col("x"), col("y"), Z, Res)
    assert(out.agg(sum("density")).head.getLong(0) === 100L)
  }
}
