package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Raster

/**
 * Raster<->vector density operators behind the DuckDB oracle. Points are
 * synthesized from customer keys as 50 diagonal clusters (modular offsets in
 * integral 0.0005-degree steps), dense enough at sf0.01 that above-threshold
 * pixels form multi-pixel 4-connected regions — so BOTH directions sit behind
 * the oracle: the density grid (floor/ln/tan pixel math, identical expression
 * order in Spark and DuckDB) and the polygonization (the oracle recomputes
 * connected components from first principles with a recursive reachability
 * CTE and labels them by min linear pixel index, exactly the operator's
 * contract).
 */
object QueriesRaster {

  private val Z = 14
  private val Res = 16
  private val MinDensity = 2L

  /** 50 point clusters from customer keys; every constant mirrored verbatim
    * in the oracle SQL (same literal order -> bit-identical doubles). */
  private def pts(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/customer.parquet").select(
      (lit(11.0) + pmod(col("c_custkey"), lit(50L)) * 0.1
        + pmod(col("c_custkey") * 7919L, lit(8L)) * 0.0005).as("lon"),
      (lit(55.0) + pmod(col("c_custkey"), lit(50L)) * 0.2
        + pmod(col("c_custkey") * 104729L, lit(8L)) * 0.0005).as("lat"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // vector -> raster: one hash agg, output bounded by occupied pixels
    "q_raster_density" -> ((s, dir) =>
      Raster.rasterize(pts(s, dir), col("lon"), col("lat"), Z, Res)),

    // raster -> vector: tile-local 4-connected regions + 3857 envelopes
    "q_raster_regions" -> ((s, dir) =>
      Raster.regions(
        Raster.rasterize(pts(s, dir), col("lon"), col("lat"), Z, Res),
        MinDensity, Z, Res)),

    // cross-tile merge: regions spanning tile boundaries unify via the
    // region-adjacency graph + min-label propagation; the oracle recomputes
    // GLOBAL components with an unrestricted recursive reachability CTE
    "q_raster_regions_global" -> ((s, dir) =>
      Raster.regionsGlobal(
        Raster.rasterize(pts(s, dir), col("lon"), col("lat"), Z, Res),
        MinDensity, Z, Res)),

    // batch form of streaming.StreamingIngest.streamingDensity (the
    // watermarked per-window pixel density; StreamingSpec asserts the
    // stream == this batch plan): hourly windows x z14 pixels, oracled
    "q_stream_density" -> ((s, dir) => {
      val ev = s.read.parquet(s"$dir/events.parquet").select(
        col("ts"),
        (lit(11.0) + pmod(col("event_id"), lit(50L)) * 0.1
          + pmod(col("event_id") * 7919L, lit(8L)) * 0.0005).as("lon"),
        (lit(55.0) + pmod(col("event_id"), lit(50L)) * 0.2
          + pmod(col("event_id") * 104729L, lit(8L)) * 0.0005).as("lat"))
      Raster.withPixel(ev, col("lon"), col("lat"), Z, Res)
        .groupBy(date_trunc("hour", col("ts")).as("hour"),
          col("tile_x"), col("tile_y"), col("px"), col("py"))
        .agg(count(lit(1)).as("density"))
    }),

    // the north-star integration: deviation density of the REAL pipeline's
    // match rows rasterized onto z14 tiles (sweref -> lon/lat projection is
    // the engine's own series expansion -> rows-only check)
    "q_pipe_raster" -> ((s, _) => {
      val (osm, ups) = graft.engine.BenchPipeline.sharedInputs(s, 3000L)
      val m = graft.engine.BenchPipeline.matchRowsFrom(osm, ups)
      val withC = m.withColumn("_c",
        graft.functions.GeoFunctions.stCentroid(
          coalesce(col("upstream_geom"), col("osm_geom"))))
      Raster.rasterizeSweref(withC, col("_c._1"), col("_c._2"), Z, res = 64)
    }))

  private val sqlGrid =
    """pts AS (SELECT
      |  11.0 + (c_custkey%50)*0.1 + ((c_custkey*7919)%8)*0.0005 AS lon,
      |  55.0 + (c_custkey%50)*0.2 + ((c_custkey*104729)%8)*0.0005 AS lat
      |  FROM customer),
      |g AS (SELECT
      |  CAST(FLOOR((lon+180.0)/360.0*262144.0) AS BIGINT) AS gx,
      |  CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0/COS(RADIANS(lat)))/PI())/2.0*262144.0) AS BIGINT) AS gy
      |  FROM pts),
      |rast AS (SELECT
      |  CAST((gx - gx%16)/16 AS BIGINT) AS tile_x,
      |  CAST((gy - gy%16)/16 AS BIGINT) AS tile_y,
      |  CAST(gx%16 AS INTEGER) AS px, CAST(gy%16 AS INTEGER) AS py,
      |  COUNT(*) AS density
      |  FROM g GROUP BY 1,2,3,4)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_stream_density" ->
      """WITH pts AS (SELECT ts,
        |  11.0 + (event_id%50)*0.1 + ((event_id*7919)%8)*0.0005 AS lon,
        |  55.0 + (event_id%50)*0.2 + ((event_id*104729)%8)*0.0005 AS lat
        |  FROM events),
        |g AS (SELECT ts,
        |  CAST(FLOOR((lon+180.0)/360.0*262144.0) AS BIGINT) AS gx,
        |  CAST(FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0/COS(RADIANS(lat)))/PI())/2.0*262144.0) AS BIGINT) AS gy
        |  FROM pts)
        |SELECT DATE_TRUNC('hour', ts) AS hour,
        |  CAST((gx - gx%16)/16 AS BIGINT) AS tile_x,
        |  CAST((gy - gy%16)/16 AS BIGINT) AS tile_y,
        |  CAST(gx%16 AS INTEGER) AS px, CAST(gy%16 AS INTEGER) AS py,
        |  COUNT(*) AS density
        |FROM g GROUP BY 1,2,3,4,5""".stripMargin,
    "q_raster_density" ->
      s"""WITH $sqlGrid
         |SELECT tile_x, tile_y, px, py, density FROM rast""".stripMargin,
    "q_raster_regions_global" ->
      s"""WITH RECURSIVE $sqlGrid,
         |r AS (SELECT tile_x*16+px AS gx, tile_y*16+py AS gy, tile_x, tile_y, density
         |  FROM rast WHERE density >= $MinDensity),
         |e AS (SELECT a.gy*262144+a.gx AS p, b.gy*262144+b.gx AS q
         |  FROM r a JOIN r b
         |  ON (ABS(a.gx-b.gx)=1 AND a.gy=b.gy) OR (a.gx=b.gx AND ABS(a.gy-b.gy)=1)),
         |reach(p, q) AS (
         |  SELECT gy*262144+gx, gy*262144+gx FROM r
         |  UNION
         |  SELECT reach.p, e.q FROM reach JOIN e ON reach.q=e.p),
         |lab AS (SELECT p, CAST(MIN(q) AS BIGINT) AS region FROM reach GROUP BY p),
         |px2 AS (SELECT r.*, lab.region FROM r JOIN lab ON r.gy*262144+r.gx=lab.p)
         |SELECT region AS global_region,
         |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
         |  CAST(SUM(density) AS DOUBLE) AS density,
         |  CAST(COUNT(DISTINCT tile_x*262144+tile_y) AS BIGINT) AS n_tiles,
         |  MIN(gx) AS gx_min, MIN(gy) AS gy_min, MAX(gx) AS gx_max, MAX(gy) AS gy_max
         |FROM px2 GROUP BY 1""".stripMargin,
    // density is DOUBLE in both regions oracles: the operator keeps density
    // as double (weighted rasters carry fractions; counts are exact in double)
    "q_raster_regions" ->
      s"""WITH RECURSIVE $sqlGrid,
         |r AS (SELECT * FROM rast WHERE density >= $MinDensity),
         |e AS (SELECT a.tile_x, a.tile_y, a.py*16+a.px AS p, b.py*16+b.px AS q
         |  FROM r a JOIN r b ON a.tile_x=b.tile_x AND a.tile_y=b.tile_y
         |   AND ((ABS(a.px-b.px)=1 AND a.py=b.py) OR (a.px=b.px AND ABS(a.py-b.py)=1))),
         |reach(tile_x, tile_y, p, q) AS (
         |  SELECT tile_x, tile_y, py*16+px, py*16+px FROM r
         |  UNION
         |  SELECT reach.tile_x, reach.tile_y, reach.p, e.q
         |  FROM reach JOIN e ON reach.tile_x=e.tile_x AND reach.tile_y=e.tile_y
         |   AND reach.q=e.p),
         |lab AS (SELECT tile_x, tile_y, p, CAST(MIN(q) AS BIGINT) AS region
         |  FROM reach GROUP BY 1,2,3),
         |px2 AS (SELECT r.tile_x, r.tile_y, lab.region, r.px, r.py, r.density
         |  FROM r JOIN lab ON r.tile_x=lab.tile_x AND r.tile_y=lab.tile_y
         |   AND r.py*16+r.px=lab.p)
         |SELECT tile_x, tile_y, region,
         |  CAST(COUNT(*) AS BIGINT) AS n_pixels,
         |  CAST(SUM(density) AS DOUBLE) AS density,
         |  MIN(px) AS px_min, MIN(py) AS py_min, MAX(px) AS px_max, MAX(py) AS py_max,
         |  (tile_x*16 + MIN(px)) * (2.0*PI()*6378137.0/262144.0) - (2.0*PI()*6378137.0)/2.0 AS env_min_x,
         |  (tile_x*16 + MAX(px) + 1) * (2.0*PI()*6378137.0/262144.0) - (2.0*PI()*6378137.0)/2.0 AS env_max_x,
         |  (2.0*PI()*6378137.0)/2.0 - (tile_y*16 + MIN(py)) * (2.0*PI()*6378137.0/262144.0) AS env_max_y,
         |  (2.0*PI()*6378137.0)/2.0 - (tile_y*16 + MAX(py) + 1) * (2.0*PI()*6378137.0/262144.0) AS env_min_y
         |FROM px2 GROUP BY 1,2,3""".stripMargin)
}
