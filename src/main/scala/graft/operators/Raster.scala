package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Raster <-> vector rasterization of deviation density onto z-tiles — the
 * north-rule's "raster<->vector" leg (see BASELINE.json north_star:
 * "Raster<->vector rasterization of deviation density onto z14 tiles"),
 * complementing `engine.Tiles` (vector MVT features per tile) with a density
 * grid per tile and its polygonization back to vector regions.
 *
 * Vector -> raster (`rasterize`): every input point lands in exactly one
 * pixel of the global web-mercator pixel grid at zoom z with `res`x`res`
 * pixels per tile (z14 x 256 = the slippy-map raster-tile convention). The
 * pixel index is pure column arithmetic (same floor/ln/tan forms as the
 * oracled `q_sp_tile`), so the whole operator is ONE hash aggregation with
 * map-side partial combine: the shuffle carries at most one row per occupied
 * pixel, not per input row — at the 10^12-row design point the output is
 * bounded by the density-grid size (Sweden at z14 ~1.5M tiles), never by the
 * input.
 *
 * Raster -> vector (`regions`): above-threshold pixels are merged into
 * tile-local 4-connected regions (union-find per tile, deterministic region
 * id = min linear pixel index), emitting per-region pixel count, total
 * density, pixel bbox and the EPSG:3857 envelope of that bbox. Per-tile
 * state is bounded by res^2 pixels (65,536 at res=256) REGARDLESS of input
 * scale, so the flatMapGroups stage is executor-safe and parallel across
 * occupied tiles. Regions deliberately do not span tile boundaries — the
 * reference's tile functions (12-v-deviation_preschools_scb.sql:75-99) are
 * per-tile by construction, and keeping the merge tile-local is what makes
 * the state bound hold.
 */
object Raster {

  /** Global pixel count per axis at zoom z with res pixels/tile. */
  def gridSize(z: Int, res: Int): Long = (1L << z) * res

  /**
   * Point density raster: one row per occupied pixel.
   * Output: tile_x, tile_y (slippy tile), px, py (0..res-1 within tile),
   * density (count, or sum(weight) when given).
   */
  /** Add tile_x/tile_y/px/py pixel-assignment columns — pure column
    * arithmetic, so it also runs inside a STREAMING aggregation's codegen
    * (see streaming.StreamingIngest.streamingDensity). */
  def withPixel(df: DataFrame, lonCol: Column, latCol: Column,
                z: Int, res: Int): DataFrame = {
    val nGrid = gridSize(z, res)
    val n = lit(nGrid.toDouble)
    val latR = radians(latCol)
    // NULL coordinates must DROP, not clamp: greatest/least skip null
    // arguments, so a null lon would otherwise fall through the clamp as
    // pixel 0 and silently inflate tile (0,0)'s density
    val dfNn = df.filter(lonCol.isNotNull && latCol.isNotNull)
    // clamp to the web-mercator grid: lon=180 maps to column nGrid and
    // |lat| beyond ±85.051° escapes [0, nGrid) vertically (bad-GPS rows in
    // the streaming path would otherwise land in nonexistent tiles like
    // tile_y = -1); clamping pins them to the edge pixel, matching the
    // usual slippy-map convention
    val gx = least(greatest(
      floor((lonCol + 180.0) / 360.0 * n), lit(0.0)), lit((nGrid - 1).toDouble)).cast("long")
    val gy = least(greatest(
      floor((lit(1.0) - log(tan(latR) + lit(1.0) / cos(latR)) / lit(math.Pi)) / 2.0 * n),
      lit(0.0)), lit((nGrid - 1).toDouble)).cast("long")
    dfNn.withColumn("gx", gx).withColumn("gy", gy)
      .withColumn("px", pmod(col("gx"), lit(res.toLong)).cast("int"))
      .withColumn("py", pmod(col("gy"), lit(res.toLong)).cast("int"))
      .withColumn("tile_x", ((col("gx") - col("px")) / res).cast("long"))
      .withColumn("tile_y", ((col("gy") - col("py")) / res).cast("long"))
  }

  def rasterize(df: DataFrame, lonCol: Column, latCol: Column,
                z: Int = 14, res: Int = 256,
                weight: Option[Column] = None): DataFrame = {
    val withPix = withPixel(df, lonCol, latCol, z, res)
    weight match {
      case Some(w) => withPix.groupBy("tile_x", "tile_y", "px", "py")
        .agg(sum(w).as("density"))
      case None => withPix.groupBy("tile_x", "tile_y", "px", "py")
        .agg(count(lit(1)).as("density"))
    }
  }

  /** Density raster for EPSG:3006-ish points (the engine's native plane):
    * project to lon/lat first (decode-once scalar UDF), then rasterize. */
  def rasterizeSweref(df: DataFrame, xCol: Column, yCol: Column,
                      z: Int = 14, res: Int = 256,
                      weight: Option[Column] = None): DataFrame = {
    val ll = graft.functions.GeoFunctions.swerefToLonLat(xCol, yCol)
    val projected = df.withColumn("_ll", ll)
    rasterize(projected, col("_ll._1"), col("_ll._2"), z, res, weight)
  }

  /**
   * Polygonize a density raster: tile-local 4-connected regions of pixels
   * with density >= minDensity. Deterministic: region = min linear pixel
   * index (py*res+px) in the component. Emits pixel bbox and its EPSG:3857
   * envelope (pixel edges, so adjacent regions share edges exactly).
   */
  /** Per-pixel tile-local labeling: union-find within each tile, label =
    * min linear pixel index (py*res+px) of the component. Internal building
    * block for both `regions` (per-tile aggregates) and `regionsGlobal`
    * (cross-tile merge). Bounded by res^2 pixels per group. */
  private[operators] def labeledPixels(raster: DataFrame, minDensity: Long,
                                       res: Int): DataFrame = {
    val spark = raster.sparkSession
    import spark.implicits._
    val resL = res
    raster
      // collapse duplicate pixel rows first — union-find indexes pixels by
      // linear position, so duplicates would silently split components. When
      // the input comes straight from rasterize the keys are already unique
      // and Catalyst reuses its hash partitioning (no extra shuffle).
      .groupBy("tile_x", "tile_y", "px", "py")
      .agg(sum("density").as("density"))
      .filter(col("density") >= minDensity)
      // density stays DOUBLE: weighted rasters (rasterize(weight=...)) carry
      // fractional densities — a long cast here silently truncated them;
      // count densities are integers < 2^53, exact in double
      .select(col("tile_x").cast("long"), col("tile_y").cast("long"),
        col("px").cast("int"), col("py").cast("int"), col("density").cast("double"))
      .as[(Long, Long, Int, Int, Double)]
      .groupByKey { case (tx, ty, _, _, _) => (tx, ty) }
      .flatMapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Int, Int, Double)]) =>
        val (tx, ty) = key
        // bounded by res^2 pixels per tile — safe to materialize
        val pix = it.toArray
        val idx = new java.util.HashMap[Int, Int](pix.length * 2)
        pix.zipWithIndex.foreach { case ((_, _, px, py, _), i) =>
          idx.put(py * resL + px, i)
        }
        val parent = Array.tabulate(pix.length)(identity)
        def find(a: Int): Int = { var r = a; while (parent(r) != r) r = parent(r)
          var c = a; while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }; r }
        def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b)
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
        pix.zipWithIndex.foreach { case ((_, _, px, py, _), i) =>
          val lin = py * resL + px
          if (px > 0 && idx.containsKey(lin - 1)) union(i, idx.get(lin - 1))
          if (py > 0 && idx.containsKey(lin - resL)) union(i, idx.get(lin - resL))
        }
        // region label = min linear index in the component
        val label = new java.util.HashMap[Int, Int]()
        pix.zipWithIndex.foreach { case ((_, _, px, py, _), i) =>
          val r = find(i); val lin = py * resL + px
          val cur = label.getOrDefault(r, Int.MaxValue)
          if (lin < cur) label.put(r, lin)
        }
        pix.zipWithIndex.iterator.map { case ((_, _, px, py, d), i) =>
          (tx, ty, px, py, d, label.get(find(i)).toLong)
        }
      }
      .toDF("tile_x", "tile_y", "px", "py", "density", "region")
  }

  def regions(raster: DataFrame, minDensity: Long, z: Int = 14, res: Int = 256): DataFrame = {
    val labeled = labeledPixels(raster, minDensity, res)
      .groupBy("tile_x", "tile_y", "region")
      .agg(count(lit(1)).as("n_pixels"), sum("density").as("density"),
        min("px").as("px_min"), min("py").as("py_min"),
        max("px").as("px_max"), max("py").as("py_max"))
    withMercatorEnvelope(labeled, z, res)
  }

  /**
   * Cross-tile polygonization — the full raster->vector scale path. Tile-
   * local regions become NODES of a region-adjacency graph (node id = the
   * GLOBAL linear index gy*N+gx of the region's label pixel — within one
   * tile the local (py,px) order equals the global (gy,gx) order, so the
   * label pixel is also the region's global minimum); regions owning
   * physically adjacent pixels across a tile edge get an EDGE; min-label
   * propagation (Dedup.connectedComponents — O(diameter) rounds over the
   * region graph, which holds regions, not pixels) merges the components.
   * `global_region` therefore equals the component's minimum global pixel
   * index, exactly what a single worldwide union-find would produce for
   * 4-connectivity. Per-round work is bounded by boundary-pixel counts
   * (≤ 4·res per tile), so the merge scales with occupied-tile count.
   */
  def regionsGlobal(raster: DataFrame, minDensity: Long,
                    z: Int = 14, res: Int = 256): DataFrame = {
    val n = gridSize(z, res)
    val pix = labeledPixels(raster, minDensity, res)
      .withColumn("gx", col("tile_x") * res + col("px"))
      .withColumn("gy", col("tile_y") * res + col("py"))
      // global node id of this pixel's region: label -> (gy, gx) of the
      // label pixel inside this tile
      .withColumn("glab",
        (col("tile_y") * res + (col("region") / res).cast("long")) * n
          + col("tile_x") * res + pmod(col("region"), lit(res.toLong)))
      .cache()
    val boundary = pix.filter(col("px") === 0 || col("px") === res - 1 ||
      col("py") === 0 || col("py") === res - 1)
    // horizontal: my east edge vs the next tile's west edge; vertical: south
    // vs north. One direction each — connectedComponents symmetrizes.
    val east = boundary.filter(col("px") === res - 1)
      .select((col("gx") + 1).as("gx"), col("gy"), col("glab").as("a_id"))
      .join(boundary.filter(col("px") === 0)
        .select(col("gx"), col("gy"), col("glab").as("b_id")), Seq("gx", "gy"))
      .select("a_id", "b_id")
    val south = boundary.filter(col("py") === res - 1)
      .select(col("gx"), (col("gy") + 1).as("gy"), col("glab").as("a_id"))
      .join(boundary.filter(col("py") === 0)
        .select(col("gx"), col("gy"), col("glab").as("b_id")), Seq("gx", "gy"))
      .select("a_id", "b_id")
    val edges = east.unionByName(south).filter(col("a_id") =!= col("b_id"))
    // maxIter bounds the propagation rounds at one hop per round; a corridor
    // region (river, road) can legitimately chain through MANY tiles, so the
    // region graph gets a deep cap — each round is a tiny job over region
    // edges and the loop exits early on convergence, so the cap only bites
    // on >128-tile chains (where labels remain a valid refinement)
    val comps = graft.operators.Dedup.connectedComponents(edges, maxIter = 128)
      .select(col("id").as("glab"), col("comp"))
    val out = pix.join(comps, Seq("glab"), "left")
      .withColumn("global_region", coalesce(col("comp"), col("glab")))
      .groupBy("global_region")
      .agg(count(lit(1)).as("n_pixels"), sum("density").as("density"),
        countDistinct(col("tile_x"), col("tile_y")).as("n_tiles"),
        min("gx").as("gx_min"), min("gy").as("gy_min"),
        max("gx").as("gx_max"), max("gy").as("gy_max"))
      // materialize the (region-sized) result, then free the labeled-pixel
      // cache — a lazy return would leave it pinned for the session
      .transform(Materialize(_))
    pix.unpersist()
    out
  }

  /** EPSG:3857 envelope of a pixel bbox — affine in the global pixel index,
    * with the arithmetic ordered EXACTLY as the DuckDB oracle writes it so
    * the doubles are bit-identical. */
  private def withMercatorEnvelope(df: DataFrame, z: Int, res: Int): DataFrame = {
    val nD = gridSize(z, res).toDouble
    val world = 2.0 * math.Pi * 6378137.0
    val psz = world / nD
    val gxMin = col("tile_x") * res + col("px_min")
    val gxMax = col("tile_x") * res + col("px_max")
    val gyMin = col("tile_y") * res + col("py_min")
    val gyMax = col("tile_y") * res + col("py_max")
    df.withColumn("env_min_x", gxMin * psz - world / 2.0)
      .withColumn("env_max_x", (gxMax + 1) * psz - world / 2.0)
      .withColumn("env_max_y", lit(world / 2.0) - gyMin * psz)
      .withColumn("env_min_y", lit(world / 2.0) - (gyMax + 1) * psz)
  }
}
