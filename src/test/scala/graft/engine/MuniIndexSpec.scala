package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.{Geom, PolygonG, Pt}

/** VERDICT r2 #1: municipality stamping must decode the broadcast polygons
  * once per executor (not per row) and envelope-prefilter before the
  * winding-number test. Fixture: 290 realistic circles of 512 vertices each —
  * the r2 per-row-decode implementation is ~100× slower here. */
class MuniIndexSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def circle(cx: Double, cy: Double, r: Double, n: Int = 512): PolygonG = {
    val pts = (0 to n).map { i =>
      val a = 2 * math.Pi * (i % n) / n
      Pt(cx + r * math.cos(a), cy + r * math.sin(a))
    }.toArray
    PolygonG(Array(pts))
  }

  // 290 non-overlapping circles on a grid, 10 km pitch, 4 km radius
  private val muniRows: Seq[(String, Array[Byte])] =
    (0 until 290).map { i =>
      val cx = (i % 17) * 10000.0 + 5000.0
      val cy = (i / 17) * 10000.0 + 5000.0
      (f"$i%04d", Geom.toWkb(circle(cx, cy, 4000.0)))
    }

  test("stamping decodes polygons once per JVM, correct codes, border-straddler gets none") {
    val munisDf = muniRows.toDF("code", "geom")
    val bMunis = MuniIndex.broadcastFrom(munisDf)

    // 20k points: each sits near the center of muni m = id % 289 (the full
    // 17×17 part of the grid); every 7th is pushed 4.9 km east into the dead
    // zone between circles (no code)
    val m = pmod(col("id"), lit(289))
    val pts = spark.range(20000).select(
      col("id"),
      ((m % 17) * 10000 + 5000 + when(col("id") % 7 === 0, 4900).otherwise(col("id") % 100)).cast("double").as("px"),
      ((m / 17).cast("long") * 10000 + 5000).cast("double").as("py"),
      when(col("id") % 7 === 0, lit(null).cast("string"))
        .otherwise(format_string("%04d", m)).as("expected"))
    val withGeom = pts
      .withColumn("geom", graft.functions.GeoFunctions.stPoint(col("px"), col("py")))

    val before = MuniIndex.decodeCount.get()
    val stamped = MatchEngine.withMunicipality(withGeom, bMunis).cache()
    val mismatches = stamped
      .filter(!(col("muni_code") <=> col("expected"))).limit(5).collect()
    assert(mismatches.isEmpty, mismatches.mkString("; "))
    val decodes = MuniIndex.decodeCount.get() - before
    assert(decodes <= 2, s"polygons decoded $decodes times — must be once per JVM, not per row")
    stamped.unpersist()

    // a 2 km box straddling circle 0's boundary: full-geometry containment →
    // no code (reference ST_Within semantics)
    val straddler = Seq((1L, Geom.toWkb(Geom.envelopePoly(8000, 4000, 10000, 6000))))
      .toDF("id", "geom")
    val s = MatchEngine.withMunicipality(straddler, bMunis).select("muni_code").collect()
    assert(s(0).isNullAt(0))

    // closest fallback picks the nearest circle for a dead-zone point
    val dead = Seq((1L, Geom.toWkb(Geom.point(9900.0, 5000.0)))).toDF("id", "geom")
    val c = MatchEngine.withMunicipality(dead, bMunis, closestFallback = true)
      .select("muni_code").collect()
    assert(c(0).getString(0) == "0000" || c(0).getString(0) == "0001")
  }

  test("290 realistic polygons stamp within a small factor of a 3-polygon fixture") {
    val big = MuniIndex.broadcastFrom(muniRows.toDF("code", "geom"))
    val small = MuniIndex.broadcastFrom(muniRows.take(3).toDF("code", "geom"))
    val pts = spark.range(50000).select(
      col("id"),
      ((col("id") % 17) * 10000 + 5000).cast("double").as("px"),
      (pmod(col("id"), lit(290)) / 17 * 10000 + 5000).cast("double").as("py"))
      .withColumn("geom", graft.functions.GeoFunctions.stPoint(col("px"), col("py")))
      .cache()
    pts.count()
    def timeIt(b: org.apache.spark.broadcast.Broadcast[MuniIndex]): Double = {
      // min of 2 — the sandbox runs under heavy hypervisor steal
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        MatchEngine.withMunicipality(pts, b).select("muni_code").count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    timeIt(small) // warm-up (codegen + JIT)
    val tSmall = timeIt(small)
    val tBig = timeIt(big)
    info(f"stamp 50k pts: 3 polys ${tSmall}%.3f s, 290×512-vertex polys ${tBig}%.3f s (${tBig / tSmall}%.1fx)")
    // decode-once + envelope prefilter keep the realistic fixture within a
    // small constant of the toy one (the r2 per-row decode was ~100×); the
    // bound is generous because winding over 512 vertices is inherent work
    // and the host has bursty steal
    assert(tBig <= tSmall * 8 + 0.5, f"stamp stage degraded: ${tBig}%.3f vs ${tSmall}%.3f")
    pts.unpersist()
  }
}
