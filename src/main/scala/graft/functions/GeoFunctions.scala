package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.geom._
import graft.core.cell.Grid
import graft.core.tags.Tags

/**
 * Spark-facing function surface over the pure core (graft.core.*).
 *
 * Design note (SURVEY.md §4): the hot-path distance refinement in the match
 * join does NOT go through these UDFs — point/point distance is computed with
 * native codegen'd column arithmetic on materialized (cx, cy) columns; the
 * WKB UDFs below are the general-geometry fallback and the fixture/export
 * path. Everything here is deterministic and null-tolerant.
 */
object GeoFunctions {

  // ---- geometry scalar UDFs (WKB BinaryType) -------------------------------
  /** POINT(x, y) as WKB — r6: native codegen expression (graft.plans.
    * StPointWkb) instead of a boxed ScalaUDF; byte-identical output (same
    * Geom.toWkb codec), null-in-null-out and always-nullable like the UDF
    * it replaces. The SQL-registered `st_point` keeps the UDF form below. */
  def stPoint(x: Column, y: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    // the .cast("double") mirrors ScalaUDF's implicit input cast (a
    // double->double cast is elided by Catalyst, so the common case is free)
    GraftBridge.column(graft.plans.StPointWkb(
      GraftBridge.expression(x.cast("double")),
      GraftBridge.expression(y.cast("double"))))
  }
  private val stPointUdf = udf((x: Double, y: Double) => Geom.toWkb(Geom.point(x, y)))

  val stDistance = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else java.lang.Double.valueOf(Geom.distance(Geom.fromWkb(a), Geom.fromWkb(b))))

  val stDWithin = udf((a: Array[Byte], b: Array[Byte], d: Double) =>
    if (a == null || b == null) null
    else java.lang.Boolean.valueOf(Geom.dwithin(Geom.fromWkb(a), Geom.fromWkb(b), d)))

  val stWithin = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else java.lang.Boolean.valueOf(Geom.within(Geom.fromWkb(a), Geom.fromWkb(b))))

  /** Centroid as (x, y) struct — callers usually need coordinates, not WKB. */
  val stCentroid = udf((a: Array[Byte]) =>
    if (a == null) null
    else { val c = Geom.fromWkb(a).centroid; (c.x, c.y) })

  val stCentroidWkb = udf((a: Array[Byte]) =>
    if (a == null) null else Geom.toWkb(PointG(Geom.fromWkb(a).centroid)))

  val stEnvelope = udf((a: Array[Byte]) =>
    if (a == null) null
    else { val e = Geom.fromWkb(a).envelope; (e.minX, e.minY, e.maxX, e.maxY) })

  val stIsPoint = udf((a: Array[Byte]) =>
    if (a == null) null
    else java.lang.Boolean.valueOf(Geom.fromWkb(a).isInstanceOf[PointG]))

  /** ST_MakeEnvelope: axis-aligned rectangle polygon as WKB — r6: native
    * codegen expression (graft.plans.StEnvelopePolyWkb), same parity
    * contract as [[stPoint]]. */
  def stEnvelopeWkb(minX: Column, minY: Column, maxX: Column, maxY: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.StEnvelopePolyWkb(
      GraftBridge.expression(minX.cast("double")),
      GraftBridge.expression(minY.cast("double")),
      GraftBridge.expression(maxX.cast("double")),
      GraftBridge.expression(maxY.cast("double"))))
  }

  /** ST_SimplifyPreserveTopology analog (Geom.simplify — DP + collapse guard). */
  val stSimplify = udf((a: Array[Byte], tol: Double) =>
    if (a == null) null else Geom.toWkb(Geom.simplify(Geom.fromWkb(a), tol)))

  val stArea = udf((a: Array[Byte]) =>
    if (a == null) null else java.lang.Double.valueOf(Geom.area(Geom.fromWkb(a))))

  val stNPoints = udf((a: Array[Byte]) =>
    if (a == null) null else java.lang.Integer.valueOf(Geom.nPoints(Geom.fromWkb(a))))

  /** ST_MakeLine from parallel coordinate arrays (fixture/synthesis helper);
    * mismatched lengths fail loudly like PostGIS rejects bad input. */
  val stMakeLine = udf((xs: Seq[Double], ys: Seq[Double]) =>
    if (xs == null || ys == null || xs.isEmpty) null
    else {
      require(xs.length == ys.length, s"stMakeLine: ${xs.length} xs vs ${ys.length} ys")
      Geom.toWkb(LineStringG(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toArray))
    })

  val stFromWkt = udf((wkt: String) => if (wkt == null) null else Geom.toWkb(Geom.fromWkt(wkt)))
  val stAsWkt = udf((a: Array[Byte]) => if (a == null) null else Geom.toWkt(Geom.fromWkb(a)))

  /** ST_MakeLine(centroid(a), centroid(b)) — the tile arrow feature (12:80). */
  val stMakeArrow = udf((a: Array[Byte], b: Array[Byte]) =>
    if (a == null || b == null) null
    else Geom.toWkb(LineStringG(Array(Geom.fromWkb(a).centroid, Geom.fromWkb(b).centroid))))

  // ---- cell index ------------------------------------------------------------
  /** Cells covering the geometry's envelope expanded by `radius` (probe side)
    * — native Catalyst expression with doGenCode (graft.plans.CellCover), so
    * the general-geometry cover stays in whole-stage codegen like the point
    * fast path. */
  def cellsOf(wkb: Column, radius: Column, cellSize: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.CellCover(GraftBridge.expression(wkb),
      GraftBridge.expression(radius), GraftBridge.expression(cellSize)))
  }

  /** native ST_Distance (graft.plans.STDistance) — the non-point refinement. */
  def stDistanceNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.plans.STDistance(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  val cellOfPoint = udf((x: Double, y: Double, cellSize: Double) => Grid.cellOf(x, y, cellSize))

  // ---- SWEREF99 <-> tiles -----------------------------------------------------
  /** z-tile of an EPSG:3006 point as (tx, ty) struct. */
  val tileOfSweref = udf((x: Double, y: Double, z: Int) => Proj.tileOfSweref(x, y, z))

  val swerefToLonLat = udf((x: Double, y: Double) => Proj.swerefToWgs84(x, y))

  // ---- tag functions -----------------------------------------------------------
  val tagDiff = udf((old: Map[String, String], nw: Map[String, String]) => Tags.tagDiff(old, nw))

  val countTagKeys = udf((m: Map[String, String]) => Tags.countKeys(m))

  val fixNameU = udf((s: String) => Tags.fixName(s))
  val fixPhoneU = udf((s: String) => Tags.fixPhone(s))
  /** PG 3-arg REGEXP_REPLACE: non-global (first occurrence only) — Spark's
    * regexp_replace is global, so views using the PG form need this.
    * CAVEAT: pattern AND replacement use JAVA regex semantics, not POSIX —
    * `$`/`\` in the replacement are group references here (PG uses `\1`).
    * Current call sites pass literal patterns + empty replacements; a port
    * needing PG group refs must translate them (or quoteReplacement). */
  val regexpReplaceFirstU = udf((s: String, pattern: String, repl: String) =>
    if (s == null) null else s.replaceFirst(pattern, repl))
  val translateOperatorU = udf((s: String) => Tags.translateOperator(s))

  /** Serialize a tag map to canonical sorted JSON (stable for oracle hashing).
    * Json.quote escapes control characters too — OSM description/note values
    * can carry newlines, and a raw 0x0A inside a JSON string is invalid. */
  val tagsToJson = udf((m: Map[String, String]) =>
    if (m == null) null
    else m.toSeq.sortBy(_._1).map { case (k, v) =>
      val vs = if (v == null) "null" else graft.core.Json.quote(v)
      graft.core.Json.quote(k) + ":" + vs
    }.mkString("{", ",", "}"))

  /** match_condition / match_score for a fixed spec, over tag maps + distance. */
  def matchConditionU(spec: Tags.MatchSpec) =
    udf((tagsA: Map[String, String], tagsB: Map[String, String], dist: Double) => {
      val a = if (tagsA == null) Map.empty[String, String] else tagsA
      val b = if (tagsB == null) Map.empty[String, String] else tagsB
      Tags.matchCondition(spec, a, b, dist)
    })

  def matchScoreU(spec: Tags.MatchSpec) =
    udf((tagsA: Map[String, String], tagsB: Map[String, String], dist: Double) => {
      val a = if (tagsA == null) Map.empty[String, String] else tagsA
      val b = if (tagsB == null) Map.empty[String, String] else tagsB
      Tags.matchScore(spec, a, b, dist)
    })

  // ---- planar distance on native columns (codegen hot path) -----------------
  /** Euclidean distance between two (x, y) pairs — pure column arithmetic,
    * stays inside WholeStageCodegen. */
  def pointDist(ax: Column, ay: Column, bx: Column, by: Column): Column =
    sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by))

  // ---- match condition / score as NATIVE column expressions -----------------
  // The hot-path versions of matchConditionU/matchScoreU: pure Catalyst
  // expressions (map_contains_key / arrays_overlap / lower), so the candidate
  // refinement stays inside WholeStageCodegen. Overload quirks match
  // 03a-match.sql exactly (see Tags.matchScore scaladoc).
  import graft.core.tags.Tags.MatchSpec

  private def refsAgreeCol(spec: MatchSpec, tagsA: Column, tagsB: Column): Column =
    spec.refKeys.map { k =>
      map_contains_key(tagsA, lit(k)) &&
        arrays_overlap(split(tagsA(k), ";"), split(tagsB(k), ";"))
    }.reduceOption(_ && _).getOrElse(lit(false))

  private def namesAgreeCol(spec: MatchSpec, tagsA: Column, tagsB: Column): Column =
    spec.nameKey.map { nk =>
      map_contains_key(tagsA, lit(nk)) && (lower(tagsA(nk)) === lower(tagsB(nk)))
    }.getOrElse(lit(false))

  def matchConditionCol(spec: MatchSpec, tagsA: Column, tagsB: Column, dist: Column): Column =
    (refsAgreeCol(spec, tagsA, tagsB) && dist <= spec.dRef) ||
      (namesAgreeCol(spec, tagsA, tagsB) && dist <= spec.dName) ||
      dist <= spec.dOther

  def matchScoreCol(spec: MatchSpec, tagsA: Column, tagsB: Column, dist: Column): Column = {
    val refTier: Column = spec.refKeys match {
      case Seq(r1) =>
        map_contains_key(tagsA, lit(r1)) &&
          arrays_overlap(split(tagsA(r1), ";"), split(tagsB(r1), ";"))
      case Seq(r1, r2) => // score compares ref2 by equality, not overlap (03a:58)
        map_contains_key(tagsA, lit(r1)) && map_contains_key(tagsA, lit(r2)) &&
          arrays_overlap(split(tagsA(r1), ";"), split(tagsB(r1), ";")) &&
          (tagsA(r2) === tagsB(r2))
      case _ => lit(false)
    }
    val nameTier: Column = spec.nameKey.map { nk =>
      if (spec.refKeys.nonEmpty)
        map_contains_key(tagsA, lit(nk)) && (lower(tagsA(nk)) === lower(tagsB(nk)))
      else tagsA(nk) === tagsB(nk) // name-only overload: case-sensitive (03a:70)
    }.getOrElse(lit(false))
    when(refTier, lit(spec.dRef) + dist)
      .when(nameTier, lit(spec.dName) + dist)
      .otherwise(lit(spec.dOther) + dist)
  }

  /** Register the SQL-name surface (spark.sql usable). */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("st_point", stPointUdf)
    spark.udf.register("st_distance", stDistance)
    spark.udf.register("st_dwithin", stDWithin)
    spark.udf.register("st_within", stWithin)
    spark.udf.register("st_centroid_wkb", stCentroidWkb)
    spark.udf.register("st_aswkt", stAsWkt)
    spark.udf.register("st_fromwkt", stFromWkt)
    spark.udf.register("tag_diff", tagDiff)
    spark.udf.register("fix_name", fixNameU)
    spark.udf.register("fix_phone", fixPhoneU)
    spark.udf.register("tile_of_sweref", tileOfSweref)
  }
}
