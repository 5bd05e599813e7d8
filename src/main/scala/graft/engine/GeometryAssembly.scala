package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.geom._
import graft.functions.GeoFunctions._

/**
 * OSM topology -> geometry assembly (SURVEY.md §2.10 T2/T3), the Spark
 * re-expression of dags/osm_bjk/replication/build_geometries.py:
 *
 *  - way geom    = ST_MakeLine(node.geom ORDER BY sequence_order)
 *                  -> groupBy(way_id) + sort_array(collect_list) + line UDF;
 *  - closed ways (first == last, > 3 points) -> areas (id = way_id);
 *  - type=multipolygon relations -> ST_BuildArea(ST_Collect(member ways))
 *    (role-insensitive, id = relation_id + 3_600_000_000);
 *  - osm.element = union of nodes ('n'), ways ('w'), areas ('a')
 *    (06-osm-element.sql:3-12);
 *  - dirty propagation: node -> containing ways -> containing relations.
 *
 * Everything is a shuffle-by-key groupBy — the topology join partitions by
 * way_id / relation_id and scales linearly with the replication batch.
 */
object GeometryAssembly {

  private val makeLineU = udf((xs: Seq[Double], ys: Seq[Double]) =>
    if (xs == null || xs.isEmpty) null
    else Geom.toWkb(LineStringG(xs.zip(ys).map { case (x, y) => Pt(x, y) }.toArray)))

  private val closedWayAreaU = udf((wkb: Array[Byte]) => {
    if (wkb == null) null
    else Geom.fromWkb(wkb) match {
      case l: LineStringG if l.pts.length > 3 && l.pts.head == l.pts.last =>
        // ST_Multi(ST_MakePolygon(...)): multipolygon of the single ring
        Geom.toWkb(MultiPolygonG(Array(PolygonG(Array(l.pts)))))
      case _ => null
    }
  })

  private val buildAreaU = udf((wkbs: Seq[Array[Byte]]) => {
    val lines = wkbs.filter(_ != null).map(Geom.fromWkb).collect {
      case l: LineStringG => l
    }
    Geom.buildArea(lines).map(Geom.toWkb).orNull
  })

  /** ways(id, tags[, ts]) x wayNodes(way_id, node_id, sequence_order) x
    * nodes(id, cx, cy) -> ways + geom (LineString WKB). Ways with no nodes
    * get a null geom (reference behavior: the subquery yields NULL). */
  def buildWayGeoms(ways: DataFrame, wayNodes: DataFrame, nodes: DataFrame): DataFrame = {
    val pts = wayNodes
      .join(nodes.select(col("id").as("node_id"), col("cx"), col("cy")), Seq("node_id"))
      .groupBy(col("way_id"))
      .agg(sort_array(collect_list(struct(
        col("sequence_order").as("seq"), col("cx"), col("cy")))).as("ordered"))
      .select(col("way_id").as("id"),
        makeLineU(expr("transform(ordered, p -> p.cx)"),
                  expr("transform(ordered, p -> p.cy)")).as("geom"))
    ways.drop("geom").join(pts, Seq("id"), "left")
  }

  /** closed ways -> osm.area rows (id = way_id). */
  def areasFromWays(waysWithGeom: DataFrame): DataFrame =
    waysWithGeom
      .withColumn("ageom", closedWayAreaU(col("geom")))
      .filter(col("ageom").isNotNull)
      .select(col("id"), col("tags"), col("ageom").as("geom"),
        col("id").as("way_id"), lit(null).cast("long").as("relation_id"))

  /** multipolygon relations -> osm.area rows (id = relation_id + 3.6e9). */
  def areasFromRelations(relations: DataFrame, relationMemberWays: DataFrame,
                         waysWithGeom: DataFrame): DataFrame =
    relations.filter(col("tags")("type") === "multipolygon")
      .select(col("id").as("relation_id"), col("tags"))
      .join(relationMemberWays.select(col("relation_id"), col("member_id")), Seq("relation_id"))
      .join(waysWithGeom.select(col("id").as("member_id"), col("geom").as("wgeom")), Seq("member_id"))
      .groupBy(col("relation_id"), col("tags"))
      .agg(collect_list(col("wgeom")).as("wgeoms"))
      .withColumn("geom", buildAreaU(col("wgeoms")))
      .filter(col("geom").isNotNull) // HAVING ST_BuildArea(...) IS NOT NULL
      .select((col("relation_id") + 3600000000L).as("id"), col("tags"), col("geom"),
        lit(null).cast("long").as("way_id"), col("relation_id"))

  /** the unified osm.element table: nodes 'n' ∪ ways 'w' ∪ areas 'a'. */
  def elements(nodes: DataFrame, waysWithGeom: DataFrame, areas: DataFrame): DataFrame = {
    val n = nodes.select(lit("n").as("type"), col("id"), col("tags"), col("geom"))
    val w = waysWithGeom.select(lit("w").as("type"), col("id"), col("tags"), col("geom"))
    val a = areas.select(lit("a").as("type"), col("id"), col("tags"), col("geom"))
    graft.operators.SpatialJoin.withGeoMeta(
      n.unionByName(w).unionByName(a).filter(col("geom").isNotNull), "geom")
  }

  /**
   * osm.site (30-osm-site.sql:1-8): relations tagged 'site' joined to their
   * assembled area geometries through perimeter/boundary/outer members.
   * Output columns mirror the reference view: (id, tags, geom). Member
   * frames carry (relation_id, member_id, role) per 04-osm-base.sql:96-114.
   *
   * Reference quirk preserved VERBATIM: the relation-member join's role
   * filter tests rmw.role — the WAY member's role — not rmr.role
   * (30-osm-site.sql:5 reads `AND rmw.role IN (...)` inside the rmr join).
   * Visible effects, both spec-pinned: a site relation with ONLY relation
   * members never surfaces (rmw.role is NULL, so the rmr join can never
   * match and the area inner join finds nothing); and every relation-member
   * area row is emitted once PER qualifying way-member row (the rmw × rmr
   * cross product's multiplicity).
   *
   * Scale: the reference's disjunctive inner join (`area.way_id =
   * rmw.member_id OR area.relation_id = rmr.member_id`) would plan as a
   * nested-loop join in Spark; it is split into two hash equi-joins whose
   * union is bit-identical — the second leg keeps exactly the rows where
   * the way condition is NOT TRUE (false or null), so a pathological area
   * row satisfying both disjuncts still surfaces once, like the SQL OR.
   */
  def siteView(relations: DataFrame, relationMemberWays: DataFrame,
               relationMemberRelations: DataFrame, areas: DataFrame): DataFrame = {
    val roles = Seq("perimeter", "boundary", "outer")
    val sites = relations
      .filter(map_contains_key(col("tags"), lit("site")))
      .select(col("id"), col("tags"))
    val rmw = relationMemberWays.select(
      col("relation_id").as("rmw_relation_id"),
      col("member_id").as("rmw_member_id"), col("role").as("rmw_role"))
    val rmr = relationMemberRelations.select(
      col("relation_id").as("rmr_relation_id"),
      col("member_id").as("rmr_member_id"))
    val roleOk = col("rmw_role").isin(roles: _*)
    val withWays = sites.join(rmw,
      col("rmw_relation_id") === col("id") && roleOk, "left")
    val withBoth = withWays.join(rmr,
      // [sic] rmw.role, not rmr.role — the reference quirk
      col("rmr_relation_id") === col("id") && roleOk, "left")
    val a = areas.select(col("way_id").as("a_way_id"),
      col("relation_id").as("a_relation_id"), col("geom"))
    val wayCond = col("a_way_id") === col("rmw_member_id")
    val relCond = col("a_relation_id") === col("rmr_member_id")
    val viaWay = withBoth.join(a, wayCond)
    val viaRel = withBoth.join(a, relCond && !coalesce(wayCond, lit(false)))
    viaWay.select(col("id"), col("tags"), col("geom"))
      .unionByName(viaRel.select(col("id"), col("tags"), col("geom")))
  }

  private val buildSimplifyU = udf((wkbs: Seq[Array[Byte]], tol: Double) => {
    val lines = wkbs.filter(_ != null).map(Geom.fromWkb).collect {
      case l: LineStringG => l
    }
    Geom.buildArea(lines).map(a => Geom.toWkb(Geom.simplify(a, tol))).orNull
  })

  /**
   * Municipality-geometry refresh (scripts/update-municipality-geometries
   * .sql:1-15): relations tagged type=boundary, admin_level=7 with a KNKOD
   * tag are grouped BY KNKOD (several relations sharing a code merge their
   * member ways), assembled via ST_BuildArea(ST_Collect(way geoms)) and
   * simplified with ST_SimplifyPreserveTopology(·, tolerance); the
   * municipality dim is then updated with COALESCE(computed, old) for
   * matching codes only — codes with no computed row keep their geometry,
   * and so do codes whose assembly yields NULL (open ring soup).
   *
   * Scale: the groupBy shuffles boundary-way geoms by code — O(boundary
   * ways), same as the reference's GROUP BY. The computed side is one row
   * per municipality (≤290 in production), broadcast into the dim update so
   * the refresh never shuffles the dim; the result is the usual broadcast
   * PiP side (MuniIndex re-derives its decoded cache from it).
   */
  def municipalityGeometries(relations: DataFrame, relationMemberWays: DataFrame,
                             waysWithGeom: DataFrame, municipalities: DataFrame,
                             tolerance: Double = 10.0): DataFrame = {
    val boundary = relations
      .filter(col("tags")("type") === "boundary" &&
              col("tags")("admin_level") === "7" &&
              col("tags")("KNKOD").isNotNull)
      .select(col("id").as("relation_id"), col("tags")("KNKOD").as("code"))
    val computed = boundary
      .join(relationMemberWays.select(col("relation_id"), col("member_id")), Seq("relation_id"))
      .join(waysWithGeom.select(col("id").as("member_id"), col("geom").as("wgeom")), Seq("member_id"))
      .groupBy(col("code"))
      .agg(collect_list(col("wgeom")).as("wgeoms"))
      .select(col("code"), buildSimplifyU(col("wgeoms"), lit(tolerance)).as("new_geom"))
    municipalities
      .join(broadcast(computed), Seq("code"), "left")
      .withColumn("geom", coalesce(col("new_geom"), col("geom")))
      .drop("new_geom")
  }

  /** dirty propagation (T2): changed nodes dirty their ways; changed ways
    * dirty their multipolygon relations. Returns (dirtyWayIds, dirtyRelIds). */
  def propagateDirty(dirtyNodeIds: DataFrame, dirtyWayIds: DataFrame,
                     wayNodes: DataFrame, relationMemberWays: DataFrame): (DataFrame, DataFrame) = {
    val waysFromNodes = wayNodes
      .join(dirtyNodeIds.select(col("id").as("node_id")), Seq("node_id"))
      .select(col("way_id").as("id")).distinct()
    val allDirtyWays = dirtyWayIds.select("id").unionByName(waysFromNodes).distinct()
    val relsFromWays = relationMemberWays
      .join(allDirtyWays.select(col("id").as("member_id")), Seq("member_id"))
      .select(col("relation_id").as("id")).distinct()
    (allDirtyWays, relsFromWays)
  }
}
