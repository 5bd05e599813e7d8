package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.tags.Tags
import graft.operators.SpatialJoin
import graft.sources.Pages
import graft.engine.MatchEngine.MatchConfig
import graft.engine.DeviationView._

/**
 * The flagship end-to-end pipeline over the web-scale input contract:
 * synthesize pages -> extract osm_element / upstream_item -> name-tier
 * cell-bucketed match (50 m other / 250 m name tiers) -> deviation rows.
 *
 * This is the throughput unit of BASELINE.json ("spatial-join + deviation
 * rows/sec"): everything downstream of `Pages.synthesize` is the production
 * path — at 10^12 pages only the generator is replaced by an Iceberg scan.
 */
object BenchPipeline {

  val spec: Tags.MatchSpec = Tags.MatchSpec(Some("name"), Nil, dOther = 50.0, dName = 250.0)

  val titles: Titles = Titles(
    missing = ("POI saknas", "Enligt källan ska det finnas en POI här"),
    possiblyClosed = Some(("POI möjligen stängd", "Enligt källan finns det ingen POI här")),
    missingTags = ("POI saknar taggar", "Följande taggar saknas på POI:n här"))

  def config(saltThreshold: Long = Long.MaxValue, saltFactor: Int = 16): MatchConfig =
    MatchConfig(
      matchSpec = spec,
      // r6 (guide §2.3/§1.2): candidate pairs scale with (2d+s)² per build
      // row (the probe's expanded envelope), so the old s=1000 m cells with
      // the 250 m max radius ground (1500)²-proportional pairs where
      // s=d=250 grinds (750)² — exactly 4× fewer candidate pairs for the
      // same exact refinement (measured 117.1M -> 29.4M). The trade is a
      // 3×3=9-cell probe cover (was ~2.25 avg), i.e. more exploded rows and
      // shuffle bytes for fewer refined pairs; measured at 8c/2.5M sites:
      // s=250 34.3 s, s=500 36.7 s, s=1000 62.3 s — CPU on pairs dominates
      // the local shuffle, so s=d wins. On a network cluster where shuffle
      // bytes bind first, s=2d (same bytes as s=1000, 2.25× fewer pairs) is
      // the operating point — see OPTIMIZATION_r06.md. Correct for any
      // s >= maxDistance (the 3×3 probe cover needs d <= s); match/
      // deviation row counts verified bit-identical at the 2.5M bench point
      // and by every view oracle.
      cellSize = spec.maxDistance,
      antiLeg = true,
      saltThreshold = saltThreshold,
      saltFactor = saltFactor,
      // DEFAULT OFF (r3): caching the refined candidates halves the
      // cell-join work (the anti leg reuses it) but only makes sense when
      // the candidate set fits executor memory — at the 10^12-row design
      // point it cannot, and even locally the cached blocks were the bench
      // JVM's dominant GC pressure (probed: 1-60 s of collection inside
      // measured runs; without the cache GC drops to ~1 s and 2-core runs
      // repeat within 8%). The anti leg recomputing its input is the same
      // trade the reference makes by re-reading mv_match from disk.
      cacheCandidates =
        sys.env.getOrElse("SPARK_GRAFT_CACHE_CANDIDATES", "false").toBoolean,
      // r6 A/B switch: eager narrow localCheckpoint of the refined
      // candidates (one cell-join execution for both legs, no fill race)
      checkpointCandidates =
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CANDIDATES", "false").toBoolean)

  /** dataset-level filter/projection over EXTRACTED features — shared by the
    * batch pipeline and the incremental streaming path (which reads the same
    * rows back from an ElementStore instead of re-extracting). */
  def filterOsm(osmAll: DataFrame): DataFrame =
    osmAll.filter(col("tags")("amenity") === "bench_poi")

  def projectUps(upsAll: DataFrame): DataFrame =
    upsAll.filter(col("dataset_id") === Pages.BenchDatasetId)
      .withColumn("ids", array(col("id")))
      .withColumn("tags", map_filter(
        map(lit("amenity"), lit("bench_poi"),
            lit("name"), get_json_object(col("original_attributes"), "$.name")),
        (_, v) => v.isNotNull))

  /** extraction + projection of both sides from a pages frame */
  def extract(pages: DataFrame): (DataFrame, DataFrame) = (
    filterOsm(Pages.extractOsmElements(pages)),
    projectUps(Pages.extractUpstreamItems(pages)))

  /** ONE filtered+parsed pass over the pages for BOTH match sides (r6,
    * guide §1.2 "remove unnecessary passes"): the old cacheInputs path
    * cached osm and ups separately, and each cache FILL re-ran the full
    * page synthesis + text build (measured 45.9 s + 46.5 s of the 8-core
    * pipeline's 263 s total executor time). This pass filters to feature
    * rows once, parses the shared grammar positions once (E/N are
    * parts[3]/[4] on both line types), and emits a superset schema both
    * sides project from — one synthesis instead of two. Field-for-field
    * the same expressions as extractOsmElements/extractUpstreamItems +
    * filterOsm/projectUps; BenchFeaturesSpec pins row parity with the
    * unfused path. */
  private[graft] def benchFeatures(pages: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.functions.GeoFunctions._
    val tagMapType = MapType(StringType, StringType, valueContainsNull = true)
    val p = pages
      .filter(col("lang") === "sv" &&
        (col("text").startsWith("OSM ") || col("text").startsWith("UPSTREAM ")))
      .withColumn("parts", split(col("text"), " ", 6))
      .withColumn("is_osm", col("parts")(0) === "OSM")
    val osmTags = from_json(col("parts")(5), tagMapType)
    val upsTags = map_filter(
      map(lit("amenity"), lit("bench_poi"),
          lit("name"), get_json_object(col("parts")(5), "$.name")),
      (_, v) => v.isNotNull)
    val upsId = expr("try_cast(parts[1] as long)") * lit(1000000000000L) +
      expr("try_cast(regexp_extract(parts[2], '(\\\\d+)', 1) as long)")
    p.filter(when(col("is_osm"), osmTags(lit("amenity")) === "bench_poi")
        .otherwise(expr("try_cast(parts[1] as long)") === Pages.BenchDatasetId))
      .select(
        col("is_osm"),
        when(col("is_osm"), col("parts")(1)).as("type"),
        when(col("is_osm"), expr("try_cast(parts[2] as long)"))
          .otherwise(upsId).as("id"),
        when(col("is_osm"), osmTags).otherwise(upsTags).as("tags"),
        expr("try_cast(parts[3] as double)").as("cx"),
        expr("try_cast(parts[4] as double)").as("cy"))
      .withColumn("geom",
        when(col("type") === "a",
          stEnvelopeWkb(col("cx") - 10, col("cy") - 10, col("cx") + 10, col("cy") + 10))
        .otherwise(stPoint(col("cx"), col("cy"))))
      .withColumn("is_point", col("type").isNull || col("type") =!= "a")
  }

  /** the two match sides projected from a [[benchFeatures]] frame */
  private[graft] def sidesFromFeatures(feat: DataFrame): (DataFrame, DataFrame) = (
    feat.filter(col("is_osm"))
      .select("type", "id", "tags", "geom", "cx", "cy", "is_point"),
    feat.filter(!col("is_osm")).select(
      array(col("id")).as("ids"), col("tags"), col("geom").as("geometry"),
      col("cx"), col("cy"), col("is_point")))

  /** @param cacheInputs materialize the extracted sides once — the match DAG
    *   consumes each side three times (leg-1 candidates, anti candidates,
    *   anti left_anti); at production scale these are one Iceberg scan each
    *   (the reference materializes mv_match too), so caching is the honest
    *   equivalent, not a benchmark trick. r6: the cached frame is the fused
    *   single-pass [[benchFeatures]] — one synthesis feeds both sides. */
  def matchRows(pages: DataFrame, saltThreshold: Long = Long.MaxValue,
                cacheInputs: Boolean = true): DataFrame = {
    val (osm, ups) =
      if (cacheInputs) {
        val feat = benchFeatures(pages).cache()
        // eager fill: the match DAG's four consumer stages start
        // CONCURRENTLY (AQE off, one job) and a lazily-filled cache makes
        // the first readers RACE — each recomputes synthesis for partitions
        // not yet stored (measured: 59 s + 28 s of duplicated fill work at
        // 8c). One count() fills every partition exactly once up front.
        feat.count()
        sidesFromFeatures(feat)
      } else extract(pages)
    matchRowsFrom(osm, ups, saltThreshold)
  }

  /** match over ALREADY-extracted (and caller-cached) sides — lets several
    * gate queries share ONE cached input pair instead of each `matchRows`
    * call pinning a fresh never-freed pair for the session. */
  def matchRowsFrom(osm: DataFrame, ups: DataFrame,
                    saltThreshold: Long = Long.MaxValue): DataFrame =
    MatchEngine.matchView(osm, ups, config(saltThreshold))

  /** memoized extracted inputs for the driver-gate entries: the five
    * q_pipe_* queries consume the same synthesized corpus within one
    * session — one shared cached pair replaces five leaked ones. */
  private val sharedInputCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, Long), (DataFrame, DataFrame)]()
  def sharedInputs(spark: SparkSession, nSites: Long = 3000L): (DataFrame, DataFrame) =
    sharedInputCache.computeIfAbsent((spark, nSites), { case (s, n) =>
      val (osm, ups) = extract(Pages.synthesize(s, n))
      (osm.cache(), ups.cache())
    })

  def deviations(matchDf: DataFrame): DataFrame =
    DeviationView.deviations(matchDf, DeviationConfig(
      datasetId = Pages.BenchDatasetId,
      layerId = 1L,
      viewName = "bench_pois",
      titles = titles,
      postFilter = MissingOrDiffNonEmpty))

  /** full run from synthesis; the flagship entry */
  def run(spark: SparkSession, nSites: Long, saltThreshold: Long = Long.MaxValue): DataFrame = {
    val pages = Pages.synthesize(spark, nSites)
    deviations(matchRows(pages, saltThreshold))
  }

  /** (matchRows, deviationRows) in ONE action: the deviation projection runs
    * unfiltered with an `emitted` flag, so a single aggregation counts both —
    * no intermediate cache of the match frame, one pass end to end.
    * `densityRefSites` forwards to [[Pages.synthesize]]'s constant-density
    * mode (the linear-in-corpus measurement of BASELINE.md §3f). */
  def pipelineCounts(spark: SparkSession, nSites: Long,
                     densityRefSites: Option[Long] = None): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val pages = Pages.synthesize(spark, nSites, densityRefSites = densityRefSites)
    val m = matchRows(pages)
    val all = DeviationView.deviations(m, DeviationConfig(
      datasetId = Pages.BenchDatasetId, layerId = 1L, viewName = "bench_pois",
      titles = titles, postFilter = CustomFilter(lit(true))))
      // SAME predicate object the production view filters by — an inline
      // re-statement here could silently count a different population
      .withColumn("emitted", MissingOrDiffNonEmpty.pred.cast("long"))
    val r = all.agg(count(lit(1)).as("m"), sum(col("emitted")).as("d")).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
