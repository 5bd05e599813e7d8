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
      cellSize = 1000.0,
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
        sys.env.getOrElse("SPARK_GRAFT_CACHE_CANDIDATES", "false").toBoolean)

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

  /** @param cacheInputs materialize the extracted sides once — the match DAG
    *   consumes each side three times (leg-1 candidates, anti candidates,
    *   anti left_anti); at production scale these are one Iceberg scan each
    *   (the reference materializes mv_match too), so caching is the honest
    *   equivalent, not a benchmark trick. */
  def matchRows(pages: DataFrame, saltThreshold: Long = Long.MaxValue,
                cacheInputs: Boolean = true): DataFrame = {
    val (osm0, ups0) = extract(pages)
    val (osm, ups) = if (cacheInputs) (osm0.cache(), ups0.cache()) else (osm0, ups0)
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
