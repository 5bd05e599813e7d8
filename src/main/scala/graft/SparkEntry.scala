package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: full pages -> extract -> spatial match -> deviations pipeline
    * on deterministically synthesized web pages (sf0.001-scale). */
  def entry(spark: SparkSession): DataFrame = {
    import graft.functions.GeoFunctions
    GeoFunctions.registerAll(spark)
    graft.engine.BenchPipeline.run(spark, nSites = 2000L)
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map()
}
