package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-phase wall-clock of the flagship pipeline at one core count —
  * diagnosis harness for scaling anomalies. args: cores nSites */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"PHASE $label cores=$cores n=$n rows=$c sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // warm-up
    graft.engine.BenchPipeline.run(spark, 10000L).count()
    spark.sharedState.cacheManager.clearCache()

    val pages = graft.sources.Pages.synthesize(spark, n)
    t("synthesize")(pages.count())
    val (osm, ups) = graft.engine.BenchPipeline.extract(pages)
    t("extract_osm")(osm.count())
    t("extract_ups")(ups.count())
    val osmC = osm.cache(); val upsC = ups.cache()
    t("cache_osm")(osmC.count())
    t("cache_ups")(upsC.count())
    val m = graft.engine.MatchEngine.matchView(osmC, upsC, graft.engine.BenchPipeline.config())
    t("match_full")(m.count())
    val mC = m.cache()
    t("match_cache")(mC.count())
    val d = graft.engine.BenchPipeline.deviations(mC)
    t("deviations")(d.count())
    spark.stop()
  }
}
