package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** A/B scratch: pipeline times at (cores, shufflePartitions, cacheCompressed)
  * combos — N runs per session, ALL times + per-run GC seconds reported so
  * window steal and GC share are separable. */
object AbProbe {
  private def gcMillis: Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  private def run(cores: Int, parts: Int, compressed: Boolean, n: Long, reps: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"ab-$cores-$parts-$compressed")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.inMemoryColumnarStorage.compressed", compressed.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      val g0 = gcMillis
      val t0 = System.nanoTime()
      graft.engine.BenchPipeline.pipelineCounts(spark, n)
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = (gcMillis - g0) / 1e3
      spark.sharedState.cacheManager.clearCache()
      println(f"ABRUN cores=$cores parts=$parts compressed=$compressed rep=$i sec=$sec%.2f gc_sec=$gc%.2f")
    }
    spark.stop()
  }
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_AB_SITES", "2500000").toLong
    val combos = args.headOption.getOrElse("8,32,false").split(";").toSeq.map { s =>
      val Array(c, p, z) = s.split(","); (c.toInt, p.toInt, z.toBoolean)
    }
    for ((c, p, z) <- combos) run(c, p, z, n, reps = 3)
  }
}
