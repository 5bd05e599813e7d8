package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B scratch: pipeline time at (cores, shufflePartitions, cacheCompressed)
  * combos — two warmed runs each, min reported. */
object AbProbe {
  private def run(cores: Int, parts: Int, compressed: Boolean, n: Long): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"ab-$cores-$parts-$compressed")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.inMemoryColumnarStorage.compressed", compressed.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var best = Double.MaxValue
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.engine.BenchPipeline.pipelineCounts(spark, n)
      best = math.min(best, (System.nanoTime() - t0) / 1e9)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
    best
  }
  def main(args: Array[String]): Unit = {
    val n = 2500000L
    val combos = args.headOption.getOrElse("2,8,false").split(";").toSeq.map { s =>
      val Array(c, p, z) = s.split(","); (c.toInt, p.toInt, z.toBoolean)
    }
    for ((c, p, z) <- combos) {
      val t = run(c, p, z, n)
      println(f"AB cores=$c parts=$p compressed=$z sec=$t%.2f")
    }
  }
}
