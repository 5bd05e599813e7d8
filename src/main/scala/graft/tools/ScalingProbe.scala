package graft.tools

import org.apache.spark.sql.SparkSession

/** Experiment harness: pipeline wall-clock at several (cores, nSites) points
  * to pick the bench operating point where scaling efficiency is honest
  * (overhead-amortized) — results feed Bench defaults + BASELINE.md. */
object ScalingProbe {
  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"probe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR", "/tmp"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def run(s: SparkSession, n: Long): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val (mr, dr) = graft.engine.BenchPipeline.pipelineCounts(s, n)
    val sec = (System.nanoTime() - t0) / 1e9
    s.sharedState.cacheManager.clearCache()
    (sec, mr, dr)
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.head.split(",").map(_.toLong).toSeq else Seq(2000000L)
    val coreList = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(4, 8, 16, 32)
    for (cores <- coreList) {
      val s = session(cores)
      run(s, 20000L) // warm-up
      for (n <- sizes) {
        val (sec, mr, dr) = run(s, n)
        println(f"PROBE cores=$cores n=$n sec=$sec%.2f match=$mr dev=$dr rows_per_sec=${(mr + dr) / sec}%.0f")
      }
      s.stop()
    }
  }
}
