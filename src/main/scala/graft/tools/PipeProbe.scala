package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/**
 * Round-6 pipeline decomposition probe: runs the EXACT bench pipeline action
 * (BenchPipeline.pipelineCounts — same config, same fused count) under a
 * stage listener, printing per-stage wall/run/shuffle, then times phase
 * isolations through the noop sink (guide §1.4). Mirrors the bench pipeline
 * session config (AQE off, 4 parts/core, uncompressed cache).
 *
 * Usage: runMain graft.tools.PipeProbe [cores] [nSites] [reps]
 */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 8
    val n = if (args.length > 1) args(1).toLong else 2500000L
    val reps = if (args.length > 2) args(2).toInt else 2

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-pipeprobe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo; val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((si.stageId, si.name.takeWhile(_ != '\n'), wall,
            m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten))
        }
      }
    })

    // warm-up (codegen/JIT at a different literal size like the bench note says,
    // then the measured size once)
    graft.engine.BenchPipeline.pipelineCounts(spark, n)
    spark.sharedState.cacheManager.clearCache()
    System.gc()

    for (r <- 1 to reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val (m, d) = graft.engine.BenchPipeline.pipelineCounts(spark, n)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PIPE cores=$cores n=$n rep=$r sec=$sec%.2f match=$m dev=$d")
      if (r == reps) stages.synchronized(stages.sortBy(_._1).foreach { case (id, nm, w, rt, sr, sw) =>
        println(f"PSTAGE id=$id%3d wall=$w%7dms run=$rt%8dms shR=${sr / 1048576}%6dM shW=${sw / 1048576}%6dM  ${nm.take(70)}")
      })
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
