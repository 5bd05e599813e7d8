package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/**
 * r6 serial-floor decomposition: the 2c/8c scaling fit reads a ~10 s
 * core-count-independent floor per pipeline run (C/N + F with F ≈ 10 s).
 * This probe times, inside one pipelineCounts action, what the stage/task
 * timeline CANNOT parallelize: action-start -> first job submitted (driver
 * analysis/optimization/physical planning), inter-job gaps (the eager
 * cache-fill count vs the main collect), and per-stage submission->first-
 * task-launch gaps (scheduling). Usage: runMain graft.tools.FloorProbe
 * [cores] [nSites] [reps]
 */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val cores = if (args.length > 0) args(0).toInt else 32
    val n = if (args.length > 1) args(1).toLong else 2500000L
    val reps = if (args.length > 2) args(2).toInt else 2

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-floorprobe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (jobId, submitted, ended, #stages)
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
    val jobStart = mutable.Map.empty[Int, (Long, Int)]
    val stageFirstLaunch = mutable.Map.empty[Int, Long]
    val stageSubmit = mutable.Map.empty[Int, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobStart(e.jobId) = (e.time, e.stageIds.length) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobStart.remove(e.jobId).foreach { case (t0, ns) =>
          jobs += ((e.jobId, t0, e.time, ns))
        }
      }
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        jobs.synchronized {
          stageSubmit(e.stageInfo.stageId) = System.currentTimeMillis()
        }
      override def onTaskStart(e: SparkListenerTaskStart): Unit =
        jobs.synchronized {
          if (!stageFirstLaunch.contains(e.stageId))
            stageFirstLaunch(e.stageId) = e.taskInfo.launchTime
        }
    })

    graft.engine.BenchPipeline.pipelineCounts(spark, n) // warm-up
    spark.sharedState.cacheManager.clearCache()
    System.gc()

    for (r <- 1 to reps) {
      jobs.synchronized { jobs.clear(); stageFirstLaunch.clear(); stageSubmit.clear() }
      val t0 = System.currentTimeMillis()
      val (m, d) = graft.engine.BenchPipeline.pipelineCounts(spark, n)
      val t1 = System.currentTimeMillis()
      jobs.synchronized {
        val js = jobs.sortBy(_._2).toVector
        val planLead = if (js.nonEmpty) js.head._2 - t0 else -1
        // gap between consecutive jobs = driver-only time between actions
        val gaps = js.sliding(2).collect {
          case Vector(a, b) => b._2 - a._3
        }.toVector
        val postLast = if (js.nonEmpty) t1 - js.last._3 else -1
        println(f"FLOOR cores=$cores rep=$r wall=${(t1 - t0) / 1000.0}%.2fs " +
          f"m=$m d=$d planLead=${planLead}ms jobGaps=${gaps.mkString("+")}ms " +
          f"postLast=${postLast}ms jobs=${js.map(j => f"j${j._1}:${(j._3 - j._2)}ms/${j._4}st").mkString(",")}")
        val schedGaps = stageSubmit.toVector.sortBy(_._1).map { case (sid, sub) =>
          sid -> (stageFirstLaunch.getOrElse(sid, sub) - sub)
        }
        println(s"FLOOR stage submit->firstTask gaps ms: " +
          schedGaps.map { case (s, g) => s"$s:$g" }.mkString(" "))
      }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
