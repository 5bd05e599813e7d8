package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/**
 * Round-6 measurement harness (guide §1.4): times each headline gate query
 * through the NOOP sink (computes every column of every row, no collection
 * cost), min-of-N trials, and dumps `.explain("formatted")` per query to
 * plans/r06/. A stage listener attributes time inside each query: per stage
 * executor run time, shuffle read/write bytes, and record counts — the
 * sandbox stand-in for the Spark UI stage table (UI is disabled in bench
 * sessions).
 *
 * This is a SEPARATE main from graft.Bench (which is frozen for
 * measurement): nothing here changes what the driver times.
 *
 * Usage: runMain graft.tools.BenchExtra [sfDir] [cpus] [trials] [planTag] [only]
 */
object BenchExtra {

  final case class StageRow(id: Int, name: String, wallMs: Long, runMs: Long,
                            shRead: Long, shWrite: Long, recs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val trials = if (args.length > 2) args(2).toInt else 3
    val planTag = if (args.length > 3) args(3) else ""
    val only: Set[String] =
      if (args.length > 4) args(4).split(",").toSet else Set.empty

    val headline = Seq(
      "q1_agg", "q2_join", "q3_topk_per_group", "q6_filter", "q9_events_hourly",
      "q_sp_dwithin", "q_sp_bestmatch", "q_sp_knn", "q_sp_tile",
      "q_txt_quality", "q_dedup_exact", "q_emb_topk")
      .filter(n => only.isEmpty || only.contains(n))

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", cpus.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'), wall,
            m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.inputMetrics.recordsRead)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: codegen/JIT like graft.Bench does
    graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()

    val planDir = java.nio.file.Paths.get("plans/r06")
    java.nio.file.Files.createDirectories(planDir)

    headline.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      if (planTag.nonEmpty) {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(planDir.resolve(s"${name}_$planTag.txt"), plan)
      }
      val times = (1 to trials).map { i =>
        stages.synchronized(stages.clear())
        spark.sparkContext.setJobDescription(s"$name trial $i")
        val t0 = System.nanoTime()
        noop(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        if (i == trials) { // print the stage table of the warmest trial
          val rows = stages.synchronized(stages.sortBy(_.id).toVector)
          rows.foreach { r =>
            println(f"STAGE $name%-18s id=${r.id}%3d wall=${r.wallMs}%6dms run=${r.runMs}%7dms shR=${r.shRead / 1024}%8dK shW=${r.shWrite / 1024}%8dK recs=${r.recs}%10d ${r.name.take(60)}")
          }
        }
        sec
      }
      println(f"QUERY $name%-18s min=${times.min}%7.3f s  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
