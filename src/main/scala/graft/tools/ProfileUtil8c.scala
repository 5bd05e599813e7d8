package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Scratch profiler: one warmed pipeline run with a sampler recording busy
  * executor-thread counts every 500 ms; during under-utilized samples
  * (busy <= 1) it records what the driver main thread and the lone busy
  * executor are doing — locates the serial floor that caps 2->8 scaling. */
object ProfileUtil8c {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val n = if (args.length > 1) args(1).toLong else 2500000L
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.engine.BenchPipeline.pipelineCounts(spark, n) // warm
    spark.sharedState.cacheManager.clearCache()

    val hist = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val slowFrames = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stop = false
    val sampler = new Thread(() => {
      while (!stop) {
        val all = Thread.getAllStackTraces.asScala
        val exec = all.filter(_._1.getName.startsWith("Executor task launch"))
        val busy = exec.count(_._1.getState == Thread.State.RUNNABLE)
        hist.add(busy)
        if (busy <= 1) {
          def top(frames: Array[StackTraceElement], who: String): Unit = {
            val f = frames.filter(e =>
              e.getClassName.startsWith("graft") ||
              e.getClassName.startsWith("org.apache.spark")).take(3)
            if (f.nonEmpty) slowFrames.add(who + " | " + f.mkString(" <- "))
          }
          all.find(_._1.getName == "main").foreach(t => top(t._2, "driver"))
          exec.filter(_._1.getState == Thread.State.RUNNABLE)
            .foreach(t => top(t._2, "exec"))
        }
        Thread.sleep(500)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    graft.engine.BenchPipeline.pipelineCounts(spark, n)
    val sec = (System.nanoTime() - t0) / 1e9
    stop = true
    Thread.sleep(600)
    val samples = hist.toArray.map(_.asInstanceOf[Int])
    val counts = samples.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k:${v.length}" }.mkString(" ")
    println(f"PROFILE cores=$cores n=$n sec=$sec%.2f busy-histogram(500ms)=[$counts] mean=${samples.sum.toDouble / samples.length}%.2f")
    slowFrames.asScala.groupBy(identity).toSeq.sortBy(-_._2.size).take(12)
      .foreach { case (f, g) => println(s"SLOW ${g.size}x $f") }
    spark.stop()
  }
}
