package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev driver: run the q_pipe_exports gate entry and print its rows. */
object DriveExports {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-drive-exports").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q_pipe_exports")(spark, sfDir).show(truncate = false)
    spark.stop()
  }
}
