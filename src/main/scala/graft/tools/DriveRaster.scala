package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev driver: write the raster gate queries to /tmp/raster_out for DuckDB
  * comparison. Usage: runMain graft.tools.DriveRaster [sfDir] */
object DriveRaster {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-drive-raster").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    for (name <- Seq("q_raster_density", "q_raster_regions", "q_pipe_raster", "q_stream_density", "q_raster_regions_global")) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").parquet(s"/tmp/raster_out/$name")
      println(s"WROTE $name rows=" + spark.read.parquet(s"/tmp/raster_out/$name").count())
    }
    spark.stop()
  }
}
