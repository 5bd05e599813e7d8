package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev driver: run q_store_resume at sf0.001 + sf0.01 → /tmp/store_out/<sf>
  * for the DuckDB compare (see .claude/skills/verify). */
object DriveStoreOracle {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val df = graft.SparkEntry.queries("q_store_resume")(spark, s"/root/testdata/$sf")
      df.repartition(1).write.mode("overwrite").parquet(s"/tmp/store_out/$sf")
      println(s"DRIVE q_store_resume $sf rows=" + spark.read.parquet(s"/tmp/store_out/$sf").count())
    }
    spark.stop()
  }
}
