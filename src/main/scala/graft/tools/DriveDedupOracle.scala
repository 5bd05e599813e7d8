package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev driver for the portable-hash dedup/fingerprint oracle entries: runs
  * each on args(0) (default sf0.001), writes parquet to
  * /tmp/dedup_oracle_out/<name> — DuckDB cross-check runs driver-side.
  */
object DriveDedupOracle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.QueriesDedupOracle.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.repartition(1).write.mode("overwrite").parquet(s"/tmp/dedup_oracle_out/$name")
      val n = spark.read.parquet(s"/tmp/dedup_oracle_out/$name").count()
      println(s"DRIVE $name rows=$n")
    }
    spark.stop()
  }
}
