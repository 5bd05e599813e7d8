package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev driver for the embedding/similarity oracle gate entries (plus
  * q_mm_decode): runs each on args(0) (default sf0.001), writes parquet to
  * /tmp/emb_oracle_out/<name> — the DuckDB cross-check runs driver-side
  * (see verify skill).
  */
object DriveEmbOracle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (graft.QueriesEmbOracle.queries ++
      graft.QueriesText.queries.view.filterKeys(_ == "q_mm_decode").toMap)
      .foreach { case (name, fn) =>
        val df = fn(spark, sfDir)
        df.repartition(1).write.mode("overwrite").parquet(s"/tmp/emb_oracle_out/$name")
        val n = spark.read.parquet(s"/tmp/emb_oracle_out/$name").count()
        println(s"DRIVE $name rows=$n")
      }
    spark.stop()
  }
}
