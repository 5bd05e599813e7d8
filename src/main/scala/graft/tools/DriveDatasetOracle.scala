package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev driver for the oracled dataset-view gate entries: runs
  * q_ds_trees_oracle on args(0) (default sf0.001), writes parquet to
  * /tmp/ds_oracle_out/<name> and prints row count + sample — the DuckDB
  * cross-check then runs driver-side (see verify skill).
  */
object DriveDatasetOracle {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (graft.QueriesDatasetOracle.queries ++ graft.QueriesSchoolsOracle.queries ++
      graft.QueriesAtervinningOracle.queries ++ graft.QueriesGavleOracle.queries ++
      graft.QueriesMoreViewsOracle.queries ++ graft.QueriesTopo50Oracle.queries)
      .foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      df.repartition(1).write.mode("overwrite").parquet(s"/tmp/ds_oracle_out/$name")
      val n = spark.read.parquet(s"/tmp/ds_oracle_out/$name").count()
      println(s"DRIVE $name rows=$n")
      spark.read.parquet(s"/tmp/ds_oracle_out/$name")
        .orderBy("item_id").show(8, truncate = false)
    }
    spark.stop()
  }
}
