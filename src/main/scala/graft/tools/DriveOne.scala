package graft.tools

import org.apache.spark.sql.SparkSession

/** Run a single gate query to parquet + dump its oracle SQL — the fast path
  * for iterating on one `SparkEntry.queries` entry without a full Verify run.
  * Usage: runMain graft.tools.DriveOne <name> [sfDir] [outDir]
  */
object DriveOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 2) args(2) else "/tmp/drive_one"
    val spark = SparkSession.builder()
      .appName(s"drive-one-$name").master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown gate query: $name"))
    fn(spark, sfDir).repartition(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      val j = s"""{"$name": ${graft.core.Json.quote(sql)}}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        j.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    println(s"WROTE $outDir/$name")
    spark.stop()
  }
}
