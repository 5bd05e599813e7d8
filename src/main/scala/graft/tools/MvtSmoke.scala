package graft.tools
import org.apache.spark.sql.SparkSession
object MvtSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_pipe_mvt")(spark, "/root/testdata/sf0.001")
    df.show(5)
    println("MVT SMOKE rows=" + df.count())
    spark.stop()
  }
}
