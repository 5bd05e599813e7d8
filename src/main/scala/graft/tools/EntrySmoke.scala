package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println(s"ENTRY_ROWS=${graft.SparkEntry.entry(s).count()}")
    s.stop()
  }
}
