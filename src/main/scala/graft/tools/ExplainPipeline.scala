package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainPipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pages = graft.sources.Pages.synthesize(spark, 200000L)
    val m = graft.engine.BenchPipeline.matchRows(pages)
    val all = graft.engine.DeviationView.deviations(m, graft.engine.DeviationView.DeviationConfig(
      1L, 1L, "x", graft.engine.BenchPipeline.titles,
      graft.engine.DeviationView.CustomFilter(lit(true))))
    all.agg(count(lit(1))).collect()
    val p = all.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println("EXCHANGES=" + "Exchange".r.findAllIn(p).length)
    println("BROADCASTS=" + "BroadcastExchange".r.findAllIn(p).length)
    println("SORTS=" + "\\bSort\\b".r.findAllIn(p).length)
    p.split("\n").filter(l => l.contains("Exchange") || l.contains("Join") || l.contains("Window") || l.contains("Aggregate")).take(40).foreach(println)
    spark.stop()
  }
}
