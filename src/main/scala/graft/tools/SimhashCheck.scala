package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev driver: row counts of the dedup gate queries at sf0.01 — used to
  * confirm blocking-scheme changes keep the gate output stable (r2 baseline:
  * simhash 71 pairs, minhash 80 pairs; pipeline = 1 row per corpus doc). */
object SimhashCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]").appName("simcheck")
      .config("spark.sql.shuffle.partitions", "16").config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    for (q <- Seq("q_dedup_simhash", "q_dedup_minhash", "q_dedup_pipeline"))
      println(s"$q rows=" + graft.SparkEntry.queries(q)(s, dir).count())
    s.stop()
  }
}
