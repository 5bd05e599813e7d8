package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import graft.engine.SparkTestBase

/**
 * Bucketed-table co-located join (SpatialLayout.writeBucketedPoints /
 * bucketedDWithin): the dwithin join over two tables bucketed on the grid
 * cell must plan with ZERO Exchange — the shuffle happened once, at write
 * time — and stay differentially exact vs the ad-hoc cell join.
 */
class BucketedJoinSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private val d = 800.0

  private def probePts(n: Int): DataFrame =
    spark.range(n).select(col("id").as("p_id"),
      pmod(col("id") * 48271L, lit(100000L)).cast("double").as("p_x"),
      pmod(col("id") * 69621L, lit(100000L)).cast("double").as("p_y"))

  private def buildPts(n: Int): DataFrame =
    spark.range(n).select(col("id").as("b_id"),
      pmod(col("id") * 94261L, lit(100000L)).cast("double").as("b_x"),
      pmod(col("id") * 57301L, lit(100000L)).cast("double").as("b_y"))

  private def rmTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val stream = java.nio.file.Files.walk(root)
      try stream.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
      finally stream.close()
    }
  }

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  /** All Exchange nodes in the executed plan, descending INTO AQE query
    * stages (ShuffleQueryStageExec / ResultQueryStageExec are leaves whose
    * wrapped plan `collect` never visits — a naive collect undercounts). */
  private def exchangeNodes(p: SparkPlan): Seq[String] = {
    val self = p match {
      case e: Exchange => Seq(e.nodeName)
      case _: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq("ReusedExchange")
      case _ => Nil
    }
    val below = p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => exchangeNodes(q.plan)
      case _ => p.children.flatMap(exchangeNodes)
    }
    self ++ below
  }

  /** write both sides, run `body`, always drop tables + files */
  private def withBucketedTables[T](numBuckets: Int)(body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    try {
      SpatialLayout.writeBucketedPoints(probePts(3000), "p_x", "p_y",
        cellSize = d, radius = d, "bjs_probe", s"$dir/p", numBuckets)
      SpatialLayout.writeBucketedPoints(buildPts(1500), "b_x", "b_y",
        cellSize = d, radius = 0.0, "bjs_build", s"$dir/b", numBuckets)
      body
    } finally {
      spark.sql("DROP TABLE IF EXISTS bjs_probe")
      spark.sql("DROP TABLE IF EXISTS bjs_build")
      rmTree(dir)
    }
  }

  test("bucketed dwithin join plans with zero Exchange (no shuffle, no broadcast)") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withBucketedTables(numBuckets = 8) {
      val joined = SpatialLayout.bucketedDWithin(
        spark, "bjs_probe", "bjs_build", "p_x", "p_y", "b_x", "b_y", d)
      val plan = executed(joined)
      val exchanges = exchangeNodes(plan)
      assert(exchanges.isEmpty,
        s"bucketed join must not shuffle or broadcast, found: $exchanges")
      assert(joined.count() > 0, "fixture join must be non-trivial")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucketed join result == brute-force dwithin pairs (differential)") {
    withBucketedTables(numBuckets = 8) {
      val got = SpatialLayout.bucketedDWithin(
          spark, "bjs_probe", "bjs_build", "p_x", "p_y", "b_x", "b_y", d)
        .select("p_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      val want = probePts(3000).crossJoin(buildPts(1500))
        .filter(sqrt(pow(col("p_x") - col("b_x"), 2) + pow(col("p_y") - col("b_y"), 2)) <= d)
        .select("p_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(want.nonEmpty, "fixture must produce pairs")
      assert(got == want)
    }
  }

  test("one file per bucket: the pre-write repartition aligns with the bucket hash") {
    withBucketedTables(numBuckets = 8) {
      // each write task holds exactly one bucket's rows, so each non-empty
      // bucket is a single file — the precondition for sorted-bucket reads
      for (t <- Seq("bjs_probe", "bjs_build")) {
        val loc = spark.sql(s"DESCRIBE TABLE EXTENDED $t").filter(col("col_name") === "Location")
          .select("data_type").as[String].head()
        val files = new java.io.File(loc.stripPrefix("file:"))
          .listFiles().count(f => f.getName.endsWith(".parquet"))
        assert(files <= 8, s"$t: expected at most one file per bucket, got $files")
        assert(files > 0, s"$t: table must have data files")
      }
    }
  }

  test("batch-vs-store join shuffles ONLY the batch side (one Exchange) and is exact") {
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try withBucketedTables(numBuckets = 8) {
      val batch = probePts(500)
      val joined = SpatialLayout.bucketedDWithinBatch(
        batch, "bjs_build", "p_x", "p_y", "b_x", "b_y", cellSize = d, distance = d)
      val plan = executed(joined)
      val exchanges = exchangeNodes(plan)
      assert(exchanges.size == 1,
        s"expected exactly one Exchange (the batch side), found ${exchanges.size}: " +
          exchanges.mkString(", "))
      val got = joined.select("p_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      val want = batch.crossJoin(buildPts(1500))
        .filter(sqrt(pow(col("p_x") - col("b_x"), 2) + pow(col("p_y") - col("b_y"), 2)) <= d)
        .select("p_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(want.nonEmpty && got == want)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("writeBucketedPoints rejects radius > cellSize and pre-existing cell column") {
    val dir = java.nio.file.Files.createTempDirectory("bucketed").toString
    try {
      intercept[IllegalArgumentException] {
        SpatialLayout.writeBucketedPoints(probePts(10), "p_x", "p_y",
          cellSize = 100.0, radius = 200.0, "bjs_bad", s"$dir/bad")
      }
      intercept[IllegalArgumentException] {
        SpatialLayout.writeBucketedPoints(
          probePts(10).withColumn("cell", lit(1L)), "p_x", "p_y",
          cellSize = 100.0, radius = 0.0, "bjs_bad", s"$dir/bad")
      }
    } finally rmTree(dir)
  }
}
