package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{ElementStore, SparkTestBase}

/** osm.changeset ingest (04-osm-base.sql:43-49) — the last inert source
  * surface: page-grammar synthesis, extraction, and the keyed store MERGE
  * with id-hash block partitioning. */
class ChangesetSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark

  test("changeset pages extract to the reference schema and key-merge") {
    val pages = Pages.synthesizeChangesets(spark, 200L)
    val cs = Pages.extractChangesets(pages)
    assert(cs.columns.toSet == Set("id", "tags", "created_at", "open", "uid", "cx", "cy"))
    assert(cs.count() == 200)
    val row = cs.filter(col("id") === 7L).collect()(0)
    assert(row.getAs[Map[String, String]]("tags")("created_by").startsWith("bench-editor"))
    assert(row.getAs[java.sql.Timestamp]("created_at") != null)
    // determinism: same page text per id across invocations
    val t1 = pages.filter(col("url").endsWith("/7")).select("text").collect()(0).getString(0)
    val t2 = Pages.synthesizeChangesets(spark, 200L).filter(col("url").endsWith("/7"))
      .select("text").collect()(0).getString(0)
    assert(t1 == t2)

    // mixed batch: non-changeset pages are ignored by the extractor
    val mixed = pages.unionByName(Pages.synthesize(spark, 50L))
    assert(Pages.extractChangesets(mixed).count() == 200)

    // keyed MERGE spreads across id-hash blocks and updates in place
    val dir = java.nio.file.Files.createTempDirectory("cs_store").toString
    val es = new ElementStore(spark, dir)
    es.merge("changesets", Seq("id"), cs, recencyCol = Some("created_at"))
    assert(es.read("changesets", None).count() == 200)
    val blocks = es.read("changesets", None).select("cb").distinct().count()
    assert(blocks > 10, s"id-hash partitioning should spread blocks, got $blocks")
    // a later batch closing changeset 7 replaces the row (open -> false)
    val closing = cs.filter(col("id") === 7L)
      .withColumn("open", lit(false))
      .withColumn("created_at", col("created_at") + expr("INTERVAL 1 HOUR"))
    es.merge("changesets", Seq("id"), closing, recencyCol = Some("created_at"))
    val after = es.read("changesets", None)
    assert(after.count() == 200)
    assert(!after.filter(col("id") === 7L).collect()(0).getAs[Boolean]("open"))
  }
}
