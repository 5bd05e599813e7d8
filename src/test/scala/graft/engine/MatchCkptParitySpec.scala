package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.tags.Tags
import graft.functions.GeoFunctions

/** r6: MatchConfig.checkpointCandidates (eager narrow localCheckpoint of
  * the refined candidate set — one cell-join execution for both legs) must
  * produce exactly the rows of the default two-pass plan. Env-gated probe
  * switch, default off; this pins the equivalence for when it is flipped. */
class MatchCkptParitySpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private val spec = Tags.MatchSpec(Some("name"), Nil, dOther = 50.0, dName = 250.0)

  private def fixture() = {
    val rnd = new scala.util.Random(13)
    val osm = (1L to 400L).map { i =>
      val x = rnd.nextDouble() * 20000; val y = rnd.nextDouble() * 20000
      ("n", i, Map("amenity" -> "bench_poi", "name" -> s"poi${i % 37}"), x, y)
    }.toDF("type", "id", "tags", "cx", "cy")
      .withColumn("geom", GeoFunctions.stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
    val ups = (1L to 300L).map { i =>
      val x = rnd.nextDouble() * 20000; val y = rnd.nextDouble() * 20000
      (Seq(i + 1000000L), Map("amenity" -> "bench_poi", "name" -> s"poi${i % 37}"), x, y)
    }.toDF("ids", "tags", "cx", "cy")
      .withColumn("geometry", GeoFunctions.stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
    (osm, ups)
  }

  private def rows(ckpt: Boolean): Set[String] = {
    val (osm, ups) = fixture()
    val cfg = MatchEngine.MatchConfig(matchSpec = spec, cellSize = spec.maxDistance,
      antiLeg = true, checkpointCandidates = ckpt)
    MatchEngine.matchView(osm, ups, cfg)
      .select(
        concat_ws("|",
          to_json(col("upstream_item_ids")),
          to_json(col("upstream_tags")),
          coalesce(hex(col("upstream_geom")), lit("-")),
          coalesce(col("osm_element_id").cast("string"), lit("-")),
          coalesce(col("osm_element_type"), lit("-")),
          coalesce(to_json(col("osm_tags")), lit("-")),
          coalesce(hex(col("osm_geom")), lit("-")),
          coalesce(format_number(col("dist"), 9), lit("-"))))
      .as[String].collect().toSet
  }

  test("checkpointCandidates=true matches the default two-pass plan row for row") {
    val base = rows(ckpt = false)
    val ck = rows(ckpt = true)
    assert(base.nonEmpty && base.exists(_.contains("|-|-")),
      "fixture must exercise both legs (matches and anti rows)")
    assert(ck == base,
      s"missing=${(base -- ck).take(3)} extra=${(ck -- base).take(3)}")
  }
}
