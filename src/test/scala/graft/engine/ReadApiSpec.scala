package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.Geom

/** S10 read-API surface (VERDICT r2 #6): region_name, the
  * municipality_layer / municipality_dataset progress dims, and the
  * osm_geom / upstream_item deviation lookups
  * (08-api-base.sql:35-39,47-63; 09-api-deviation.sql:46-56). */
class ReadApiSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("region_name: LEFT(code,2) lookup into the 21-row region dim") {
    val munis = Seq(
      ("2180", "Gävle"), ("0180", "Stockholm"), ("1480", "Göteborg"),
      ("9999", "Okänd")).toDF("code", "name")
    val out = ReadApi.withRegionName(munis, ReadApi.regions(spark))
      .select("code", "region_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("2180") == "Gävleborgs län")
    assert(out("0180") == "Stockholms län")
    assert(out("1480") == "Västra Götalands län")
    assert(out("9999") == null, "unassigned region codes resolve to NULL (left join)")
    assert(ReadApi.regionRows.size == 21, "08c-regions.sql seeds exactly 21 rows")
  }

  test("municipality_layer embeds the layer dim (municipality page shape)") {
    val layers = Seq((5L, "Skolor", true), (16L, "Micromapping", false))
      .toDF("id", "name", "is_major")
    val ml = Seq(
      (1L, "2180", 5L, "2024-01-01T00:00:00Z"),
      (2L, "2180", 16L, null))
      .toDF("id", "municipality_code", "layer_id", "last_checked")
    val out = ReadApi.municipalityLayer(ml, layers)
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("layer_name") == "Skolor")
    assert(out(0).getAs[Boolean]("is_major"))
    assert(out(0).getAs[String]("last_checked") == "2024-01-01T00:00:00Z")
    assert(out(1).getAs[String]("layer_name") == "Micromapping")
  }

  test("municipality_dataset embeds dataset + provider dims") {
    val providers = Seq((1L, "SCB"), (2L, "Gävle kommun")).toDF("id", "name")
    val datasets = Seq((110L, "Förskolor", 1L), (5L, "Träd", 2L))
      .toDF("id", "name", "provider_id")
    val md = Seq(
      (1L, "2180", 110L, "advisory", null.asInstanceOf[String]),
      (2L, "2180", 5L, "complete", "https://example.org/projekt"))
      .toDF("id", "municipality_code", "dataset_id", "dataset_type", "project_link")
    val out = ReadApi.municipalityDataset(md, datasets, providers)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("dataset_name") == "Förskolor")
    assert(out(0).getAs[String]("provider_name") == "SCB")
    assert(out(1).getAs[String]("provider_name") == "Gävle kommun")
    assert(out(1).getAs[String]("project_link") == "https://example.org/projekt")
  }

  test("municipality extent: per-row bbox of the muni's own geometry") {
    // 08-api-base.sql:29-34 — ST_Extent($1.geom) over ONE row, not an agg
    val tri = Geom.toWkb(Geom.fromWkt("POLYGON ((0 0, 10 0, 5 8, 0 0))"))
    val munis = Seq(("2180", "Gävle", tri)).toDF("code", "name", "geom")
    val r = ReadApi.municipalityExtent(munis).head()
    assert(r.getAs[Double]("min_x") == 0.0 && r.getAs[Double]("min_y") == 0.0)
    assert(r.getAs[Double]("max_x") == 10.0 && r.getAs[Double]("max_y") == 8.0)
    assert(r.getAs[String]("code") == "2180", "input columns pass through")
  }

  test("osm_geom: deviation -> current element geometry, NULL when missing") {
    val g1 = Geom.toWkb(Geom.point(10.0, 20.0))
    val elements = Seq(("n", 7L, g1)).toDF("type", "id", "geom")
    val devs = Seq(
      (1L, "n", java.lang.Long.valueOf(7L)),
      (2L, null.asInstanceOf[String], null.asInstanceOf[java.lang.Long]))
      .toDF("dev_id", "osm_element_type", "osm_element_id")
    val out = ReadApi.osmGeom(devs, elements).orderBy("dev_id").collect()
    assert(java.util.Arrays.equals(out(0).getAs[Array[Byte]]("osm_geom"), g1))
    assert(out(1).getAs[Array[Byte]]("osm_geom") == null)
  }

  test("upstream_item: SETOF items per deviation via ids-array explode") {
    val items = Seq(
      (101L, 5L, """{"SLAKTE":"Acer"}"""),
      (102L, 5L, """{"SLAKTE":"Tilia"}"""),
      (103L, 5L, """{"SLAKTE":"Ulmus"}"""))
      .toDF("id", "dataset_id", "original_attributes")
    val devs = Seq(
      (1L, Seq(101L, 103L)),
      (2L, Seq(102L)),
      (3L, Seq.empty[Long])) // anti-leg deviation: no items
      .toDF("dev_id", "upstream_item_ids")
    val out = ReadApi.upstreamItems(devs, items, "dev_id")
      .orderBy("dev_id", "id").collect()
    assert(out.map(r => (r.getAs[Long]("dev_id"), r.getAs[Long]("id"))).toSeq ==
      Seq((1L, 101L), (1L, 103L), (2L, 102L)))
  }
}
