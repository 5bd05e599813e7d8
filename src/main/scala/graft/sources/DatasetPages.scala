package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Deterministic pages synthesis carrying PER-DATASET feature rows for all 20
 * reference views (same text grammar as Pages.synthesize, FIXTURES.md §1), so
 * the driver gate exercises every ported dataset pipeline end-to-end:
 * pages -> extract -> per-dataset match -> deviations (rows-only checks; the
 * xxhash-seeded synthesis has no DuckDB-expressible oracle).
 *
 * Layout: every dataset gets `n` upstream items hash-placed in its home
 * municipality box; ~60% of items get a companion OSM element ≤3 m away with
 * the view's MINIMAL qualifying tags — so each view emits a mix of "missing"
 * and "missing tags" deviations.
 */
object DatasetPages {

  // Gävle-ish and Uppsala-ish boxes (match Pages MUNI fixtures)
  private val G = (560000.0, 6700000.0, 640000.0, 6760000.0)
  private val U = (300000.0, 6560000.0, 360000.0, 6620000.0)

  /** per-dataset: (datasetId, attrs format (with %d = site), osm tags format,
    * home box). Formats must be space-free ONLY in the first 5 tokens of the
    * page text — the attrs/tags tail may contain spaces (split limit 6). */
  final case class Ds(
      id: Long,
      attrs: String,
      osmTags: String,
      box: (Double, Double, Double, Double) = G)

  val specs: Seq[Ds] = Seq(
    Ds(5, """{"SLAKTE":"Acer"}""", """{"natural":"tree"}"""),
    Ds(8, """{"TYP":"Livräddningsboj"}""", """{"emergency":"life_ring"}"""),
    Ds(110, """{"Firmabenämning":"FÖRSKOLA %d","Företagsnamn":"BOLAG %d AB"}""",
      """{"amenity":"kindergarten"}"""),
    Ds(109, """{"Status":"Aktiv","SkolaNamn":"Skola %d","Skolenhetskod":"%d","Huvudman":{"Namn":"Gävle kommun","Typ":"Kommun"},"Besoksadress":{"Adress":"Vägen %d","Ort":"Gävle","Postnr":"80320"},"Kommun":{"Kommunkod":"2180"},"Webbadress":"https://skola.sv/%d","Telefon":"026-61234","Epost":"ab@cd.se"}""",
      """{"amenity":"school"}"""),
    Ds(462, """{"ARENDESTATUS":"4","STATUS":"Uppfört","VERKID":"V%d","MAXEFFEKT":"2,0","NAVHOJD":"100","ROTDIAMETE":"90","TOTALHOJD":"150","UPPFORT":"20150601","FABRIKAT":"Vestas","ORGNAMN":"Org %d","MODELL":"X1"}""",
      """{"power":"generator","generator:method":"wind_turbine"}"""),
    Ds(4, """{"NAMN":"Bad %d","URL":"https://x.sv/%d","BESKR_KORT":"Fin badplats.","GATUADRESS":"Strandvägen %d, Gävle"}""",
      """{"leisure":"bathing_place"}"""),
    Ds(17, """{"KATEGORI":"ÅTERVINNINGSSTATION","GATUADRESS":"Gata %d, Gävle","BESKR_KORT":"Återvinningsstation för:  Glas  Ansvarig för stationen är FTI."}""",
      """{"recycling_type":"container"}"""),
    Ds(31, "{}", """{"amenity":"waste_basket"}"""),
    Ds(33, """{"name":"A%d"}""", """{"amenity":"vending_machine","vending":"parking_tickets"}"""),
    Ds(11, "{}", """{"amenity":"bicycle_repair_station"}"""),
    Ds(7, """{"PRODTYP":"Bänk"}""", """{"amenity":"bench"}"""),
    Ds(21, """{"ANTPLATSER":"10"}""", """{"amenity":"bicycle_parking"}"""),
    Ds(27, """{"NAMN":"Skylt %d"}""", """{"information":"sign"}"""),
    Ds(18, """{"HPLNAMN":"Gävle Hållplats %d","HPLNR":"%d","LAGE":"A","KUR":"J"}""",
      """{"highway":"bus_stop"}"""),
    Ds(466, """{"Kommentar":"Ved finns."}""", """{"amenity":"bbq"}""", U),
    Ds(139, """{"andamal":"Bollplan"}""", """{"leisure":"pitch"}"""),
    Ds(143, """{"objekttyp":"Mast"}""", """{"man_made":"mast"}"""),
    Ds(149, "{}", """{"power":"substation"}"""),
    Ds(146, "{}", """{"power":"substation"}"""),
    Ds(140, """{"andamal":"Golfbana"}""", """{"leisure":"golf_course"}"""))

  private def u01(id: Column, seed: Long, tag: Int): Column =
    (pmod(xxhash64(lit(seed), id, lit(tag)), lit(1L << 48)).cast(DoubleType)) /
      lit((1L << 48).toDouble)

  def synthesize(spark: SparkSession, nPerDataset: Long, seed: Long = 7L): DataFrame = {
    import spark.implicits._
    val legs = specs.map { ds =>
      val sites = spark.range(nPerDataset).toDF("site")
      val id = col("site")
      val (x0, y0, x1, y1) = ds.box
      val x = lit(x0) + u01(id, seed, ds.id.toInt * 100 + 1) * lit(x1 - x0)
      val y = lit(y0) + u01(id, seed, ds.id.toInt * 100 + 2) * lit(y1 - y0)
      val attrs = format_string(ds.attrs.replace("%d", "%1$d"), id)
      val ups = sites
        .withColumn("text", concat_ws(" ",
          lit("UPSTREAM"), lit(ds.id), concat(lit("s"), id),
          format_string("%.3f", x), format_string("%.3f", y), attrs))
        .withColumn("url",
          format_string(s"https://data.example.sv/ds${ds.id}/item/%d", id))
        .select("url", "text")
      val osm = sites
        .filter(u01(id, seed, ds.id.toInt * 100 + 3) < 0.6)
        .withColumn("oid", lit(2000000000L) + lit(ds.id) * 10000000L + id)
        .withColumn("text", concat_ws(" ",
          lit("OSM"), lit("n"), col("oid"),
          format_string("%.3f", x + lit(2.0)), format_string("%.3f", y),
          lit(ds.osmTags)))
        .withColumn("url", format_string("https://osm.example.sv/el/%d", col("oid")))
        .select("url", "text")
      ups.unionByName(osm)
    }
    val munis = Seq(
      ("2180", "Gävle", s"POLYGON((${G._1} ${G._2},${G._3} ${G._2},${G._3} ${G._4},${G._1} ${G._4},${G._1} ${G._2}))"),
      ("0380", "Uppsala", s"POLYGON((${U._1} ${U._2},${U._3} ${U._2},${U._3} ${U._4},${U._1} ${U._4},${U._1} ${U._2}))"))
      .toDF("code", "mname", "wkt")
      .withColumn("text", concat_ws(" ", lit("MUNI"), col("code"),
        regexp_replace(col("mname"), " ", "_"), col("wkt")))
      .withColumn("url", concat(lit("https://geo.example.sv/muni/"), col("code")))
      .select("url", "text")

    val all = legs.reduce(_ unionByName _).unionByName(munis)
    all.select(
      col("url"),
      to_timestamp(lit("2026-01-01 00:00:00")).as("warc_ts"),
      encode(concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>")), "utf-8").as("html"),
      col("text"),
      lit("sv").as("lang"))
  }
}
