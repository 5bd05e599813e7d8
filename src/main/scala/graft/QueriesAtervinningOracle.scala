package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * atervinning_gavle (18-v_deviation_atervinning_gavle.sql) behind the DuckDB
 * oracle — the SIXTH fully-oracled dataset view, covering the three reference
 * quirks no other oracle reaches:
 *
 *  - the 2-REF match overload on (addr:street, addr:housenumber) — condition
 *    checks both by multi-value overlap, SCORE compares the second ref by
 *    plain equality (03a-match.sql:58); fixture k%10==5 matches only via the
 *    2-ref tier at 700 m, k%10==6 has the same street but housenumber+1 so
 *    NOTHING fires and the item turns "missing" while the OSM node joins the
 *    anti leg;
 *  - the UNSCOPED anti leg (18:52: the main leg equi-joins recycling_type,
 *    the possibly-closed leg does NOT): k%10==7 plants an OSM node of the
 *    WRONG recycling_type 100 m away — the main leg never sees it (item goes
 *    "missing") but the anti leg DOES, so no "possibly closed" row appears.
 *    A scoped anti would emit one; the oracle asserts the quirk by absence;
 *  - `note` carried through the match into the deviation (STRING_AGG of the
 *    stripped BESKR_KORT fractions, '' on the anti leg): station pairs
 *    (k%8==1) group-collapse by (GATUADRESS, geometry) into ids [k, k+5e6]
 *    with the sorted ", "-joined fraction list in the note.
 *
 * OSM nodes live inside the single '2180' municipality rectangle (x <=
 * 820000.5); upstream items are NOT municipality-gated in this view, so
 * items whose node is pushed past the boundary (k%10==8) go "missing" with
 * no anti row.
 */
object QueriesAtervinningOracle {

  private def kMod(n: Long) = pmod(col("k"), lit(n))

  private def aBase(s: SparkSession, dir: String): DataFrame = {
    val m5 = kMod(5)
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("typ", when(kMod(2) === 0, "centre").otherwise("container"))
      .withColumn("street", when(m5 === 0, "Storgatan").when(m5 === 1, "Industrivägen")
        .when(m5 === 2, "Hamngatan").when(m5 === 3, "Norra Kungsgatan")
        .otherwise("Fältvägen"))
      .withColumn("hnn", (kMod(97) + 1).cast("long"))
      .withColumn("hn", col("hnn").cast("string"))
      .withColumn("city", when(m5 =!= 2, "Gävle"))
      .withColumn("gatuadress", concat(col("street"), lit(" "), col("hn"),
        when(m5 =!= 2, lit(", Gävle")).otherwise(lit(""))))
      .withColumn("cname", concat(lit("Återvinningscentral "), kMod(9)))
      .withColumn("fraction", when(kMod(4) === 0, "Glas").when(kMod(4) === 1, "Metall")
        .when(kMod(4) === 2, "Papper").otherwise("Plast"))
  }

  /** one upstream item; `unitB` = second station unit of a k%8==1 pair
    * (same GATUADRESS + geometry -> group-collapsed, fraction 'Tidningar') */
  private def aItem(b: DataFrame, unitB: Boolean): DataFrame = {
    val id = if (unitB) col("k") + 5000000L else col("k")
    val fraction = if (unitB) lit("Tidningar") else col("fraction")
    val src = if (unitB) b.filter(kMod(8) === 1) else b
    src.select(id.as("id"), lit(17L).as("dataset_id"),
      to_json(struct(
        when(col("typ") === "centre", "ÅTERVINNINGSCENTRAL")
          .otherwise("ÅTERVINNINGSSTATION").as("KATEGORI"),
        when(col("typ") === "centre", col("cname")).as("NAMN"),
        col("gatuadress").as("GATUADRESS"),
        concat(lit("Återvinningsstation för:  "), fraction,
          lit("  Ansvarig för stationen är FTI.")).as("BESKR_KORT")))
        .as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))
  }

  private def aItems(b: DataFrame): DataFrame =
    aItem(b, unitB = false).unionByName(aItem(b, unitB = true))

  /** OSM recycling by k%10 — 0: none; {1,9}: tiny; 2: 200 m (dOther);
    * 3: 300 m lowercase street (name tier); 4: 300 m wrong street (missing
    * + anti); 5: 700 m street+housenumber (2-ref tier); 6: 700 m street but
    * housenumber+1 (score-quirk tier CANNOT fire -> missing + anti);
    * 7: 100 m with FLIPPED recycling_type (main leg blind, anti leg sees it
    * -> missing, NO anti row); 8: pushed outside the municipality. */
  private def aOsm(b: DataFrame): DataFrame = {
    val m10 = kMod(10); val m7 = kMod(7); val m11 = kMod(11)
    val dx = when(m10 === 1 || m10 === 9, kMod(4))
      .when(m10 === 2, 200L).when(m10 === 3, 300L).when(m10 === 4, 300L)
      .when(m10 === 5, 700L).when(m10 === 6, 700L).when(m10 === 7, 100L)
      .when(m10 === 8, lit(820001L) + kMod(100) - col("ux").cast("long"))
    val dy = when(m10 === 1 || m10 === 9, kMod(3)).otherwise(0L)
    val ostreet = when(m10 === 3, lower(col("street")))
      .when(m10 === 5 || m10 === 6, col("street"))
      .when(m10 === 4, "Annan Gata")
      .otherwise(when(m7 === 0, col("street")).when(m7 === 1, "Annan Gata"))
    val ohn = when(m10 === 5, col("hn"))
      .when(m10 === 6, (col("hnn") + 1).cast("string"))
    val otyp = when(m10 === 7,
        when(col("typ") === "centre", "container").otherwise("centre"))
      .otherwise(col("typ"))
    val oname = when(m11 === 0, col("cname")).when(m11 === 1, "Fel ÅVC")
    b.filter(m10 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map_filter(map(
          lit("amenity"), lit("recycling"),
          lit("recycling_type"), otyp,
          lit("addr:street"), ostreet,
          lit("addr:housenumber"), ohn,
          lit("name"), oname),
          (_, v) => v.isNotNull).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private val diffKeys = Seq(
    "addr:city", "addr:housenumber", "addr:street", "amenity", "name",
    "recycling_type")

  private def aDiffStr(m: org.apache.spark.sql.Column) =
    concat_ws(";", diffKeys.map(key =>
      when(map_contains_key(m, lit(key)), concat(lit(key + "="), m(key)))): _*)

  /** single municipality: a rectangle cutting off x > 820000.5 */
  private def muni2180(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("2180", -0.5, -0.5)).toDF("code", "x0", "y0")
      .withColumn("geom", stEnvelopeWkb(col("x0"), col("y0"),
        lit(820000.5), lit(1000000.5)))
      .select("code", "geom")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ds_atervinning_oracle" -> ((s, dir) => {
      val b = aBase(s, dir)
      val dev = graft.engine.ReferenceDatasetsGavle.atervinningDeviations(
        graft.engine.ReferenceDatasetsGavle.atervinningMatch(
          aOsm(b), aItems(b), muni2180(s)))
      dev.select(
        get(col("upstream_item_ids"), lit(0)).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"), col("note"),
        aDiffStr(col("suggested_tags")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }))

  val oracle: Map[String, String] = Map(
    "q_ds_atervinning_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE WHEN o_orderkey%2=0 THEN 'centre' ELSE 'container' END AS typ,
        |    CASE o_orderkey%5 WHEN 0 THEN 'Storgatan' WHEN 1 THEN 'Industrivägen'
        |      WHEN 2 THEN 'Hamngatan' WHEN 3 THEN 'Norra Kungsgatan'
        |      ELSE 'Fältvägen' END AS street,
        |    o_orderkey%97 + 1 AS hnn,
        |    CAST(o_orderkey%97 + 1 AS VARCHAR) AS hn,
        |    CASE WHEN o_orderkey%5<>2 THEN 'Gävle' END AS city,
        |    'Återvinningscentral ' || CAST(o_orderkey%9 AS VARCHAR) AS cname,
        |    CASE o_orderkey%4 WHEN 0 THEN 'Glas' WHEN 1 THEN 'Metall'
        |      WHEN 2 THEN 'Papper' ELSE 'Plast' END AS fraction
        |  FROM orders),
        |ups AS (
        |  SELECT *,
        |    CASE WHEN typ='container' THEN
        |      'Sätt `recycling:*=yes` enligt följande: ' ||
        |      CASE WHEN k%8=1 THEN fraction || ', Tidningar' ELSE fraction END
        |    ELSE '' END AS note
        |  FROM b),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id, street, hn, hnn, cname, typ,
        |    ux + (CASE WHEN k%10 IN (1,9) THEN k%4 WHEN k%10=2 THEN 200
        |      WHEN k%10=3 THEN 300 WHEN k%10=4 THEN 300 WHEN k%10=5 THEN 700
        |      WHEN k%10=6 THEN 700 WHEN k%10=7 THEN 100
        |      WHEN k%10=8 THEN 820001 + k%100 - CAST(ux AS BIGINT) END) AS ox,
        |    uy + (CASE WHEN k%10 IN (1,9) THEN k%3 ELSE 0 END) AS oy,
        |    CASE WHEN k%10=3 THEN LOWER(street)
        |         WHEN k%10 IN (5,6) THEN street
        |         WHEN k%10=4 THEN 'Annan Gata'
        |         WHEN k%7=0 THEN street WHEN k%7=1 THEN 'Annan Gata' END AS ostreet,
        |    CASE WHEN k%10=5 THEN hn
        |         WHEN k%10=6 THEN CAST(hnn + 1 AS VARCHAR) END AS ohn,
        |    CASE WHEN k%10=7 THEN (CASE WHEN typ='centre' THEN 'container' ELSE 'centre' END)
        |         ELSE typ END AS otyp,
        |    CASE WHEN k%11=0 THEN cname WHEN k%11=1 THEN 'Fel ÅVC' END AS oname
        |  FROM b WHERE k%10 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, u.typ AS utyp, o.osm_id, o.ostreet, o.ohn, o.oname,
        |    o.otyp, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist,
        |    u.street, u.hn
        |  FROM ups u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 1000 AND ABS(u.uy-o.oy) <= 1000
        |    AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 1000),
        |condpairs AS (
        |  SELECT *,
        |    CASE WHEN ostreet IS NOT NULL AND ohn IS NOT NULL
        |          AND ostreet = street AND ohn = hn THEN 1000.0 + dist
        |         WHEN ostreet IS NOT NULL AND LOWER(ostreet) = LOWER(street)
        |          THEN 500.0 + dist
        |         ELSE 250.0 + dist END AS score
        |  FROM cand
        |  WHERE (ostreet IS NOT NULL AND ohn IS NOT NULL
        |         AND ostreet = street AND ohn = hn AND dist <= 1000)
        |     OR (ostreet IS NOT NULL AND LOWER(ostreet) = LOWER(street)
        |         AND dist <= 500)
        |     OR dist <= 250),
        |main AS (SELECT * FROM condpairs WHERE utyp = otyp),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY score, osm_id) AS rn
        |    FROM main)
        |  WHERE rn = 1),
        |anti_seen AS (SELECT DISTINCT osm_id FROM condpairs),
        |dev_item AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Återvinningsstation saknas'
        |         ELSE 'Återvinningsstation/-central saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en återvinningsstation/-central här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på återvinningsstationen/-centralen här'
        |         END AS description,
        |    u.note,
        |    CONCAT_WS(';',
        |      CASE WHEN u.city IS NOT NULL THEN 'addr:city=' || u.city END,
        |      CASE WHEN w.osm_id IS NULL OR w.ohn IS DISTINCT FROM u.hn
        |           THEN 'addr:housenumber=' || u.hn END,
        |      CASE WHEN w.osm_id IS NULL OR w.ostreet IS DISTINCT FROM u.street
        |           THEN 'addr:street=' || u.street END,
        |      CASE WHEN w.osm_id IS NULL THEN 'amenity=recycling' END,
        |      CASE WHEN u.typ='centre' AND (w.osm_id IS NULL
        |            OR w.oname IS DISTINCT FROM u.cname)
        |           THEN 'name=' || u.cname END,
        |      CASE WHEN w.osm_id IS NULL THEN 'recycling_type=' || u.typ END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM ups u LEFT JOIN best w ON u.k = w.uk),
        |dev AS (
        |  SELECT item_id, osm_id, title, description, note, diff, cx, cy
        |  FROM dev_item WHERE osm_id IS NULL OR diff <> ''
        |  UNION ALL
        |  SELECT NULL AS item_id, o.osm_id,
        |    'Återvinningsstation/-central möjligen stängd' AS title,
        |    'Enligt Gävle kommun finns det ingen återvinningsstation/-central här, den kan vara stängd' AS description,
        |    '' AS note, '' AS diff, o.ox AS cx, o.oy AS cy
        |  FROM osm o WHERE o.osm_id NOT IN (SELECT osm_id FROM anti_seen))
        |SELECT item_id, osm_id, title, description, note, diff, cx, cy FROM dev""".stripMargin)
}
