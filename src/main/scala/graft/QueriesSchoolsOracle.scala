package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * schools_skolverket (13-v-deviation_schools_skolverket.sql) behind the
 * DuckDB oracle — the FIFTH full dataset view oracled end to end, and the
 * first to put the per-municipality LATERAL (J6: `extraJoinKeys =
 * muni_code`, candidate join equi-keyed on the municipality on BOTH legs)
 * plus the A1 group-collapse + F11 process_school_tags behind a hash oracle:
 *
 *  - items grouped by (geometry, TRIM(Webbadress), kommun): k%8==0 carries a
 *    SECOND school unit at the same geometry/web. k%16==0 pairs an Aktiv
 *    unit with a Vilande one (process_school_tags keeps only units with
 *    amenity -> the Vilande unit's ref is EXCLUDED from the ';' join);
 *    k%16==8 makes the FIRST unit (by id) a 'Komvux' special (specials-last
 *    sort -> the merged map comes from the SECOND unit) and ';'-joins both
 *    refs sorted — visible in the diff whenever OSM's ref mismatches.
 *  - the muni scoping is attacked directly: k%10==7 places the item just
 *    west of the quadrant border and its OSM school (with the EXACT name
 *    and ref) just east — candidate never forms, the item goes "missing"
 *    and the OSM node lands in the OTHER municipality's anti leg.
 *  - status ladder (Aktiv/Vilande/Planerad -> amenity/disused/planned +
 *    end/opening dates), operator:type ladder (Kommun/förening/stiftelse/
 *    else), fix_name with hand-computed expected literals, addr regex
 *    split, the contact:email dot-before-@ DROP quirk, Waldorf pedagogy,
 *    and the disused-missing post-filter suppression are all recomputed
 *    from first principles in the oracle; deletions (amenity -> NULL on
 *    non-Aktiv items) surface as '__remove__' in the diff string.
 *
 * Coordinates are integral doubles (modular arithmetic over orders keys), so
 * SQRT distances and the (score, osm_id) rank order are bit-exact in Spark
 * and DuckDB; quadrant municipality envelopes have .5 bounds, so integral
 * coordinates are never ON a boundary and x==500000 / y==500000 rows are
 * outside EVERY municipality in both engines.
 */
object QueriesSchoolsOracle {

  private def kMod(n: Long): Column = pmod(col("k"), lit(n))

  /** base: positions + per-k fixture values shared by items and OSM */
  private def sBase(s: SparkSession, dir: String): DataFrame = {
    val m4 = kMod(4); val m5 = kMod(5)
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux0", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      // k%10==7: item deliberately NEAR the west side of the vertical border
      .withColumn("ux", when(kMod(10) === 7,
          lit(499000.0) + kMod(900).cast("double")).otherwise(col("ux0")))
      .withColumn("nm", when(m4 === 0, "Solskolan").when(m4 === 1, "Norra Skolan")
        .when(m4 === 2, "Bergets Skola").otherwise("Kunskapsskolan Syd"))
      .withColumn("hm_raw", when(m4 === 0, "gävle kommun")
        .when(m4 === 1, "bollnäs förskoleförening")
        .when(m4 === 2, "stiftelsen lärande")
        .otherwise("kunskapsbolaget i norden ab"))
      // hand-computed fix_name outputs (initcap + first-\bKommun\b/-\bAb\b)
      .withColumn("op_exp", when(m4 === 0, "Gävle kommun")
        .when(m4 === 1, "Bollnäs Förskoleförening")
        .when(m4 === 2, "Stiftelsen Lärande")
        .otherwise("Kunskapsbolaget I Norden AB"))
      .withColumn("hm_typ", when(m4 === 0, "Kommun").otherwise("Enskild"))
      .withColumn("adress", when(m5 === 0, "Storgatan 12")
        .when(m5 === 1, "Lilla Nygatan 3 B").when(m5 === 3, "Kungsvägen 7")
        .when(m5 === 4, "Torget 1"))
      .withColumn("web", concat(lit("https://skolan"), col("k"), lit(".example.se")))
      .withColumn("epost", when(kMod(3) === 0, "kansli@skolan.se")
        .when(kMod(3) === 1, "rektor.namn@skolan.se"))
      .withColumn("status",
        when(kMod(8) === 0, "Aktiv")
          .when(kMod(6) === 0, "Vilande").when(kMod(6) === 1, "Planerad")
          .otherwise("Aktiv"))
      .withColumn("kommunkod", when(kMod(13) === 0, "9999").otherwise(
        when(col("ux") <= 499999 && col("uy") <= 499999, "0180")
          .when(col("ux") >= 500001 && col("ux") <= 1000000 && col("uy") <= 499999, "1480")
          .when(col("ux") <= 499999 && col("uy") >= 500001 && col("uy") <= 1000000, "2180")
          .when(col("ux") >= 500001 && col("ux") <= 1000000 &&
            col("uy") >= 500001 && col("uy") <= 1000000, "2580")))
  }

  /** one skolverket item row; unit B (second school unit of a group) differs
    * in id/Skolenhetskod/SkolaNamn/Status only. */
  private def itemRow(b: DataFrame, unitB: Boolean): DataFrame = {
    val id = if (unitB) col("k") + 5000000L else col("k")
    val skolenhetskod =
      if (unitB) concat(lit("SK"), col("k"), lit("B")) else concat(lit("SK"), col("k"))
    val skolaNamn =
      if (unitB) col("nm")
      else when(kMod(16) === 8, "Komvux Centrum").otherwise(col("nm"))
    val status = if (unitB)
      when(kMod(16) === 0, "Vilande").otherwise("Aktiv") else col("status")
    val src = if (unitB) b.filter(kMod(8) === 0) else b
    src.select(id.as("id"), lit(109L).as("dataset_id"),
      to_json(struct(
        status.as("Status"),
        when(status === "Vilande", "2021-06-30").as("Nedlaggningsdatum"),
        when(status === "Planerad", "2027-08-15").as("Startdatum"),
        skolaNamn.as("SkolaNamn"),
        skolenhetskod.as("Skolenhetskod"),
        col("web").as("Webbadress"),
        col("epost").as("Epost"),
        when(kMod(12) === 0, "Waldorf").as("Inriktningstyp"),
        struct(col("hm_raw").as("Namn"), col("hm_typ").as("Typ")).as("Huvudman"),
        struct(col("adress").as("Adress"), lit("Gävle").as("Ort"),
          lit("80311").as("Postnr")).as("Besoksadress"),
        struct(col("kommunkod").as("Kommunkod")).as("Kommun"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))
  }

  private def sItems(b: DataFrame): DataFrame =
    itemRow(b, unitB = false).unionByName(itemRow(b, unitB = true))

  /** OSM schools by k%10 — 0: none; {1,9}: tiny (dOther); 2: 40 m; 3: 60 m
    * lowercase name (name tier, ci); 4: 60 m wrong name (no match -> missing
    * + anti); 5: 600 m exact name (outside the 500 m name tier -> missing +
    * anti); 6: 800 m exact ref (ref tier; groups carry the B-unit ref so the
    * ';' overlap fires); 7: across the muni border with exact name AND ref
    * (J6 scoping: no candidate); 8: 30 m with name/operator/website
    * mirrored (thin diff). */
  private def sOsm(b: DataFrame): DataFrame = {
    val m10 = kMod(10); val m7 = kMod(7); val m11 = kMod(11)
    val dx = when(m10 === 1 || m10 === 9, kMod(4))
      .when(m10 === 2, 40L).when(m10 === 3, 60L).when(m10 === 4, 60L)
      .when(m10 === 5, 600L).when(m10 === 6, 800L)
      .when(m10 === 7, lit(500001L) + kMod(400) - col("ux").cast("long"))
      .when(m10 === 8, 30L)
    val dy = when(m10 === 1 || m10 === 9, kMod(3)).otherwise(0L)
    val osmName = when(m10 === 3, lower(col("nm")))
      .when(m10 === 5 || m10 === 7 || m10 === 8, col("nm"))
      .otherwise(when(m7 === 0, col("nm")).when(m7 === 1, "Annan Skola")
        .when(m7 === 2, lower(col("nm"))))
    val osmRef = when(m10 === 6,
        when(kMod(8) === 0, concat(lit("SK"), col("k"), lit("B")))
          .otherwise(concat(lit("SK"), col("k"))))
      .when(m10 === 7, concat(lit("SK"), col("k")))
    val osmOp = when(m10 === 8, col("op_exp"))
      .when(m11 === 0, upper(col("op_exp")))
      .when(m11 === 1, "Felaktig Operatör AB")
    val osmWeb = when(m10 === 8, col("web"))
    b.filter(m10 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map_filter(map(
          lit("amenity"), lit("school"),
          lit("name"), osmName,
          lit("ref:se:skolverket"), osmRef,
          lit("operator"), osmOp,
          lit("contact:website"), osmWeb),
          (_, v) => v.isNotNull).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private val diffKeys = Seq(
    "addr:city", "addr:housenumber", "addr:postcode", "addr:street",
    "amenity", "contact:email", "contact:website", "disused:amenity",
    "end_date", "name", "opening_date", "operator", "operator:type",
    "pedagogy", "planned:amenity", "ref:se:skolverket")

  /** deletions (explicit null values) render as '__remove__' */
  private def sDiffStr(m: Column): Column =
    concat_ws(";", diffKeys.map(key =>
      when(map_contains_key(m, lit(key)),
        concat(lit(key + "="), coalesce(m(key), lit("__remove__"))))): _*)

  // quadrant municipalities shared with the other dataset oracles
  private def quadMunis(s: SparkSession): DataFrame =
    QueriesDatasetOracle.quadMunis(s)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ds_schools_oracle" -> ((s, dir) => {
      val b = sBase(s, dir)
      val dev = graft.engine.ReferenceDatasets.schoolsDeviations(
        graft.engine.ReferenceDatasets.schoolsMatch(
          sOsm(b), sItems(b), quadMunis(s)))
      dev.select(
        get(col("upstream_item_ids"), lit(0)).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        sDiffStr(col("suggested_tags")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }))

  val oracle: Map[String, String] = Map(
    "q_ds_schools_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE WHEN o_orderkey%10=7
        |      THEN CAST(499000 + o_orderkey%900 AS DOUBLE)
        |      ELSE CAST((o_orderkey*48271)%1000000 AS DOUBLE) END AS ux,
        |    CASE o_orderkey%4 WHEN 0 THEN 'Solskolan' WHEN 1 THEN 'Norra Skolan'
        |      WHEN 2 THEN 'Bergets Skola' ELSE 'Kunskapsskolan Syd' END AS nm,
        |    CASE o_orderkey%4 WHEN 0 THEN 'Gävle kommun'
        |      WHEN 1 THEN 'Bollnäs Förskoleförening'
        |      WHEN 2 THEN 'Stiftelsen Lärande'
        |      ELSE 'Kunskapsbolaget I Norden AB' END AS op,
        |    CASE o_orderkey%4 WHEN 0 THEN 'government' WHEN 1 THEN 'cooperative'
        |      WHEN 2 THEN 'ngo' ELSE 'private' END AS optype,
        |    CASE o_orderkey%5 WHEN 0 THEN '12' WHEN 1 THEN '3 B'
        |      WHEN 3 THEN '7' WHEN 4 THEN '1' END AS hn,
        |    CASE o_orderkey%5 WHEN 0 THEN 'Storgatan' WHEN 1 THEN 'Lilla Nygatan'
        |      WHEN 3 THEN 'Kungsvägen' WHEN 4 THEN 'Torget' END AS st,
        |    'https://skolan' || CAST(o_orderkey AS VARCHAR) || '.example.se' AS web,
        |    CASE WHEN o_orderkey%3=0 THEN 'kansli@skolan.se' END AS email,
        |    CASE WHEN o_orderkey%8=0 THEN 'Aktiv'
        |         WHEN o_orderkey%6=0 THEN 'Vilande'
        |         WHEN o_orderkey%6=1 THEN 'Planerad' ELSE 'Aktiv' END AS status,
        |    CASE WHEN o_orderkey%12=0 THEN 'waldorf' END AS pedagogy,
        |    CASE WHEN o_orderkey%8=0 AND o_orderkey%16=8
        |      THEN 'SK' || CAST(o_orderkey AS VARCHAR) || ';SK' || CAST(o_orderkey AS VARCHAR) || 'B'
        |      ELSE 'SK' || CAST(o_orderkey AS VARCHAR) END AS refval
        |  FROM orders),
        |uq AS (
        |  SELECT *,
        |    CASE WHEN k%13=0 THEN NULL
        |         WHEN ux <= 499999 AND uy <= 499999 THEN '0180'
        |         WHEN ux >= 500001 AND ux <= 1000000 AND uy <= 499999 THEN '1480'
        |         WHEN ux <= 499999 AND uy >= 500001 AND uy <= 1000000 THEN '2180'
        |         WHEN ux >= 500001 AND ux <= 1000000
        |          AND uy >= 500001 AND uy <= 1000000 THEN '2580' END AS q
        |  FROM b),
        |ups AS (SELECT * FROM uq WHERE q IS NOT NULL),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id, nm, web,
        |    ux + (CASE WHEN k%10 IN (1,9) THEN k%4 WHEN k%10=2 THEN 40
        |      WHEN k%10=3 THEN 60 WHEN k%10=4 THEN 60 WHEN k%10=5 THEN 600
        |      WHEN k%10=6 THEN 800
        |      WHEN k%10=7 THEN 500001 + k%400 - CAST(ux AS BIGINT)
        |      WHEN k%10=8 THEN 30 END) AS ox,
        |    uy + (CASE WHEN k%10 IN (1,9) THEN k%3 ELSE 0 END) AS oy,
        |    CASE WHEN k%10=3 THEN LOWER(nm)
        |         WHEN k%10 IN (5,7,8) THEN nm
        |         WHEN k%7=0 THEN nm WHEN k%7=1 THEN 'Annan Skola'
        |         WHEN k%7=2 THEN LOWER(nm) END AS oname,
        |    CASE WHEN k%10=6 AND k%8=0 THEN 'SK' || CAST(k AS VARCHAR) || 'B'
        |         WHEN k%10=6 THEN 'SK' || CAST(k AS VARCHAR)
        |         WHEN k%10=7 THEN 'SK' || CAST(k AS VARCHAR) END AS oref,
        |    CASE WHEN k%10=8 THEN op WHEN k%11=0 THEN UPPER(op)
        |         WHEN k%11=1 THEN 'Felaktig Operatör AB' END AS oop,
        |    CASE WHEN k%10=8 THEN web END AS oweb
        |  FROM b WHERE k%10 <> 0),
        |oq AS (
        |  SELECT * FROM (
        |    SELECT *,
        |      CASE WHEN ox >= 0 AND ox <= 499999 AND oy >= 0 AND oy <= 499999 THEN '0180'
        |           WHEN ox >= 500001 AND ox <= 1000000 AND oy >= 0 AND oy <= 499999 THEN '1480'
        |           WHEN ox >= 0 AND ox <= 499999 AND oy >= 500001 AND oy <= 1000000 THEN '2180'
        |           WHEN ox >= 500001 AND ox <= 1000000
        |            AND oy >= 500001 AND oy <= 1000000 THEN '2580' END AS q
        |    FROM osm0)
        |  WHERE q IS NOT NULL),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oname, o.oref, o.oop, o.oweb,
        |    o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist,
        |    u.nm, u.refval
        |  FROM ups u JOIN oq o ON u.q = o.q
        |    AND ABS(u.ux-o.ox) <= 1000 AND ABS(u.uy-o.oy) <= 1000
        |    AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 1000),
        |cond AS (
        |  SELECT *,
        |    CASE WHEN oref IS NOT NULL AND (oref = refval
        |           OR ';' || refval || ';' LIKE '%;' || oref || ';%')
        |         THEN 1000.0 + dist
        |         WHEN oname IS NOT NULL AND LOWER(oname) = LOWER(nm)
        |          AND dist <= 500 THEN 500.0 + dist
        |         ELSE 50.0 + dist END AS score
        |  FROM cand
        |  WHERE (oref IS NOT NULL AND (oref = refval
        |          OR ';' || refval || ';' LIKE '%;' || oref || ';%')
        |         AND dist <= 1000)
        |     OR (oname IS NOT NULL AND LOWER(oname) = LOWER(nm) AND dist <= 500)
        |     OR dist <= 50),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY score, osm_id) AS rn
        |    FROM cond)
        |  WHERE rn = 1),
        |matched_osm AS (SELECT DISTINCT osm_id FROM cond),
        |dev_item AS (
        |  SELECT u.k AS item_id, w.osm_id, u.status,
        |    CASE WHEN w.osm_id IS NULL THEN 'Skola saknas'
        |         ELSE 'Skola saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Skolverkets register ska det finnas en skola här'
        |         ELSE 'Följande taggar, härledda ur från Skolverkets register, saknas på skolan här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      'addr:city=Gävle',
        |      CASE WHEN u.hn IS NOT NULL THEN 'addr:housenumber=' || u.hn END,
        |      'addr:postcode=80311',
        |      CASE WHEN u.st IS NOT NULL THEN 'addr:street=' || u.st END,
        |      CASE WHEN u.status='Aktiv' AND w.osm_id IS NULL THEN 'amenity=school'
        |           WHEN u.status<>'Aktiv' AND w.osm_id IS NOT NULL THEN 'amenity=__remove__' END,
        |      CASE WHEN u.email IS NOT NULL THEN 'contact:email=' || u.email END,
        |      CASE WHEN w.osm_id IS NULL OR w.oweb IS DISTINCT FROM u.web
        |           THEN 'contact:website=' || u.web END,
        |      CASE WHEN u.status='Vilande' THEN 'disused:amenity=school' END,
        |      CASE WHEN u.status='Vilande' THEN 'end_date=2021-06-30' END,
        |      CASE WHEN w.osm_id IS NULL OR w.oname IS DISTINCT FROM u.nm
        |           THEN 'name=' || u.nm END,
        |      CASE WHEN u.status='Planerad' THEN 'opening_date=2027-08-15' END,
        |      CASE WHEN w.osm_id IS NULL OR LOWER(w.oop) IS DISTINCT FROM LOWER(u.op)
        |           THEN 'operator=' || u.op END,
        |      'operator:type=' || u.optype,
        |      CASE WHEN u.pedagogy IS NOT NULL THEN 'pedagogy=waldorf' END,
        |      CASE WHEN u.status='Planerad' THEN 'planned:amenity=school' END,
        |      CASE WHEN w.osm_id IS NULL OR w.oref IS DISTINCT FROM u.refval
        |           THEN 'ref:se:skolverket=' || u.refval END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM ups u LEFT JOIN best w ON u.k = w.uk),
        |dev AS (
        |  SELECT item_id, osm_id, title, description, diff, cx, cy FROM dev_item
        |  WHERE (osm_id IS NOT NULL AND diff <> '')
        |     OR (osm_id IS NULL AND status <> 'Vilande')
        |  UNION ALL
        |  SELECT NULL AS item_id, o.osm_id, 'Skola möjligen stängd' AS title,
        |    'Enligt Skolverkets register finns det ingen skola här, den kan vara stängd' AS description,
        |    '' AS diff, o.ox AS cx, o.oy AS cy
        |  FROM oq o WHERE o.osm_id NOT IN (SELECT osm_id FROM matched_osm))
        |SELECT item_id, osm_id, title, description, diff, cx, cy FROM dev""".stripMargin)
}
