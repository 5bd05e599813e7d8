package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * Five more dataset views behind the DuckDB oracle (11th-15th) — the
 * remaining non-topo50 views, on the established modular-arithmetic
 * synthesis (the five topo50 family members share their machinery with the
 * oracled fused join `q_ds_topo50_oracle`).
 *
 * What each adds beyond the first ten:
 *  - `grillplatser_uppsala` (37): the EXACT-REGEX wood ladder — 'Ved finns\.'
 *    requires a literal period right after 'finns', so 'Ved finns inte här.'
 *    matches NEITHER pattern and the wood key is stripped (k%5==4 probe);
 *    the comment -> note PASSTHROUGH ('Kommentar från Uppsala kommun: ' ||
 *    comment, '' on null) carried through the match (carryUps plumbing);
 *    bbq/firepit alternatives; municipality '0380' (not Gävle).
 *  - `parkmobler_gavle` (23): the ITEM-SIDE predicate — PRODTYP outside
 *    (Bänk, Bord) makes the item VANISH entirely (no "missing" row), unlike
 *    the OSM-side gates of every other view; matched furniture with the
 *    right amenity diffs to {} and is dropped, so only missing + flipped
 *    rows survive.
 *  - `cykelparkeringsplatser_gavle` (24): capacity passthrough with NO
 *    strip — a NULL ANTPLATSER item matched to a capacity-carrying stand
 *    suggests DELETING capacity ('__remove__').
 *  - `cykelpumpar_gavle` (22): three-constant map; a node carrying BOTH
 *    service keys with matching values diffs to {} and drops.
 *  - `papperskorgar_gavle` (20): single-constant map — EVERY matched row
 *    diffs to {} and drops; the oracle output is missing rows ONLY, so the
 *    matched population is asserted by absence.
 */
object QueriesMoreViewsOracle {

  private def kMod(n: Long) = pmod(col("k"), lit(n))

  private def base(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))

  private def muniRect(s: SparkSession, code: String): DataFrame = {
    import s.implicits._
    Seq((code, "M")).toDF("code", "name")
      .withColumn("geom", stEnvelopeWkb(lit(-0.5), lit(-0.5),
        lit(820000.5), lit(1000000.5)))
      .select("code", "name", "geom")
  }

  private def item(b: DataFrame, datasetId: Long, attrs: Column): DataFrame =
    b.select(col("k").as("id"), lit(datasetId).as("dataset_id"),
      attrs.as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  /** shared node builder: m9==0 none, m9==1 just past the radius, m9==2
    * relocated past the muni cutoff, else inside. */
  private def osmNodes(b: DataFrame, justOutside: Long, dxIn: Column,
                       dyIn: Column, tags: Column): DataFrame = {
    val m9 = kMod(9)
    val dx = when(m9 === 1, justOutside)
      .when(m9 === 2, lit(820001L) + kMod(100) - col("ux").cast("long"))
      .otherwise(dxIn)
    val dy = when(m9 === 1 || m9 === 2, 0L).otherwise(dyIn)
    b.filter(m9 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        tags.as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private def diffStrRm(m: Column, keys: Seq[String]): Column =
    concat_ws(";", keys.map(key =>
      when(map_contains_key(m, lit(key)),
        concat(lit(key + "="), coalesce(m(key), lit("__remove__"))))): _*)

  private def project(dev: DataFrame, keys: Seq[String],
                      withNote: Boolean = false): DataFrame = {
    val cols = Seq(
      element_at(col("upstream_item_ids"), 1).as("item_id"),
      col("osm_element_id").as("osm_id"),
      col("title"), col("description")) ++
      (if (withNote) Seq(col("note")) else Nil) ++ Seq(
      diffStrRm(col("suggested_tags"), keys).as("diff"),
      stCentroid(col("center"))("_1").as("cx"),
      stCentroid(col("center"))("_2").as("cy"))
    dev.select(cols: _*)
  }

  // ---- grillplatser fixture -----------------------------------------------
  private def grillComment: Column = {
    val m5 = kMod(5)
    when(m5 === 0, "Ved finns. Fin plats.")
      .when(m5 === 1, "Ved finns inte. Regnskydd saknas.")
      .when(m5 === 2, "Trevlig grillplats.")
      .when(m5 === 4, "Ved finns inte här.") // matches NEITHER wood pattern
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ds_grillplatser_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val items = item(b, 466L, to_json(struct(grillComment.as("Kommentar"))))
      val osm = osmNodes(b, justOutside = 26L, dxIn = kMod(20), dyIn = kMod(15),
        tags = map_filter(map(
          lit("amenity"), when(kMod(2) === 0, "bbq"),
          lit("leisure"), when(kMod(2) === 1, "firepit"),
          lit("wood_provided"), when(kMod(23) === 0, "yes")),
          (_, v) => v.isNotNull))
      val dev = graft.engine.ReferenceDatasetsGavle.grillplatserDeviations(
        graft.engine.ReferenceDatasetsGavle.grillplatserMatch(
          osm, items, muniRect(s, "0380")))
      project(dev, Seq("amenity", "leisure", "wood_provided"), withNote = true)
    }),

    "q_ds_parkmobler_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val prodtyp = when(kMod(4) === 0 || kMod(4) === 3, "Bänk")
        .when(kMod(4) === 1, "Bord").otherwise("Soptunna") // %4==2 vanishes
      val uamen = when(prodtyp === "Bänk", "bench").otherwise("table")
      val items = item(b, 7L, to_json(struct(prodtyp.as("PRODTYP"))))
      val osm = osmNodes(b, justOutside = 6L, dxIn = kMod(4), dyIn = kMod(3),
        tags = map(lit("amenity"),
          when(kMod(11) === 0, // flipped amenity -> replace suggestion
            when(uamen === "bench", "table").otherwise("bench"))
            .otherwise(uamen)))
      val dev = graft.engine.ReferenceDatasetsGavle.parkmoblerDeviations(
        graft.engine.ReferenceDatasetsGavle.parkmoblerMatch(
          osm, items, muniRect(s, "2180")))
      project(dev, Seq("amenity"))
    }),

    "q_ds_cykelparkering_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val cap = when(kMod(5) =!= 0, (kMod(40) + 1).cast("string"))
      val items = item(b, 21L, to_json(struct(cap.as("ANTPLATSER"))))
      val osm = osmNodes(b, justOutside = 11L, dxIn = kMod(4), dyIn = kMod(3),
        tags = map_filter(map(
          lit("amenity"), lit("bicycle_parking"),
          lit("capacity"), when(kMod(11) === 0, cap)
            .when(kMod(11) === 1, "999")),
          (_, v) => v.isNotNull))
      val dev = graft.engine.ReferenceDatasetsGavle.cykelparkeringDeviations(
        graft.engine.ReferenceDatasetsGavle.cykelparkeringMatch(
          osm, items, muniRect(s, "2180")))
      project(dev, Seq("amenity", "capacity"))
    }),

    "q_ds_cykelpumpar_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val items = item(b, 11L, to_json(struct(lit("x").as("IGNORED"))))
      val osm = osmNodes(b, justOutside = 51L, dxIn = kMod(40), dyIn = kMod(30),
        tags = map_filter(map(
          lit("amenity"), lit("bicycle_repair_station"),
          lit("service:bicycle:pump"), when(kMod(11) === 0, "yes"),
          lit("service:bicycle:tools"), when(kMod(13) === 0, "unknown")),
          (_, v) => v.isNotNull))
      val dev = graft.engine.ReferenceDatasetsGavle.cykelpumparDeviations(
        graft.engine.ReferenceDatasetsGavle.cykelpumparMatch(
          osm, items, muniRect(s, "2180")))
      project(dev,
        Seq("amenity", "service:bicycle:pump", "service:bicycle:tools"))
    }),

    "q_ds_papperskorgar_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val items = item(b, 31L, to_json(struct(lit("x").as("IGNORED"))))
      val osm = osmNodes(b, justOutside = 26L, dxIn = kMod(20), dyIn = kMod(15),
        tags = map(lit("amenity"), lit("waste_basket")))
      val dev = graft.engine.ReferenceDatasetsGavle.papperskorgarDeviations(
        graft.engine.ReferenceDatasetsGavle.papperskorgarMatch(
          osm, items, muniRect(s, "2180")))
      project(dev, Seq("amenity"))
    }))

  val oracle: Map[String, String] = Map(
    "q_ds_grillplatser_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE o_orderkey%5 WHEN 0 THEN 'Ved finns. Fin plats.'
        |      WHEN 1 THEN 'Ved finns inte. Regnskydd saknas.'
        |      WHEN 2 THEN 'Trevlig grillplats.'
        |      WHEN 4 THEN 'Ved finns inte här.' END AS cmt,
        |    CASE o_orderkey%5 WHEN 0 THEN 'yes' WHEN 1 THEN 'no' END AS wood
        |  FROM orders),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%9=1 THEN 26
        |      WHEN k%9=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%20 END) AS ox,
        |    uy + (CASE WHEN k%9 IN (1,2) THEN 0 ELSE k%15 END) AS oy,
        |    CASE WHEN k%2=0 THEN 'bbq' END AS oamen,
        |    CASE WHEN k%2=1 THEN 'firepit' END AS oleis,
        |    CASE WHEN k%23=0 THEN 'yes' END AS owood
        |  FROM b WHERE k%9 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oamen, o.oleis, o.owood, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM b u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 25 AND ABS(u.uy-o.oy) <= 25
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 25),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Grillplats saknas'
        |         ELSE 'Grillplats saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Uppsala kommun ska det finnas en grillplats här'
        |         ELSE 'Följande taggar, härledda ur från Uppsala kommuns data, saknas på grillplatsen här'
        |         END AS description,
        |    CASE WHEN u.cmt IS NOT NULL
        |         THEN 'Kommentar från Uppsala kommun: ' || u.cmt
        |         ELSE '' END AS note,
        |    CONCAT_WS(';',
        |      CASE WHEN w.osm_id IS NULL THEN 'amenity=bbq'
        |           WHEN w.oamen IS NULL AND w.oleis IS NULL THEN 'amenity=bbq'
        |           END,
        |      CASE WHEN u.wood IS NOT NULL
        |            AND (w.osm_id IS NULL OR w.owood IS DISTINCT FROM u.wood)
        |           THEN 'wood_provided=' || u.wood END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM b u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, note, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin,

    "q_ds_parkmobler_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE WHEN o_orderkey%4 IN (0,3) THEN 'bench'
        |         WHEN o_orderkey%4=1 THEN 'table' END AS uamen,
        |    CASE WHEN o_orderkey%4 IN (0,3) THEN 'bench'
        |         ELSE 'table' END AS amen0
        |  FROM orders),
        |ups AS (SELECT * FROM b WHERE uamen IS NOT NULL),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%9=1 THEN 6
        |      WHEN k%9=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%4 END) AS ox,
        |    uy + (CASE WHEN k%9 IN (1,2) THEN 0 ELSE k%3 END) AS oy,
        |    CASE WHEN k%11=0 THEN
        |      (CASE WHEN amen0='bench' THEN 'table' ELSE 'bench' END)
        |      ELSE amen0 END AS oamen
        |  FROM b WHERE k%9 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oamen, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM ups u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 5 AND ABS(u.uy-o.oy) <= 5
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 5),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Parkmöbel saknas'
        |         ELSE 'Parkmöbel saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en parkmöbel här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på parkmöbeln här'
        |         END AS description,
        |    CASE WHEN w.osm_id IS NULL OR w.oamen IS DISTINCT FROM u.uamen
        |         THEN 'amenity=' || u.uamen ELSE '' END AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM ups u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin,

    "q_ds_cykelparkering_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE WHEN o_orderkey%5<>0
        |         THEN CAST(o_orderkey%40 + 1 AS VARCHAR) END AS cap
        |  FROM orders),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%9=1 THEN 11
        |      WHEN k%9=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%4 END) AS ox,
        |    uy + (CASE WHEN k%9 IN (1,2) THEN 0 ELSE k%3 END) AS oy,
        |    CASE WHEN k%11=0 THEN cap WHEN k%11=1 THEN '999' END AS ocap
        |  FROM b WHERE k%9 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.ocap, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM b u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 10 AND ABS(u.uy-o.oy) <= 10
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 10),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Cykelparkeringsplats saknas'
        |         ELSE 'Cykelparkeringsplats saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en cykelparkeringsplats här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på cykelparkeringsplatsen här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      CASE WHEN w.osm_id IS NULL THEN 'amenity=bicycle_parking' END,
        |      CASE WHEN u.cap IS NOT NULL
        |            AND (w.osm_id IS NULL OR w.ocap IS DISTINCT FROM u.cap)
        |           THEN 'capacity=' || u.cap
        |           WHEN w.osm_id IS NOT NULL AND u.cap IS NULL
        |            AND w.ocap IS NOT NULL THEN 'capacity=__remove__' END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM b u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin,

    "q_ds_cykelpumpar_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy
        |  FROM orders),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%9=1 THEN 51
        |      WHEN k%9=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%40 END) AS ox,
        |    uy + (CASE WHEN k%9 IN (1,2) THEN 0 ELSE k%30 END) AS oy,
        |    k%11=0 AS opump, k%13=0 AS otools
        |  FROM b WHERE k%9 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.opump, o.otools, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM b u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 50 AND ABS(u.uy-o.oy) <= 50
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 50),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Cykelpump saknas'
        |         ELSE 'Cykelpump saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en cykelpump här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på cykelpumpen här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      CASE WHEN w.osm_id IS NULL THEN 'amenity=bicycle_repair_station' END,
        |      CASE WHEN w.osm_id IS NULL OR NOT w.opump
        |           THEN 'service:bicycle:pump=yes' END,
        |      CASE WHEN w.osm_id IS NULL OR NOT w.otools
        |           THEN 'service:bicycle:tools=unknown' END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM b u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin,

    "q_ds_papperskorgar_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy
        |  FROM orders),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%9=1 THEN 26
        |      WHEN k%9=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%20 END) AS ox,
        |    uy + (CASE WHEN k%9 IN (1,2) THEN 0 ELSE k%15 END) AS oy
        |  FROM b WHERE k%9 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |matched AS (
        |  SELECT DISTINCT u.k FROM b u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 25 AND ABS(u.uy-o.oy) <= 25
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 25)
        |SELECT u.k AS item_id, CAST(NULL AS BIGINT) AS osm_id,
        |  'Papperskorg saknas' AS title,
        |  'Enligt Gävle kommun ska det finnas en papperskorg här' AS description,
        |  'amenity=waste_basket' AS diff, u.ux AS cx, u.uy AS cy
        |FROM b u WHERE u.k NOT IN (SELECT k FROM matched)""".stripMargin)
}
