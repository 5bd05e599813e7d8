package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * The four remaining topo50 views behind the DuckDB oracle (16th-19th) —
 * with these every reference dataset view is either directly oracled or
 * (anlaggningsomradespunkt, via the fused `q_ds_topo50_oracle`) oracled on
 * identical machinery with richer category coverage.
 *
 * In all four views every alternatives set tiles the OSM predicate exactly,
 * so a MATCHED row always diffs to {} and is dropped by the post-filter:
 * the oracle output is MISSING rows only, and the matched population is
 * asserted by absence — which is precisely what makes the per-category
 * radius probes observable (a category-radius-inside node silently removes
 * the row; an outside one leaves a missing row).
 *
 * What each adds:
 *  - `transformatoromradespunkt`/`transformatoromrade` (28/29): the
 *    whole-dataset category (NO filterVals), static titles, 250 m (a 251 m
 *    probe stays missing), and the two views sharing one category list but
 *    different dataset ids.
 *  - `byggnadsanlaggningspunkt` (27): objekttyp-FILTERED items ('Annat'
 *    VANISHES — no missing row), computed titles from the picked
 *    alternative's man_made ('Mast saknas' / 'Skorsten saknas'), and the
 *    category equi-key at work: a FLIPPED-man_made node 1 m away belongs to
 *    the other category, so its item still goes missing (k%11==0 probe).
 *  - `anlaggningsomrade` (31): PER-CATEGORY radii inside one fused join
 *    (Vintersportanläggning 1000 m vs the 500 m default: a 999 m node
 *    silently matches cat 0 but leaves cats 1/2 missing; 600 m splits the
 *    same way; 1001 m misses all), the SIZE-based min-diff alternative pick
 *    (the 1-key landuse=winter_sports alternative beats both 2-key ones on
 *    missing rows), the 6-way order tie for Motorsportanläggning, computed
 *    layers (18/7) and the preserved reference TYPO title 'Skjultfält' for
 *    'Civilt skjutfält' — whose category reads filterKey/carryKey
 *    'objekttyp' while its siblings read 'andamal' (items carry both).
 */
object QueriesTopo50Oracle {

  private def kMod(n: Long) = pmod(col("k"), lit(n))

  private def base(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))

  private def item(b: DataFrame, datasetId: Long, attrs: Column): DataFrame =
    b.select(col("k").as("id"), lit(datasetId).as("dataset_id"),
      attrs.as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  private def node(b: DataFrame, dx: Column, dy: Column, tags: Column): DataFrame =
    b.select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
      tags.as("tags"),
      (col("ux") + dx).cast("double").as("cx"),
      (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))

  private def diffStr(m: Column, keys: Seq[String]): Column =
    concat_ws(";", keys.map(key =>
      when(map_contains_key(m, lit(key)), concat(lit(key + "="), m(key)))): _*)

  private def project(dev: DataFrame, keys: Seq[String],
                      withLayer: Boolean = false): DataFrame = {
    val cols = Seq(
      element_at(col("upstream_item_ids"), 1).as("item_id"),
      col("osm_element_id").as("osm_id")) ++
      (if (withLayer) Seq(col("layer_id")) else Nil) ++ Seq(
      col("title"), col("description"),
      diffStr(col("suggested_tags"), keys).as("diff"),
      stCentroid(col("center"))("_1").as("cx"),
      stCentroid(col("center"))("_2").as("cy"))
    dev.select(cols: _*)
  }

  /** transformator fixture: nodes by k%9 — 0: none; 1: 251 m (just outside);
    * else (k%150, k%100). */
  private def trafoQuery(datasetId: Long,
                         dev: DataFrame => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => {
      val b = base(s, dir)
      val items = item(b, datasetId, to_json(struct(lit("x").as("IGNORED"))))
      val m9 = kMod(9)
      val osm = node(b.filter(m9 =!= 0),
        dx = when(m9 === 1, 251L).otherwise(kMod(150)),
        dy = when(m9 === 1, 0L).otherwise(kMod(100)),
        tags = map(lit("power"), lit("substation")))
      project(dev(graft.engine.Topo50.matchView(
        osm, items, graft.engine.Topo50.transformator, datasetId)),
        Seq("power"))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ds_trafopunkt_oracle" ->
      trafoQuery(149L, graft.engine.Topo50.transformatoromradespunktDeviations),
    "q_ds_trafoomrade_oracle" ->
      trafoQuery(146L, graft.engine.Topo50.transformatoromradeDeviations),

    "q_ds_byggnadspunkt_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val obj = when(kMod(5) === 0, "Annat") // vanishes at the item filter
        .otherwise(when(kMod(2) === 0, "Mast").otherwise("Skorsten"))
      val items = item(b, 143L, to_json(struct(obj.as("objekttyp"))))
      val m9 = kMod(9)
      val mm0 = when(kMod(2) === 0, "mast").otherwise("chimney")
      val mm = when(kMod(11) === 0, // flipped -> other category -> no match
        when(mm0 === "mast", "chimney").otherwise("mast")).otherwise(mm0)
      val osm = node(b.filter(m9 =!= 0),
        dx = when(m9 === 1, 251L).otherwise(kMod(150)),
        dy = when(m9 === 1, 0L).otherwise(kMod(100)),
        tags = map(lit("man_made"), mm))
      project(graft.engine.Topo50.byggnadsanlaggningspunktDeviations(
        graft.engine.Topo50.matchView(
          osm, items, graft.engine.Topo50.byggnadsanlaggningspunkt, 143L)),
        Seq("man_made"))
    }),

    "q_ds_anlaggningsomrade_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val m3 = kMod(3)
      val cat = when(m3 === 0, "Vintersportanläggning")
        .when(m3 === 1, "Civilt skjutfält").otherwise("Motorsportanläggning")
      // items carry BOTH keys: the skjutfält category filters/carries on
      // 'objekttyp' while its siblings use 'andamal'
      val items = item(b, 140L,
        to_json(struct(cat.as("andamal"), cat.as("objekttyp"))))
      val m10 = kMod(10); val m7 = kMod(7)
      def tm(kv: (String, String)*): Column =
        map(kv.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      val tags = when(m3 === 0,
          when(m7 === 0, tm("landuse" -> "winter_sports"))
            .when(m7 === 1, tm("landuse" -> "recreation_ground", "sport" -> "skiing"))
            .otherwise(tm("leisure" -> "sports_centre", "sport" -> "skiing")))
        .when(m3 === 1, tm("leisure" -> "pitch", "sport" -> "shooting"))
        .otherwise(
          when(m7 === 0, tm("leisure" -> "stadium", "sport" -> "motor"))
            .when(m7 === 1, tm("leisure" -> "sports_centre", "sport" -> "karting"))
            .otherwise(tm("leisure" -> "stadium", "sport" -> "motocross")))
      val osm = node(b.filter(m10 =!= 0),
        dx = when(m10 === 1, 999L).when(m10 === 2, 1001L).when(m10 === 3, 600L)
          .otherwise(kMod(150)),
        dy = when(m10 === 1 || m10 === 2 || m10 === 3, 0L).otherwise(kMod(100)),
        tags = tags)
      project(graft.engine.Topo50.anlaggningsomradeDeviations(
        graft.engine.Topo50.matchView(
          osm, items, graft.engine.Topo50.anlaggningsomrade, 140L)),
        Seq("landuse", "leisure", "sport"), withLayer = true)
    }))

  private val trafoSql =
    """WITH b AS (
      |  SELECT o_orderkey AS k,
      |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
      |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy
      |  FROM orders),
      |osm AS (
      |  SELECT k,
      |    ux + (CASE WHEN k%9=1 THEN 251 ELSE k%150 END) AS ox,
      |    uy + (CASE WHEN k%9=1 THEN 0 ELSE k%100 END) AS oy
      |  FROM b WHERE k%9 <> 0)
      |SELECT u.k AS item_id, CAST(NULL AS BIGINT) AS osm_id,
      |  'Transformatområde saknas' AS title,
      |  'Enligt Lantmäteriets 1:50 000 karta ska det finnas ett transformatorområde här' AS description,
      |  'power=substation' AS diff, u.ux AS cx, u.uy AS cy
      |FROM b u WHERE NOT EXISTS (
      |  SELECT 1 FROM osm o
      |  WHERE ABS(u.ux-o.ox) <= 250 AND ABS(u.uy-o.oy) <= 250
      |    AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 250)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_ds_trafopunkt_oracle" -> trafoSql,
    "q_ds_trafoomrade_oracle" -> trafoSql,

    "q_ds_byggnadspunkt_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE WHEN o_orderkey%2=0 THEN 0 ELSE 1 END AS cat
        |  FROM orders),
        |ups AS (SELECT * FROM b WHERE k%5 <> 0),
        |osm AS (
        |  SELECT k,
        |    CASE WHEN k%11=0 THEN 1-cat ELSE cat END AS ncat,
        |    ux + (CASE WHEN k%9=1 THEN 251 ELSE k%150 END) AS ox,
        |    uy + (CASE WHEN k%9=1 THEN 0 ELSE k%100 END) AS oy
        |  FROM b WHERE k%9 <> 0)
        |SELECT u.k AS item_id, CAST(NULL AS BIGINT) AS osm_id,
        |  CASE WHEN u.cat=0 THEN 'Mast saknas' ELSE 'Skorsten saknas' END AS title,
        |  'Enligt Lantmäteriets 1:50 000 karta ska det finnas en ' ||
        |    (CASE WHEN u.cat=0 THEN 'mast' ELSE 'skorsten' END) || ' här' AS description,
        |  'man_made=' || (CASE WHEN u.cat=0 THEN 'mast' ELSE 'chimney' END) AS diff,
        |  u.ux AS cx, u.uy AS cy
        |FROM ups u WHERE NOT EXISTS (
        |  SELECT 1 FROM osm o
        |  WHERE o.ncat = u.cat
        |    AND ABS(u.ux-o.ox) <= 250 AND ABS(u.uy-o.oy) <= 250
        |    AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 250)""".stripMargin,

    "q_ds_anlaggningsomrade_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    o_orderkey%3 AS cat
        |  FROM orders),
        |osm AS (
        |  SELECT k, cat AS ncat,
        |    ux + (CASE WHEN k%10=1 THEN 999 WHEN k%10=2 THEN 1001
        |      WHEN k%10=3 THEN 600 ELSE k%150 END) AS ox,
        |    uy + (CASE WHEN k%10 IN (1,2,3) THEN 0 ELSE k%100 END) AS oy
        |  FROM b WHERE k%10 <> 0)
        |SELECT u.k AS item_id, CAST(NULL AS BIGINT) AS osm_id,
        |  CAST(CASE WHEN u.cat=1 THEN 7 ELSE 18 END AS BIGINT) AS layer_id,
        |  (CASE u.cat WHEN 0 THEN 'Vintersportanläggning'
        |    WHEN 1 THEN 'Skjultfält' ELSE 'Motorsportanläggning' END)
        |    || ' saknas' AS title,
        |  'Enligt Lantmäteriets 1:50 000 karta ska det finnas ett objekt med de föreslagna taggarna här' AS description,
        |  CASE u.cat WHEN 0 THEN 'landuse=winter_sports'
        |    WHEN 1 THEN 'leisure=pitch;sport=shooting'
        |    ELSE 'leisure=stadium;sport=motor' END AS diff,
        |  u.ux AS cx, u.uy AS cy
        |FROM b u WHERE NOT EXISTS (
        |  SELECT 1 FROM osm o
        |  WHERE o.ncat = u.cat
        |    AND ABS(u.ux-o.ox) <= 1000 AND ABS(u.uy-o.oy) <= 1000
        |    AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy))
        |        <= (CASE WHEN u.cat=0 THEN 1000 ELSE 500 END))""".stripMargin)
}
