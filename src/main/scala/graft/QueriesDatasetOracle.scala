package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * A FULL reference dataset view behind the DuckDB oracle (VERDICT r2 #3):
 * `trees_gavle` (14-v_deviation_trees_gavle.sql) driven END TO END through
 * the production code — species CASE ladder parsed from the
 * `original_attributes` JSON, ST_Within municipality filter, 5 m
 * distance-only best match (rank-1, pinned ties), tag_diff, titles and
 * post-filter — on inputs synthesized with modular arithmetic that DuckDB
 * replays verbatim. Coordinates are integral doubles, so SQRT distances and
 * their ordering are bit-exact in both engines; the oracle recomputes the
 * expected deviations from first principles (it never sees the Spark code's
 * intermediate results).
 *
 * Fixture shape (all from `orders.o_orderkey` = k):
 *  - upstream item k at (k*48271 % 900000, k*69621 % 900000), SLAKTE cycling
 *    through 8 genera (two of which the ladder maps to bare `natural=tree`),
 *    NAME/NAMN exercising every species branch incl. the startsWith ones;
 *  - an OSM tree near item k except k%10==0 (no tree -> "missing") and
 *    k%10==5 (offset 6 m > the 5 m radius -> "missing" via the distance
 *    gate); otherwise offset (k%4, k%3), inside the radius;
 *  - OSM tags: k%6==0 carries the correct genus (diff drops it), k%6==1 a
 *    wrong genus (diff keeps it), else bare natural=tree;
 *  - the "Gävle" polygon is a rectangle cutting off x > 820000.5: trees
 *    beyond it are filtered by the ST_Within municipality gate, turning
 *    their items into "missing" rows — the PiP filter sits behind the
 *    oracle too;
 *  - items whose ladder output is exactly the OSM tags (bare-tree genera
 *    matched by k%6 in {0,2..5}) produce an EMPTY diff and are dropped by
 *    the post-filter — also oracle-checked (their absence).
 */
object QueriesDatasetOracle {

  /** deterministic per-key fixture base (orders keys -> positions + genus) */
  private def base(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(900000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(900000L)).cast("double"))
      .withColumn("slakte", element_at(
        array(lit("Acer"), lit("Malus"), lit("Pinus"), lit("Sorbus"),
          lit("Tilia"), lit("Ulmus"), lit("Björk"), lit("")),
        (pmod(col("k"), lit(8L)) + 1).cast("int")))

  /** upstream.item rows for dataset 5 — attributes as the JSON the
    * production ladder parses with get_json_object. */
  private def items(b: DataFrame): DataFrame =
    b.select(col("k").as("id"), lit(5L).as("dataset_id"),
      to_json(map(
        lit("SLAKTE"), col("slakte"),
        lit("NAME"),
        when(pmod(col("k"), lit(3L)) === 0, "Acer campestre")
          .when(pmod(col("k"), lit(3L)) === 1, "Acer tataricum ssp. ginnala"),
        lit("NAMN"),
        when(pmod(col("k"), lit(5L)) === 0, "Tilius cordata")
          .when(pmod(col("k"), lit(5L)) === 1, "Tilius platyphyllos")
          .when(pmod(col("k"), lit(5L)) === 2, "Tilius tomentosa")
          .when(pmod(col("k"), lit(5L)) === 3, "Tilius x europaea Pallida")))
        .as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  /** osm.element tree nodes near the items (see object scaladoc). */
  private def osmTrees(b: DataFrame): DataFrame = {
    val dx = when(pmod(col("k"), lit(10L)) === 5, lit(6L))
      .otherwise(pmod(col("k"), lit(4L)))
    val dy = when(pmod(col("k"), lit(10L)) === 5, lit(0L))
      .otherwise(pmod(col("k"), lit(3L)))
    val r = pmod(col("k"), lit(6L))
    val tags =
      when(r === 0, map(lit("natural"), lit("tree"), lit("genus"), col("slakte")))
        .when(r === 1, map(lit("natural"), lit("tree"), lit("genus"), lit("Fel")))
        .otherwise(map(lit("natural"), lit("tree")))
    b.filter(pmod(col("k"), lit(10L)) =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        tags.as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  /** the Gävle stand-in: one rectangle with half-open .5 bounds so integral
    * coordinates never land exactly on the boundary (within is then a clean
    * `ox <= 820000` in the oracle). */
  private def munis(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("2180", "Gävle")).toDF("code", "name")
      .withColumn("geom",
        stEnvelopeWkb(lit(-0.5), lit(-0.5), lit(820000.5), lit(900010.5)))
  }

  /** render a suggested_tags map as `k=v;...` in fixed sorted-key order —
    * the oracle-hashable projection of the diff (values are never null in
    * this fixture, so k=v is lossless). */
  private def diffStr(m: Column): Column = {
    def frag(key: String): Column =
      when(map_contains_key(m, lit(key)), concat(lit(key + "="), m(key)))
    concat_ws(";", frag("genus"), frag("genus:wikidata"), frag("natural"),
      frag("species"), frag("species:wikidata"))
  }

  // =========================================================================
  // preschools_scb — 12-v-deviation_preschools_scb.sql behind the oracle:
  // alternatives explode + min-diff pick (W2), fix_name, the tag-alternatives
  // MATCH BLINDNESS quirk (name tier never fires -> 100 m effective radius),
  // the municipality WHERE-guard (items with no same-municipality candidate
  // VANISH — they do not become "missing"), and the anti leg dying at the
  // post-filter (diff of NULL tags is empty). The oracle therefore contains
  // ONLY "Förskola saknar taggar" rows — asserting the quirks by absence.
  // =========================================================================

  /** municipalities = 4 quadrant rectangles (codes by quadrant); .5 bounds so
    * integral coordinates are never on a boundary. Points past 1000000 (an
    * offset OSM node on the far edge) fall outside every polygon -> NULL code
    * -> guard-filtered, mirrored in the oracle's CASE returning NULL.
    * NOTE the coordinate EXACTLY 500000 sits in the one-unit gap BETWEEN
    * quadrants ((-0.5 + 500000 = 499999.5) < 500000 < 500000.5) and belongs
    * to NO municipality — the oracle CASEs must say `<= 499999`, not
    * `<= 500000` (the sf0.1 sweep caught exactly this: sf0.001/sf0.01 keys
    * never land on the stripe, sf0.1 keys do). QueriesSchoolsOracle got
    * this right from the start (its scaladoc states the rule). */
  private[graft] def quadMunis(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("0180", -0.5, -0.5), ("1480", 500000.5, -0.5),
        ("2180", -0.5, 500000.5), ("2580", 500000.5, 500000.5))
      .toDF("code", "x0", "y0")
      .withColumn("geom", stEnvelopeWkb(col("x0"), col("y0"),
        col("x0") + 500000.0, col("y0") + 500000.0))
      .select("code", "geom")
  }

  private def pBase(s: SparkSession, dir: String): DataFrame = {
    val m4 = pmod(col("k"), lit(4L)); val m3 = pmod(col("k"), lit(3L))
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      // RAW attribute values — the production pipeline runs fix_name on them
      .withColumn("nm_raw",
        when(m4 === 0, "förskolan solstrålen ab")
          .when(m4 === 1, "norrgårdens förskola")
          .when(m4 === 2, "BARNENS HUS"))
      .withColumn("op_raw",
        when(m3 === 0, "gävle kommun").when(m3 === 1, "ab cde"))
      // hand-computed fix_name outputs as LITERALS: the OSM fixture carries
      // these, so a fix_name regression shows as an oracle diff mismatch
      // instead of cancelling out on both sides
      .withColumn("nm_exp",
        when(m4 === 0, "Förskolan Solstrålen AB")
          .when(m4 === 1, "Norrgårdens Förskola")
          .when(m4 === 2, "Barnens Hus"))
      .withColumn("op_exp",
        when(m3 === 0, "Gävle kommun").when(m3 === 1, "AB Cde"))
  }

  private def pItems(b: DataFrame): DataFrame =
    b.select(col("k").as("id"), lit(110L).as("dataset_id"),
      to_json(map(
        lit("Firmabenämning"), col("nm_raw"),
        lit("Företagsnamn"), col("op_raw"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  /** OSM preschools: offsets by k%10 — {1,9}: tiny; 2/3/6/7: 60/99/70/50 m
    * (inside the 100 m gate); 4: 101 m (outside); 5: 150 m WITH the matching
    * name (the blind-match quirk: would match at <=500 m if the name tier
    * could fire — it must not); 8: pushed just past the quadrant's east edge
    * (guard kill); 0: no node at all. */
  private def pOsm(b: DataFrame): DataFrame = {
    val m10 = pmod(col("k"), lit(10L))
    val m7 = pmod(col("k"), lit(7L)); val m11 = pmod(col("k"), lit(11L))
    val dx = when(m10 === 1 || m10 === 9, pmod(col("k"), lit(4L)))
      .when(m10 === 2, 60L).when(m10 === 3, 99L).when(m10 === 4, 101L)
      .when(m10 === 5, 150L).when(m10 === 6, 0L).when(m10 === 7, 30L)
      .when(m10 === 8, lit(500000L) - pmod(col("ux").cast("long"), lit(500000L)) + 1L)
    val dy = when(m10 === 1 || m10 === 9, pmod(col("k"), lit(3L)))
      .when(m10 === 6, 70L).when(m10 === 7, 40L).otherwise(0L)
    val amenity = when(pmod(col("k"), lit(5L)) === 0, "childcare")
      .otherwise("kindergarten")
    val osmName = when(m7 === 0 || m10 === 5, col("nm_exp"))
      .when(m7 === 1, "Annat Namn").when(m7 === 2, lower(col("nm_exp")))
    val osmOp = when(m11 === 0, "GÄVLE KOMMUN").when(m11 === 1, "Fel AB")
    b.filter(m10 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map_filter(map(
          lit("amenity"), amenity, lit("name"), osmName, lit("operator"), osmOp),
          (_, v) => v.isNotNull).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private def pDiffStr(m: Column): Column = {
    def frag(key: String): Column =
      when(map_contains_key(m, lit(key)), concat(lit(key + "="), m(key)))
    concat_ws(";", frag("amenity"), frag("name"), frag("operator"))
  }

  // =========================================================================
  // vindbrukskollen_turbines — 36-v_deviation_vindbrukskollen_turbines.sql
  // behind the oracle: the third guard variant (muni equality in the JOIN
  // CONDITION — the left extension SURVIVES, so "missing" rows appear even
  // when the guard kills every candidate) plus a LIVE anti leg ("possibly
  // removed", kept by the keep-all-three-states post-filter), the ref-as-name
  // tier (condition case-INsensitive at 100 m, score case-SENSITIVE — a
  // lowercase ref matches but scores in the other tier AND lands in the
  // diff), upstream attribute predicates (ARENDESTATUS/STATUS), and the
  // generator:output:electricity first-token float-compare policy
  // ('2.500 MW' vs '2,5'->'2.5 MW' is NOT a deviation).
  // =========================================================================

  private def tBase(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("vref", concat(lit("V-"), col("k")))

  private def tItems(b: DataFrame): DataFrame = {
    val m2 = pmod(col("k"), lit(2L)); val m3 = pmod(col("k"), lit(3L))
    val m4 = pmod(col("k"), lit(4L)); val m5 = pmod(col("k"), lit(5L))
    val m6 = pmod(col("k"), lit(6L))
    b.select(col("k").as("id"), lit(462L).as("dataset_id"),
      to_json(map(
        lit("ARENDESTATUS"), when(m6 === 0, "3").otherwise("4"),
        lit("STATUS"), when(m6 === 0, "Ansökt").otherwise("Uppfört"),
        lit("FABRIKAT"), when(m2 === 0, " Vestas "),
        lit("MAXEFFEKT"), when(m3 === 0, "2,5").when(m3 === 1, "3"),
        lit("MODELL"), when(m4 === 0, " V90,Mk2 ").when(m4 === 1, "-").when(m4 === 2, ""),
        lit("NAVHOJD"), when(m2 === 1, "80"),
        lit("ORGNAMN"), when(m5 === 0, "Projektör ej registrerad hos LST")
          .when(m5 === 1, " Eolus Vind AB "),
        lit("ROTDIAMETE"), lit("90"),
        lit("TOTALHOJD"), lit("125"),
        lit("UPPFORT"), when(m5 === 0, "20150612").when(m5 === 1, "19000101")
          .when(m5 === 2, "2015"),
        lit("VERKID"), col("vref"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))
  }

  /** OSM turbines by k%10 — 0: none (missing); {1,9}: tiny offset; 2: 20 m;
    * 3: 26 m (matches ONLY via a k%7-given ref tier); 4/8: 60 m (8 forces an
    * exact ref, 4 leaves it to k%7); 5: 60 m with a LOWERCASE ref (condition
    * matches, score takes the other tier, ref lands in the diff); 6: 15 m;
    * 7: pushed past the quadrant's east edge WITH an exact ref — the
    * condition fires but the muni guard kills it, so the item turns
    * "missing" while the turbine stays OUT of the anti leg (it has a
    * candidate). */
  private def tOsm(b: DataFrame): DataFrame = {
    val m10 = pmod(col("k"), lit(10L)); val m7 = pmod(col("k"), lit(7L))
    val m11 = pmod(col("k"), lit(11L))
    val dx = when(m10 === 1 || m10 === 9, pmod(col("k"), lit(4L)))
      .when(m10 === 2, 20L).when(m10 === 3, 26L)
      .when(m10 === 4 || m10 === 5 || m10 === 8, 60L)
      .when(m10 === 6, 0L)
      .when(m10 === 7, lit(500000L) - pmod(col("ux").cast("long"), lit(500000L)) + 1L)
    val dy = when(m10 === 1 || m10 === 9, pmod(col("k"), lit(3L)))
      .when(m10 === 6, 15L).otherwise(0L)
    val osmRef = when(m10 === 5, lower(col("vref")))
      .when(m10 === 7 || m10 === 8, col("vref"))
      .when(m7 === 0, col("vref")).when(m7 === 1, lower(col("vref")))
    val osmGoe = when(m11 === 0, "2.500 MW").when(m11 === 1, "9 MW")
    b.filter(m10 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map_filter(map(
          lit("power"), lit("generator"),
          lit("generator:method"), lit("wind_turbine"),
          lit("ref"), osmRef,
          lit("generator:output:electricity"), osmGoe),
          (_, v) => v.isNotNull).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private val turbineDiffKeys = Seq(
    "generator:method", "generator:output:electricity", "generator:source",
    "generator:type", "height", "height:hub", "manufacturer", "model",
    "operator", "power", "ref", "rotor:diameter", "start_date")

  private def tDiffStr(m: Column): Column = {
    val frags = turbineDiffKeys.map(key =>
      when(map_contains_key(m, lit(key)), concat(lit(key + "="), m(key))))
    concat_ws(";", frags: _*)
  }

  // =========================================================================
  // anlaggningsomradespunkt_topo50 — 26-v_deviation_*.sql behind the oracle:
  // the FUSED single-join topo50 path (11 categories in one cell join keyed
  // (cell, category); Topo50.matchView), per-category OSM predicates and
  // alternatives, computed layers, and the computed titles with the
  // '^[^, ]+' head regex ('Skjutbana, mindre' -> 'Skjutbana'). Category
  // semantics that matter and are oracle-encoded: categories whose passing
  // OSM node always equals one alternative exactly produce NO matched rows
  // (empty diff, post-filtered); Travbana/Galoppbana nodes with
  // sport=equestrian suggest sport=horse_racing; Gästhamn nodes whose
  // mooring merely CONTAINS 'guest' suggest mooring=guest; Hamn nodes
  // tagged harbour=* suggest industrial=port; missing rows carry the FIRST
  // alternative (position tie-break among equal-size alternatives).
  // =========================================================================

  private val apAndamal = Seq(
    "Idrottsanläggning", "Skjutbana, mindre", "Skjutbana", "Badplats",
    "Travbana", "Galoppbana", "Sjöräddningsstation", "Småbåtshamn",
    "Gästhamn", "Bollplan", "Fotbollsplan", "Hamn", "Campingplats")

  private def apBase(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("m13", pmod(col("k"), lit(13L)))
      .withColumn("andamal", element_at(
        array(apAndamal.map(lit): _*), (col("m13") + 1).cast("int")))

  private def apItems(b: DataFrame): DataFrame =
    b.select(col("k").as("id"), lit(139L).as("dataset_id"),
      to_json(map(lit("andamal"), col("andamal"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  private def tm(kv: (String, String)*): Column =
    map(kv.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  private def apOsm(b: DataFrame): DataFrame = {
    val m10 = pmod(col("k"), lit(10L)); val m3 = pmod(col("k"), lit(3L))
    val m13 = col("m13")
    val dx = when(m10 === 2, 300L).when(m10 === 3, 499L).when(m10 === 4, 501L)
      .when(m10 === 5, 200L).when(m10 === 7, 350L).when(m10 === 8, 100L)
      .when(m10 === 6, 0L).otherwise(pmod(col("k"), lit(4L)))
    val dy = when(m10 === 6, 450L)
      .when(m10 === 1 || m10 === 9, pmod(col("k"), lit(3L))).otherwise(0L)
    val tags =
      when(m13 === 0 && m3 === 0, tm("leisure" -> "sports_centre"))
        .when(m13 === 0 && m3 === 1, tm("leisure" -> "stadium"))
        .when(m13 === 0, tm("leisure" -> "pitch"))
        .when(m13 === 1 || m13 === 2, tm("leisure" -> "pitch", "sport" -> "shooting"))
        .when(m13 === 3 && m3 === 0, tm("leisure" -> "bathing_place"))
        .when(m13 === 3, tm("leisure" -> "swimming_area"))
        .when((m13 === 4 || m13 === 5) && m3 === 0, tm("leisure" -> "track", "sport" -> "horse_racing"))
        .when((m13 === 4 || m13 === 5) && m3 === 1, tm("leisure" -> "track", "sport" -> "equestrian"))
        .when(m13 === 4 || m13 === 5, tm("leisure" -> "pitch", "sport" -> "equestrian"))
        .when(m13 === 6 && m3 === 0, tm("emergency" -> "water_rescue"))
        .when(m13 === 6, tm("emergency" -> "rescue_station"))
        .when(m13 === 7, tm("leisure" -> "marina"))
        .when(m13 === 8 && m3 === 0, tm("leisure" -> "marina", "mooring" -> "guest"))
        .when(m13 === 8 && m3 === 1, tm("man_made" -> "pier", "mooring" -> "guest_harbour"))
        .when(m13 === 8, tm("man_made" -> "quay", "mooring" -> "guest berth"))
        .when(m13 === 9, tm("leisure" -> "pitch"))
        .when(m13 === 10, tm("leisure" -> "pitch", "sport" -> "soccer"))
        .when(m13 === 11 && m3 === 0, tm("industrial" -> "port"))
        .when(m13 === 11, tm("harbour" -> "yes"))
        .when(m13 === 12 && m3 === 0, tm("tourism" -> "camp_site"))
        .otherwise(tm("tourism" -> "caravan_site"))
    b.filter(m10 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        tags.as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private def apDiffStr(m: Column): Column = {
    val frags = Seq("emergency", "harbour", "industrial", "leisure",
      "man_made", "mooring", "sport", "tourism").map(key =>
      when(map_contains_key(m, lit(key)), concat(lit(key + "="), m(key))))
    concat_ws(";", frags: _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ds_topo50_oracle" -> ((s, dir) => {
      val b = apBase(s, dir)
      val dev = graft.engine.Topo50.deviations(
        graft.engine.Topo50.matchView(apOsm(b), apItems(b)))
      dev.select(
        get(col("upstream_item_ids"), lit(0)).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("layer_id"), col("title"), col("description"),
        apDiffStr(col("suggested_tags")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }),

    "q_ds_turbines_oracle" -> ((s, dir) => {
      val b = tBase(s, dir)
      val dev = graft.engine.ReferenceDatasets.turbinesDeviations(
        graft.engine.ReferenceDatasets.turbinesMatch(
          tOsm(b), tItems(b), quadMunis(s)))
      dev.select(
        get(col("upstream_item_ids"), lit(0)).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        tDiffStr(col("suggested_tags")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }),

    "q_ds_preschools_oracle" -> ((s, dir) => {
      val b = pBase(s, dir)
      val dev = graft.engine.ReferenceDatasets.preschoolsDeviations(
        graft.engine.ReferenceDatasets.preschoolsMatch(
          pOsm(b), pItems(b), quadMunis(s)))
      dev.select(
        element_at(col("upstream_item_ids"), 1).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        pDiffStr(col("suggested_tags")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }),

    "q_ds_trees_oracle" -> ((s, dir) => {
      val b = base(s, dir)
      val dev = graft.engine.ReferenceDatasets.treesGavleDeviations(
        graft.engine.ReferenceDatasets.treesGavleMatch(
          osmTrees(b), items(b), munis(s)))
      dev.select(
        element_at(col("upstream_item_ids"), 1).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        diffStr(col("suggested_tags")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }))

  // The oracle recomputes the expected deviation rows directly from the
  // modular fixture definition: ladder outcome (g/gw/sp/sw columns), the
  // municipality cutoff as a coordinate bound, the 5 m best match as a
  // windowed self-join, tag_diff as per-key IS DISTINCT FROM (none of the
  // species keys are aliased, so canonicalization is the identity here —
  // the alias machinery is golden-tested separately in TagsSpec).
  val oracle: Map[String, String] = Map(
    "q_ds_topo50_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    o_orderkey%13 AS m13, o_orderkey%3 AS m3, o_orderkey%10 AS m10
        |  FROM orders),
        |ups AS (
        |  SELECT k, ux, uy, m13,
        |    CASE m13 WHEN 0 THEN 'Idrottsanläggning' WHEN 1 THEN 'Skjutbana, mindre'
        |      WHEN 2 THEN 'Skjutbana' WHEN 3 THEN 'Badplats' WHEN 4 THEN 'Travbana'
        |      WHEN 5 THEN 'Galoppbana' WHEN 6 THEN 'Sjöräddningsstation'
        |      WHEN 7 THEN 'Småbåtshamn' WHEN 8 THEN 'Gästhamn' WHEN 9 THEN 'Bollplan'
        |      WHEN 10 THEN 'Fotbollsplan' WHEN 11 THEN 'Hamn' ELSE 'Campingplats' END AS andamal
        |  FROM b),
        |osm AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN m10=2 THEN 300 WHEN m10=3 THEN 499 WHEN m10=4 THEN 501
        |      WHEN m10=5 THEN 200 WHEN m10=7 THEN 350 WHEN m10=8 THEN 100
        |      WHEN m10=6 THEN 0 ELSE k%4 END) AS ox,
        |    uy + (CASE WHEN m10=6 THEN 450 WHEN m10 IN (1,9) THEN k%3 ELSE 0 END) AS oy,
        |    CASE WHEN m13=0 AND m3=0 THEN 'sports_centre' WHEN m13=0 AND m3=1 THEN 'stadium'
        |         WHEN m13=0 THEN 'pitch' WHEN m13 IN (1,2) THEN 'pitch'
        |         WHEN m13=3 AND m3=0 THEN 'bathing_place' WHEN m13=3 THEN 'swimming_area'
        |         WHEN m13 IN (4,5) AND m3 IN (0,1) THEN 'track' WHEN m13 IN (4,5) THEN 'pitch'
        |         WHEN m13=7 THEN 'marina' WHEN m13=8 AND m3=0 THEN 'marina'
        |         WHEN m13 IN (9,10) THEN 'pitch' END AS le,
        |    CASE WHEN m13 IN (1,2) THEN 'shooting'
        |         WHEN m13 IN (4,5) AND m3=0 THEN 'horse_racing'
        |         WHEN m13 IN (4,5) THEN 'equestrian'
        |         WHEN m13=10 THEN 'soccer' END AS sp,
        |    CASE WHEN m13=8 AND m3=1 THEN 'pier' WHEN m13=8 AND m3=2 THEN 'quay' END AS mm,
        |    CASE WHEN m13=8 AND m3=0 THEN 'guest' WHEN m13=8 AND m3=1 THEN 'guest_harbour'
        |         WHEN m13=8 THEN 'guest berth' END AS mo,
        |    CASE WHEN m13=11 AND m3=0 THEN 'port' END AS ind,
        |    (m13=11 AND m3<>0) AS ha,
        |    CASE WHEN m13=6 AND m3=0 THEN 'water_rescue' WHEN m13=6 THEN 'rescue_station' END AS em,
        |    CASE WHEN m13=12 AND m3=0 THEN 'camp_site' WHEN m13=12 THEN 'caravan_site' END AS tou
        |  FROM b WHERE m10 <> 0),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.le, o.sp, o.mm, o.mo, o.ind, o.ha, o.tou,
        |    o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM ups u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 500 AND ABS(u.uy-o.oy) <= 500
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 500
        |   AND ((u.m13=0 AND o.le IN ('stadium','pitch','sports_centre','sports_hall'))
        |     OR (u.m13 IN (1,2) AND o.le='pitch' AND o.sp='shooting')
        |     OR (u.m13=3 AND o.le IN ('bathing_place','swimming_area'))
        |     OR (u.m13 IN (4,5) AND o.le IN ('track','sports_centre','pitch')
        |         AND o.sp IN ('horse_racing','equestrian'))
        |     OR (u.m13=6 AND o.em IN ('water_rescue','rescue_station'))
        |     OR (u.m13=7 AND o.le='marina')
        |     OR (u.m13=8 AND (o.mm IN ('pier','quay') OR o.le='marina')
        |         AND o.mo LIKE '%guest%')
        |     OR (u.m13=9 AND o.le='pitch')
        |     OR (u.m13=10 AND o.le='pitch' AND o.sp='soccer')
        |     OR (u.m13=11 AND (o.ind='port' OR o.ha))
        |     OR (u.m13=12 AND o.tou IN ('camp_site','caravan_site')))),
        |best AS (
        |  SELECT uk, osm_id, sp, mo, ind, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand)
        |  WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CAST(CASE WHEN u.andamal IN ('Campingplats','Gästhamn','Småbåtshamn','Sjöräddningsstation') THEN 18
        |         WHEN u.andamal = 'Hamn' THEN 19
        |         WHEN u.andamal IN ('Fotbollsplan','Bollplan','Travbana','Galoppbana',
        |                            'Skjutbana, mindre','Skjutbana','Idrottsanläggning') THEN 9
        |         WHEN u.andamal = 'Badplats' THEN 11 END AS BIGINT) AS layer_id,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN REGEXP_EXTRACT(u.andamal, '^[^, ]+') || ' saknas'
        |         ELSE REGEXP_EXTRACT(u.andamal, '^[^, ]+') || ' saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Lantmäteriets 1:50 000 karta ska det finnas en '
        |              || LOWER(REGEXP_EXTRACT(u.andamal, '^[^, ]+')) || ' här'
        |         ELSE 'Följande taggar, härledda ur Lantmäteriets 1:50 000 karta, saknas här'
        |         END AS description,
        |    CASE WHEN w.osm_id IS NULL THEN
        |      CASE u.m13 WHEN 0 THEN 'leisure=sports_centre'
        |        WHEN 1 THEN 'leisure=pitch;sport=shooting'
        |        WHEN 2 THEN 'leisure=pitch;sport=shooting'
        |        WHEN 3 THEN 'leisure=bathing_place'
        |        WHEN 4 THEN 'leisure=track;sport=horse_racing'
        |        WHEN 5 THEN 'leisure=track;sport=horse_racing'
        |        WHEN 6 THEN 'emergency=water_rescue'
        |        WHEN 7 THEN 'leisure=marina'
        |        WHEN 8 THEN 'leisure=marina;mooring=guest'
        |        WHEN 9 THEN 'leisure=pitch'
        |        WHEN 10 THEN 'leisure=pitch;sport=soccer'
        |        WHEN 11 THEN 'industrial=port'
        |        ELSE 'tourism=camp_site' END
        |    ELSE
        |      CASE WHEN u.m13 IN (4,5) AND w.sp = 'equestrian' THEN 'sport=horse_racing'
        |           WHEN u.m13 = 8 AND w.mo <> 'guest' THEN 'mooring=guest'
        |           WHEN u.m13 = 11 AND w.ind IS DISTINCT FROM 'port' THEN 'industrial=port'
        |           ELSE '' END
        |    END AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM ups u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, layer_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin,

    "q_ds_turbines_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    'V-' || CAST(o_orderkey AS VARCHAR) AS ref
        |  FROM orders),
        |ups AS (
        |  SELECT k, ux, uy, ref,
        |    CASE WHEN ux <= 499999 AND uy <= 499999 THEN '0180'
        |         WHEN ux >= 500001 AND ux <= 1000000 AND uy <= 499999 THEN '1480'
        |         WHEN ux <= 499999 AND uy >= 500001 AND uy <= 1000000 THEN '2180'
        |         WHEN ux >= 500001 AND ux <= 1000000
        |          AND uy >= 500001 AND uy <= 1000000 THEN '2580' END AS q,
        |    CASE WHEN k%2=0 THEN 'Vestas' END AS man,
        |    CASE WHEN k%3=0 THEN '2.5 MW' WHEN k%3=1 THEN '3 MW' END AS goe,
        |    CASE WHEN k%3=0 THEN 2.5 WHEN k%3=1 THEN 3.0 END AS goe_f,
        |    CASE WHEN k%4=0 THEN 'V90.Mk2' END AS model,
        |    CASE WHEN k%2=1 THEN '80' END AS hub,
        |    CASE WHEN k%5=1 THEN 'Eolus Vind AB' END AS org,
        |    CASE WHEN k%5=0 THEN '2015-06-12' END AS sdate
        |  FROM b WHERE k%6 <> 0),
        |osm AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%10 IN (1,9) THEN k%4 WHEN k%10=2 THEN 20
        |      WHEN k%10=3 THEN 26 WHEN k%10 IN (4,5,8) THEN 60 WHEN k%10=6 THEN 0
        |      WHEN k%10=7 THEN 500000 - (CAST(ux AS BIGINT)%500000) + 1 END) AS ox,
        |    uy + (CASE WHEN k%10 IN (1,9) THEN k%3 WHEN k%10=6 THEN 15 ELSE 0 END) AS oy,
        |    CASE WHEN k%10=5 THEN LOWER(ref) WHEN k%10 IN (7,8) THEN ref
        |         WHEN k%7=0 THEN ref WHEN k%7=1 THEN LOWER(ref) END AS oref,
        |    CASE WHEN k%11=0 THEN 2.5 WHEN k%11=1 THEN 9.0 END AS ogoe_f
        |  FROM b WHERE k%10 <> 0),
        |oq AS (
        |  SELECT *,
        |    CASE WHEN ox >= 0 AND ox <= 499999 AND oy >= 0 AND oy <= 499999 THEN '0180'
        |         WHEN ox >= 500001 AND ox <= 1000000 AND oy >= 0 AND oy <= 499999 THEN '1480'
        |         WHEN ox >= 0 AND ox <= 499999 AND oy >= 500001 AND oy <= 1000000 THEN '2180'
        |         WHEN ox >= 500001 AND ox <= 1000000
        |          AND oy >= 500001 AND oy <= 1000000 THEN '2580' END AS q
        |  FROM osm),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oref, o.ogoe_f, o.ox, o.oy, o.q AS o_q,
        |    u.q AS u_q,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist,
        |    CASE WHEN o.oref = u.ref
        |         THEN 100 + SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy))
        |         ELSE 25 + SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) END AS score
        |  FROM ups u JOIN oq o
        |    ON ABS(u.ux-o.ox) <= 100 AND ABS(u.uy-o.oy) <= 100
        |   AND (SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 25
        |     OR (o.oref IS NOT NULL AND LOWER(o.oref) = LOWER(u.ref)
        |         AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 100))),
        |best AS (
        |  SELECT uk, osm_id, oref, ogoe_f, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY score, osm_id) AS rn
        |    FROM cand WHERE u_q = o_q)
        |  WHERE rn = 1),
        |leg1 AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Vindkraftverk saknas'
        |         ELSE 'Vindkraftverk saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Vindbrukskollen ska det finnas ett vindkraftverk här'
        |         ELSE 'Följande taggar, härledda från Vindbrukskollen, saknas på vindkraftverket här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      CASE WHEN w.osm_id IS NULL THEN 'generator:method=wind_turbine' END,
        |      CASE WHEN u.goe IS NOT NULL
        |            AND (w.osm_id IS NULL OR w.ogoe_f IS DISTINCT FROM u.goe_f)
        |           THEN 'generator:output:electricity=' || u.goe END,
        |      'generator:source=wind',
        |      'generator:type=horizontal_axis',
        |      'height=125',
        |      CASE WHEN u.hub IS NOT NULL THEN 'height:hub=' || u.hub END,
        |      CASE WHEN u.man IS NOT NULL THEN 'manufacturer=' || u.man END,
        |      CASE WHEN u.model IS NOT NULL THEN 'model=' || u.model END,
        |      CASE WHEN u.org IS NOT NULL THEN 'operator=' || u.org END,
        |      CASE WHEN w.osm_id IS NULL THEN 'power=generator' END,
        |      CASE WHEN w.osm_id IS NULL OR (w.oref IS DISTINCT FROM u.ref)
        |           THEN 'ref=' || u.ref END,
        |      'rotor:diameter=90',
        |      CASE WHEN u.sdate IS NOT NULL THEN 'start_date=' || u.sdate END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM ups u LEFT JOIN best w ON u.k = w.uk),
        |antileg AS (
        |  SELECT CAST(NULL AS BIGINT) AS item_id, o.osm_id,
        |    'Vindkraftverk möjligen rivet' AS title,
        |    'Enligt Vindbrukskollen finns det inget vindkraftverk här, det kan ha rivits' AS description,
        |    '' AS diff, o.ox AS cx, o.oy AS cy
        |  FROM oq o
        |  WHERE NOT EXISTS (SELECT 1 FROM cand c WHERE c.osm_id = o.osm_id))
        |SELECT item_id, osm_id, title, description, diff, cx, cy FROM leg1
        |WHERE osm_id IS NULL OR diff <> ''
        |UNION ALL
        |SELECT item_id, osm_id, title, description, diff, cx, cy FROM antileg""".stripMargin,

    "q_ds_preschools_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE o_orderkey%4 WHEN 0 THEN 'Förskolan Solstrålen AB'
        |      WHEN 1 THEN 'Norrgårdens Förskola' WHEN 2 THEN 'Barnens Hus' END AS nm,
        |    CASE o_orderkey%3 WHEN 0 THEN 'Gävle kommun' WHEN 1 THEN 'AB Cde' END AS op
        |  FROM orders),
        |uq AS (
        |  SELECT *,
        |    CASE WHEN ux <= 499999 AND uy <= 499999 THEN '0180'
        |         WHEN ux >= 500001 AND ux <= 1000000 AND uy <= 499999 THEN '1480'
        |         WHEN ux <= 499999 AND uy >= 500001 AND uy <= 1000000 THEN '2180'
        |         WHEN ux >= 500001 AND ux <= 1000000
        |          AND uy >= 500001 AND uy <= 1000000 THEN '2580' END AS q
        |  FROM b),
        |osm AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%10 IN (1,9) THEN k%4 WHEN k%10=2 THEN 60
        |      WHEN k%10=3 THEN 99 WHEN k%10=4 THEN 101 WHEN k%10=5 THEN 150
        |      WHEN k%10=6 THEN 0 WHEN k%10=7 THEN 30
        |      WHEN k%10=8 THEN 500000 - (CAST(ux AS BIGINT)%500000) + 1 END) AS ox,
        |    uy + (CASE WHEN k%10 IN (1,9) THEN k%3 WHEN k%10=6 THEN 70
        |      WHEN k%10=7 THEN 40 ELSE 0 END) AS oy,
        |    CASE WHEN k%7=0 OR k%10=5 THEN nm WHEN k%7=1 THEN 'Annat Namn'
        |         WHEN k%7=2 THEN LOWER(nm) END AS oname,
        |    CASE WHEN k%11=0 THEN 'GÄVLE KOMMUN' WHEN k%11=1 THEN 'Fel AB' END AS oop
        |  FROM b WHERE k%10 <> 0),
        |oq AS (
        |  SELECT *,
        |    CASE WHEN ox >= 0 AND ox <= 499999 AND oy >= 0 AND oy <= 499999 THEN '0180'
        |         WHEN ox >= 500001 AND ox <= 1000000 AND oy >= 0 AND oy <= 499999 THEN '1480'
        |         WHEN ox >= 0 AND ox <= 499999 AND oy >= 500001 AND oy <= 1000000 THEN '2180'
        |         WHEN ox >= 500001 AND ox <= 1000000
        |          AND oy >= 500001 AND oy <= 1000000 THEN '2580' END AS q
        |  FROM osm),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oname, o.oop, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM uq u JOIN oq o ON u.q = o.q
        |    AND ABS(u.ux-o.ox) <= 100 AND ABS(u.uy-o.oy) <= 100
        |    AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 100),
        |best AS (
        |  SELECT uk, osm_id, oname, oop, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand)
        |  WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    'Förskola saknar taggar' AS title,
        |    'Följande taggar, härledda ur från SCBs register, saknas på förskolan här' AS description,
        |    CONCAT_WS(';',
        |      CASE WHEN u.nm IS NOT NULL AND (w.oname IS DISTINCT FROM u.nm)
        |           THEN 'name=' || u.nm END,
        |      CASE WHEN u.op IS NOT NULL
        |            AND (LOWER(w.oop) IS DISTINCT FROM LOWER(u.op))
        |           THEN 'operator=' || u.op END) AS diff,
        |    w.ox AS cx, w.oy AS cy
        |  FROM uq u JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE diff <> ''""".stripMargin,

    "q_ds_trees_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%900000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%900000 AS DOUBLE) AS uy,
        |    CASE o_orderkey%8 WHEN 0 THEN 'Acer' WHEN 1 THEN 'Malus'
        |      WHEN 2 THEN 'Pinus' WHEN 3 THEN 'Sorbus' WHEN 4 THEN 'Tilia'
        |      WHEN 5 THEN 'Ulmus' WHEN 6 THEN 'Björk' ELSE '' END AS slakte
        |  FROM orders),
        |ups AS (
        |  SELECT k, ux, uy,
        |    CASE WHEN slakte IN ('Acer','Malus','Pinus','Sorbus','Tilia','Ulmus')
        |      THEN slakte END AS g,
        |    CASE WHEN slakte='Acer' AND k%3=2 THEN 'Q42292'
        |         WHEN slakte='Malus' THEN 'Q104819'
        |         WHEN slakte='Pinus' THEN 'Q12024'
        |         WHEN slakte='Sorbus' THEN 'Q157964'
        |         WHEN slakte='Tilia' AND k%5=4 THEN 'Q127849'
        |         WHEN slakte='Ulmus' THEN 'Q131113' END AS gw,
        |    CASE WHEN slakte='Acer' AND k%3=0 THEN 'Acer campestre'
        |         WHEN slakte='Acer' AND k%3=1 THEN 'Acer tataricum'
        |         WHEN slakte='Tilia' AND k%5=0 THEN 'Tilia cordata'
        |         WHEN slakte='Tilia' AND k%5=1 THEN 'Tilia platyphyllos'
        |         WHEN slakte='Tilia' AND k%5=2 THEN 'Tilia tomentosa'
        |         WHEN slakte='Tilia' AND k%5=3 THEN 'Tilia x europaea' END AS sp,
        |    CASE WHEN slakte='Acer' AND k%3=0 THEN 'Q158785'
        |         WHEN slakte='Acer' AND k%3=1 THEN 'Q162728'
        |         WHEN slakte='Tilia' AND k%5=0 THEN 'Q158746'
        |         WHEN slakte='Tilia' AND k%5=1 THEN 'Q156831'
        |         WHEN slakte='Tilia' AND k%5=2 THEN 'Q161382'
        |         WHEN slakte='Tilia' AND k%5=3 THEN 'Q163760' END AS sw
        |  FROM b),
        |osm AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%10=5 THEN 6 ELSE k%4 END) AS ox,
        |    uy + (CASE WHEN k%10=5 THEN 0 ELSE k%3 END) AS oy,
        |    CASE WHEN k%6=0 THEN slakte WHEN k%6=1 THEN 'Fel' END AS og
        |  FROM b
        |  WHERE k%10 <> 0
        |    AND ux + (CASE WHEN k%10=5 THEN 6 ELSE k%4 END) <= 820000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.og, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM ups u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 5 AND ABS(u.uy-o.oy) <= 5
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 5),
        |best AS (
        |  SELECT uk, osm_id, og, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand)
        |  WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, best.osm_id,
        |    CASE WHEN best.osm_id IS NULL THEN 'Träd saknas'
        |         ELSE 'Träd saknar taggar' END AS title,
        |    CASE WHEN best.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas ett träd här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på trädet här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      CASE WHEN u.g IS NOT NULL
        |            AND (best.osm_id IS NULL OR best.og IS DISTINCT FROM u.g)
        |           THEN 'genus=' || u.g END,
        |      CASE WHEN u.gw IS NOT NULL THEN 'genus:wikidata=' || u.gw END,
        |      CASE WHEN best.osm_id IS NULL THEN 'natural=tree' END,
        |      CASE WHEN u.sp IS NOT NULL THEN 'species=' || u.sp END,
        |      CASE WHEN u.sw IS NOT NULL THEN 'species:wikidata=' || u.sw END) AS diff,
        |    CASE WHEN best.osm_id IS NULL THEN u.ux ELSE best.ox END AS cx,
        |    CASE WHEN best.osm_id IS NULL THEN u.uy ELSE best.oy END AS cy
        |  FROM ups u LEFT JOIN best ON u.k = best.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin)
}
