package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._

/**
 * Two more reference dataset views behind the DuckDB oracle (7th and 8th),
 * on the same modular-arithmetic synthesis as QueriesDatasetOracle — the
 * production view code runs end to end and the oracle recomputes the
 * expected deviations from the fixture definition, first principles only.
 *
 * `lifesaving_gavle` (16-v_deviation_lifesaving_gavle.sql) — the quirks this
 * oracle uniquely reaches:
 *  - the `;`-MULTI-VALUE tag predicate (P1): osm_objs keeps a node iff
 *    string_to_array(tags->>'emergency', ';') && {life_ring, rescue_boat,
 *    rescue_ladder} (16:6). Fixture k%7==2 plants 'defibrillator' — a real
 *    emergency value OUTSIDE the list — 1 m away: the node is invisible, the
 *    item turns "missing". k%7==1 plants 'rescue_ladder;defibrillator' whose
 *    SPLIT overlaps the list -> visible, and its value differs from any
 *    upstream CASE output -> 'emergency' lands in the diff.
 *  - the TYP CASE ladder ELSE jsonb_build_object() (16:11-16): 'Okänd' TYP
 *    gives an EMPTY upstream map, so a matched row diffs to {} and is
 *    dropped by the post-filter while the same item unmatched still emits a
 *    "saknas" row with an empty diff — both asserted.
 *  - distance-only 5 m best match (k%9==1 sits at 6 m -> missing), rank-1
 *    ties pinned by osm id, and the ST_Within municipality gate as a
 *    coordinate cutoff (k%9==2 relocated past x=820000.5).
 *
 * `badplatser_gavle` (17-v_deviation_badplatser_gavle.sql) — quirks:
 *  - tag_alternatives on TWO leisure values + the array MATCH BLINDNESS
 *    (17:27: `->>'name'` on a jsonb ARRAY is NULL, so the 250/500 name tier
 *    NEVER fires): fixture k%9==1 plants a node at 260 m carrying the item's
 *    EXACT name — a name-tier-aware engine would match it at <=500 m; the
 *    oracle asserts the item goes "missing" instead.
 *  - min-diff alternative pick (W2): the alternative whose leisure equals
 *    the matched node's is exactly one diff-key smaller -> picked; for
 *    missing rows both alternatives tie and ARRAY ORDER wins
 *    ('bathing_place', the jsonb_array_elements scan order).
 *  - the addr regex split GATUADRESS -> street / housenumber ('12B' suffix
 *    form) / city, PG NULL-on-no-match semantics (no comma -> no addr:city),
 *    TRIM everywhere, and REGEXP_REPLACE(BESKR_KORT,'Välkommen [^!]+!','')
 *    replacing the FIRST occurrence only (k%4==3 carries two).
 *  - the new_website family behind the oracle: equal value -> dropped
 *    (k%14==0), the https->http DOWNGRADE suppression (k%14==1), a genuinely
 *    different URL -> replaced under the ALTERNATIVE key 'website' the old
 *    object uses (k%14==2), and the 3-VALUED-LOGIC quirk: new_website(
 *    'http://…', NULL) is SQL NULL -> an item whose URL is plain http NEVER
 *    suggests a website to a node without one (k%14==1 missing rows), while
 *    https URLs suggest under the PREFERRED alias 'contact:website'.
 */
object QueriesGavleOracle {

  private def kMod(n: Long) = pmod(col("k"), lit(n))

  // ===================== parkeringsautomater_gavle ========================
  //
  // 21-v_deviation_parkeringsautomater_gavle.sql — the quirks this (9th)
  // oracle uniquely reaches:
  //  - jsonb_build_object WITHOUT strip_nulls (21:10-18): the upstream map
  //    always carries a 'ref' key, NULL-VALUED when the source has no name.
  //    tag_diff then treats NULL-vs-present as "delete the OSM tag": a
  //    base-tier node carrying ref='ZZZ' matched to a null-ref item gets a
  //    ref -> NULL suggestion (rendered '__remove__' in the projection,
  //    k%10==4 x k%6==0);
  //  - the DEAD ref tier on null upstream ref: LOWER(osm)=LOWER(NULL) is
  //    SQL NULL, so a null-ref item can only match within 50 m — its exact
  //    80 m ref-carrying node (k%10==1 x k%6==0) goes unseen -> "missing";
  //  - the condition/score CASE-SENSITIVITY SPLIT of the single-name-key
  //    overload (03a-match.sql:27 LOWER= vs :68 plain =): k%10==2 plants an
  //    exact-case ref node at 80 m (scores in the 100 tier: 180) AND a
  //    LOWERCASE-ref node at 81 m (condition fires via LOWER=, score falls
  //    to the 50 tier: 131) — the FARTHER lowercase node wins rank-1.
  // =========================================================================

  private def pBase(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("uref", when(kMod(6) =!= 0,
        concat(lit("P-"), kMod(500).cast("string"))))

  private def pItems(b: DataFrame): DataFrame =
    b.select(col("k").as("id"), lit(33L).as("dataset_id"),
      to_json(struct(col("uref").as("name"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  /** ticket machines by k%10 — 0: none; 1: 80 m exact ref; 2: TWO nodes
    * (80 m exact + 81 m lowercase ref); 3: 40 m no ref; 4: 40 m ref 'ZZZ';
    * 5: 101 m exact ref (beyond both tiers); 6: relocated past the muni
    * cutoff; 7: 60 m exact ref; 8/9: (k%40, k%30) base-tier close. Extra
    * tags: k%13==0 carries payment:debit_cards=yes, k%17==0 currency:SEK=yes
    * (both drop from the diff of whoever matches the node). */
  private def pOsm(b: DataFrame): DataFrame = {
    val m10 = kMod(10)
    val refExact = coalesce(col("uref"), lit("P-none"))
    val dx = when(m10 === 1 || m10 === 2, 80L).when(m10 === 3 || m10 === 4, 40L)
      .when(m10 === 5, 101L)
      .when(m10 === 6, lit(820001L) + kMod(100) - col("ux").cast("long"))
      .when(m10 === 7, 60L).otherwise(kMod(40))
    val dy = when(m10 === 8 || m10 === 9, kMod(30)).otherwise(0L)
    val oref = when(m10 === 1 || m10 === 2 || m10 === 5 || m10 === 7, refExact)
      .when(m10 === 4, "ZZZ")
    def tags(ref: org.apache.spark.sql.Column) = map_filter(map(
      lit("amenity"), lit("vending_machine"),
      lit("vending"), lit("parking_tickets"),
      lit("ref"), ref,
      lit("payment:debit_cards"), when(kMod(13) === 0, "yes"),
      lit("currency:SEK"), when(kMod(17) === 0, "yes")),
      (_, v) => v.isNotNull)
    val main = b.filter(m10 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        tags(oref).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
    val caseProbe = b.filter(m10 === 2)
      .select(lit("n").as("type"), (col("k") + 2000000000L).as("id"),
        tags(lower(refExact)).as("tags"),
        (col("ux") + 81L).cast("double").as("cx"),
        col("uy").as("cy"))
    main.unionByName(caseProbe)
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private val pKeys = Seq("amenity", "currency:SEK", "payment:credit_cards",
    "payment:debit_cards", "payment:others", "ref", "vending")

  // ======================= busshallplatser_gavle ==========================
  //
  // 35-v_deviation_busshallplatser_gavle.sql — the (10th) oracle reaches the
  // last un-oracled match-machinery combination:
  //  - GROUP-COLLAPSE BY GEOMETRY with MULTI-ID arrays (35:8-22): k%8==1
  //    items get a second unit (id k+5e6) at the SAME point — ids collapse
  //    to a sorted 2-array (n_ids asserts it), attributes collapse via MIN
  //    (nulls ignored: the B unit's NULL HPLNR/LAGE never win; its KUR='N'
  //    forces the pair's shelter to MIN('no', A) = 'no');
  //  - REPLACE-ALL 'Gävle ' in the name (k%3==2 embeds the token
  //    mid-string), MIN running BEFORE the replace;
  //  - the production 2-REF overload (name, local_ref) 50/250/500 — the
  //    500 m tier needs BOTH to overlap (k%10==2's wrong local_ref at 400 m
  //    -> missing + anti row; k%10==1 with a NULL-LAGE item -> dead tier);
  //    the 250 m name tier is case-insensitive (k%10==3 lowercase at 200 m
  //    matches, and the case-differing name still lands in the diff);
  //  - a LIVE anti leg: unmatched bus stops emit 'Busshållplats möjligen
  //    stängd' rows with an EMPTY ids array (the ARRAY_LENGTH(…,1) IS NULL
  //    title quirk, 35:57) — projected as item_id NULL + n_ids 0;
  //  - no-strip NULL keys again: a null-HPLNR item matched to a
  //    ref-carrying node (k%10==7 x k%4==0) suggests DELETING the ref.
  // =========================================================================

  private def busBase(s: SparkSession, dir: String): DataFrame = {
    val m3 = kMod(3); val m13 = kMod(13)
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("namnA",
        when(m3 === 0, concat(lit("Gävle Hpl "), kMod(100).cast("string")))
          .when(m3 === 1, concat(lit("Hpl "), kMod(100).cast("string")))
          .otherwise(concat(lit("Hpl Gävle Norr "), kMod(100).cast("string"))))
      .withColumn("nr", when(kMod(4) =!= 0, (kMod(900) + 100).cast("string")))
      .withColumn("lage", when(kMod(5) =!= 0, element_at(
        array(lit("A"), lit("B"), lit("C"), lit("D"), lit("E"), lit("F")),
        (kMod(6) + 1).cast("int"))))
      .withColumn("bild", when(kMod(7) === 0,
        concat(lit("https://img.example/"), col("k").cast("string"))))
      .withColumn("kurA", when(m13 === 0, "N").when(m13 === 1, "NULL")
        .when(m13 === 2, "").when(m13 === 3, lit(null).cast("string"))
        .otherwise("J"))
      // the collapsed values the oracle recomputes (nm: MIN picks the A unit
      // — 'G'/'H' < 'Z'; shelter: the pair's B unit pins MIN to 'no')
      .withColumn("nm", regexp_replace(col("namnA"), lit("Gävle "), lit("")))
      .withColumn("shel", when(kMod(8) === 1, "no")
        .otherwise(when(m13 <= 3, "no").otherwise("yes")))
  }

  private def busItem(b: DataFrame, unitB: Boolean): DataFrame = {
    val src = if (unitB) b.filter(kMod(8) === 1) else b
    val id = if (unitB) col("k") + 5000000L else col("k")
    val attrs =
      if (unitB) struct(
        concat(lit("Zon Hpl "), kMod(100).cast("string")).as("HPLNAMN"),
        lit(null).cast("string").as("HPLNR"),
        lit(null).cast("string").as("LAGE"),
        lit(null).cast("string").as("HPLBILDURL"),
        lit("N").as("KUR"))
      else struct(
        col("namnA").as("HPLNAMN"), col("nr").as("HPLNR"),
        col("lage").as("LAGE"), col("bild").as("HPLBILDURL"),
        col("kurA").as("KUR"))
    src.select(id.as("id"), lit(18L).as("dataset_id"),
      to_json(attrs).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))
  }

  /** bus stops by k%10 — 0: none; 1: 400 m, name + local_ref (ref tier);
    * 2: 400 m, name + WRONG local_ref; 3: 200 m lowercase name (name tier);
    * 4: 200 m wrong name; 5: 30 m wrong name (base tier); 6: past the muni
    * cutoff; 7: 30 m full-tag twin (name/ref/shelter); 8/9: close bare. */
  private def busOsm(b: DataFrame): DataFrame = {
    val m10 = kMod(10)
    val dx = when(m10 === 1 || m10 === 2, 400L).when(m10 === 3 || m10 === 4, 200L)
      .when(m10 === 5 || m10 === 7, 30L)
      .when(m10 === 6, lit(820001L) + kMod(100) - col("ux").cast("long"))
      .otherwise(kMod(40))
    val dy = when(m10 === 8 || m10 === 9, kMod(30)).otherwise(0L)
    val oname = when(m10 === 1 || m10 === 2 || m10 === 7, col("nm"))
      .when(m10 === 3, lower(col("nm")))
      .when(m10 === 4 || m10 === 5, "Annan")
    val olref = when(m10 === 1, coalesce(col("lage"), lit("X9")))
      .when(m10 === 2, "Q7")
    b.filter(m10 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map_filter(map(
          lit("highway"), lit("bus_stop"),
          lit("name"), oname,
          lit("local_ref"), olref,
          lit("ref"), when(m10 === 7, coalesce(col("nr"), lit("R-none"))),
          lit("shelter"), when(m10 === 7, "yes"),
          lit("image"), when(kMod(19) === 0, "https://osm.example/img"),
          lit("public_transport"), when(kMod(21) === 0, "platform")),
          (_, v) => v.isNotNull).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  private val busKeys = Seq("bus", "highway", "image", "local_ref", "name",
    "public_transport", "ref", "shelter")

  /** ref/local_ref/image can be NULL-valued suggestions (= delete the tag)
    * — render them '__remove__' so the projection stays lossless. */
  private def diffStrRm(m: Column, keys: Seq[String]): Column =
    concat_ws(";", keys.map(key =>
      when(map_contains_key(m, lit(key)),
        concat(lit(key + "="), coalesce(m(key), lit("__remove__"))))): _*)
  private def pDiffStr(m: Column): Column = diffStrRm(m, pKeys)

  // ======================== lifesaving_gavle ==============================

  private def lBase(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("typ", element_at(
        array(lit("Livräddningsboj"), lit("Livräddningsstege"),
          lit("Livräddningspost"), lit("Livräddningsbåt"), lit("Okänd")),
        (kMod(5) + 1).cast("int")))
      .withColumn("utag",
        when(kMod(5) === 0, "life_ring").when(kMod(5) === 1, "rescue_ladder")
          .when(kMod(5) === 2, "life_ring;rescue_ladder")
          .when(kMod(5) === 3, "rescue_boat"))

  private def lItems(b: DataFrame): DataFrame =
    b.select(col("k").as("id"), lit(8L).as("dataset_id"),
      to_json(struct(col("typ").as("TYP"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  /** emergency nodes by k%9 — 0: none; 1: 6 m (outside the 5 m radius);
    * 2: relocated past the municipality cutoff; else (k%4, k%3) ~3.6 m max.
    * Tag value by k%7 — 2: 'defibrillator' (predicate-invisible); 1: a
    * ;-list overlapping the filter but differing from every upstream CASE;
    * 0: the item's own upstream value (diff -> {}); else 'life_ring'. */
  private def lOsm(b: DataFrame): DataFrame = {
    val m9 = kMod(9); val m7 = kMod(7)
    val dx = when(m9 === 1, 6L)
      .when(m9 === 2, lit(820001L) + kMod(100) - col("ux").cast("long"))
      .otherwise(kMod(4))
    val dy = when(m9 === 1 || m9 === 2, 0L).otherwise(kMod(3))
    val otag = when(m7 === 2, "defibrillator")
      .when(m7 === 1, "rescue_ladder;defibrillator")
      .when(m7 === 0, coalesce(col("utag"), lit("life_ring")))
      .otherwise(lit("life_ring"))
    b.filter(m9 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map(lit("emergency"), otag).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  /** the 'Gävle' stand-in (same shape as the other view oracles): one
    * rectangle with half-open .5 bounds, x cutoff at 820000.5. */
  private def muni2180(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("2180", "Gävle")).toDF("code", "name")
      .withColumn("geom", stEnvelopeWkb(lit(-0.5), lit(-0.5),
        lit(820000.5), lit(1000000.5)))
      .select("code", "name", "geom")
  }

  // ===================== historiskaskyltar_gavle ==========================
  //
  // 25-v_deviation_historiskaskyltar_gavle.sql — the 20th and LAST view
  // behind the oracle. Quirks this one uniquely reaches:
  //  - tag_alternatives where the alternatives REPLACE the base's own
  //    'information' value (25:11-16: base says 'sign', the board
  //    alternative overrides it): a matched node's information value NEVER
  //    lands in the diff — the alternative matching it is always one
  //    diff-key cheaper (k%8==5: a 'board' node with a wrong inscription
  //    diffs to inscription ONLY); for missing rows both alternatives tie
  //    and jsonb array order pins 'sign'.
  //  - TRIM(NAMN) (25:14): items carry '  …  '-padded names; the suggested
  //    inscription is the trimmed form.
  //  - NO anti leg (25:22 is a plain LEFT OUTER JOIN with no unmatched-OSM
  //    leg — asserted by absence: k%8==7 plants an information='map' node
  //    10 m away that is predicate-invisible, and no row reports it).
  //  - distance-only 50 m tier (k%8==1 sits at 51 m -> missing) and the
  //    rank-1 distance pick between two admissible nodes (k%8==6: 'sign'
  //    at 30 m vs 'board' at 10 m — the board node wins, asserted via cx
  //    and the empty-vs-inscription diff).
  //  - NAMN NULL (k%11==0) drops 'inscription' from every alternative
  //    (strip_nulls), so a matched bare node diffs to {} and the row dies
  //    at the post-filter while the same item unmatched still emits
  //    'information=sign' alone.
  // =========================================================================

  private def hBase(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("nm", when(kMod(11) =!= 0,
        concat(lit("Skylt "), col("k").cast("string"))))

  private def hItems(b: DataFrame): DataFrame =
    b.select(col("k").as("id"), lit(27L).as("dataset_id"),
      to_json(struct(
        when(col("nm").isNotNull, concat(lit("  "), col("nm"), lit("  ")))
          .as("NAMN"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  /** sign nodes by k%8 — 0: none; 1: 51 m (outside the 50 m tier);
    * 2: relocated past the muni cutoff; 3: 40 m 'board' with the EXACT
    * trimmed inscription (diff {} -> dropped); 4: 40 m 'sign', no
    * inscription; 5: 40 m 'board', wrong inscription; 6: TWO nodes ('sign'
    * 30 m + 'board' 10 m — distance rank picks board); 7: 10 m
    * information='map' (predicate-invisible). k%13==0 carries an extra
    * tourism tag that must never pollute the diff. */
  private def hOsm(b: DataFrame): DataFrame = {
    val m8 = kMod(8)
    val dx = when(m8 === 1, 51L)
      .when(m8 === 2, lit(820001L) + kMod(100) - col("ux").cast("long"))
      .when(m8 === 3 || m8 === 4 || m8 === 5, 40L)
      .when(m8 === 6, 30L)
      .otherwise(10L) // m8 == 7 (m8 == 0 is filtered out)
    val info = when(m8 === 3 || m8 === 5, "board")
      .when(m8 === 7, "map").otherwise("sign")
    val insc = when(m8 === 3, col("nm")).when(m8 === 5, lit("Annan text"))
    val main = b.filter(m8 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map_filter(map(
          lit("information"), info,
          lit("inscription"), insc,
          lit("tourism"), when(kMod(13) === 0, "information")),
          (_, v) => v.isNotNull).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        col("uy").as("cy"))
    val boardProbe = b.filter(m8 === 6)
      .select(lit("n").as("type"), (col("k") + 2000000000L).as("id"),
        map(lit("information"), lit("board")).as("tags"),
        (col("ux") + 10L).cast("double").as("cx"),
        col("uy").as("cy"))
    main.unionByName(boardProbe)
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  // ======================== badplatser_gavle ==============================

  private def bBase(s: SparkSession, dir: String): DataFrame = {
    val m5 = kMod(5); val m14 = kMod(14); val m4 = kMod(4)
    s.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
      .withColumn("ux", pmod(col("k") * 48271L, lit(1000000L)).cast("double"))
      .withColumn("uy", pmod(col("k") * 69621L, lit(1000000L)).cast("double"))
      .withColumn("nm", concat(lit("Bad "), col("k").cast("string")))
      .withColumn("street", when(m5 === 0, "Storgatan")
        .when(m5 === 1, "Industrivägen").when(m5 === 2, "Hamngatan")
        .when(m5 === 3, "Norra Kungsgatan").otherwise("Fältvägen"))
      .withColumn("hn", concat((kMod(97) + 1).cast("string"),
        when(kMod(6) === 0, "B").otherwise("")))
      .withColumn("url", when(m14 === 3, lit(null).cast("string"))
        .when(m14 === 1, concat(lit("http://bad.example/"), col("k").cast("string")))
        .otherwise(concat(lit("https://bad.example/"), col("k").cast("string"))))
      .withColumn("beskr", when(m4 === 0, "Välkommen till badet! Fin sandstrand.")
        .when(m4 === 1, "Kallbadhus med brygga.")
        .when(m4 === 3, "Välkommen hit! Välkommen igen! Bra."))
      .withColumn("adr", when(kMod(11) =!= 0,
        concat(col("street"), lit(" "), col("hn"),
          when(m5 =!= 2, lit(", Gävle")).otherwise(lit("")))))
  }

  private def bItems(b: DataFrame): DataFrame =
    b.select(col("k").as("id"), lit(4L).as("dataset_id"),
      to_json(struct(
        concat(lit("  "), col("nm"), lit("  ")).as("NAMN"),
        when(col("url").isNotNull, concat(lit(" "), col("url"), lit(" ")))
          .as("URL"),
        col("beskr").as("BESKR_KORT"),
        col("adr").as("GATUADRESS"))).as("original_attributes"),
      stPoint(col("ux"), col("uy")).as("geometry"),
      col("ux").as("cx"), col("uy").as("cy"), lit(true).as("is_point"))

  /** bathing nodes by k%9 — 0: none; 1: 260 m east CARRYING THE ITEM'S NAME
    * (the blindness probe); 2: relocated past the muni cutoff; else offset
    * (k%200, k%150), max ~248.6 m — inside the 250 m radius. */
  private def bOsm(b: DataFrame): DataFrame = {
    val m9 = kMod(9); val m14 = kMod(14)
    val dx = when(m9 === 1, 260L)
      .when(m9 === 2, lit(820001L) + kMod(100) - col("ux").cast("long"))
      .otherwise(kMod(200))
    val dy = when(m9 === 1 || m9 === 2, 0L).otherwise(kMod(150))
    val oleis = when(kMod(2) === 0, "bathing_place").otherwise("swimming_area")
    val oname = when(kMod(10) === 0 || m9 === 1, col("nm"))
      .when(kMod(10) === 1, "Annat Bad")
    val oweb = when(m14 === 0 || m14 === 1,
        concat(lit("https://bad.example/"), col("k").cast("string")))
      .when(m14 === 2, "https://other.example/")
    b.filter(m9 =!= 0)
      .select(lit("n").as("type"), (col("k") + 1000000000L).as("id"),
        map_filter(map(
          lit("leisure"), oleis,
          lit("name"), oname,
          lit("website"), oweb), (_, v) => v.isNotNull).as("tags"),
        (col("ux") + dx).cast("double").as("cx"),
        (col("uy") + dy).cast("double").as("cy"))
      .withColumn("geom", stPoint(col("cx"), col("cy")))
      .withColumn("is_point", lit(true))
  }

  /** oracle-hashable projection of the diff in fixed sorted-key order —
    * values are never null in these fixtures, so k=v is lossless. */
  private def diffStr(m: Column, keys: Seq[String]): Column =
    concat_ws(";", keys.map(key =>
      when(map_contains_key(m, lit(key)), concat(lit(key + "="), m(key)))): _*)

  private val bKeys = Seq("addr:city", "addr:housenumber", "addr:street",
    "contact:website", "description:sv", "leisure", "name", "website")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ds_lifesaving_oracle" -> ((s, dir) => {
      val b = lBase(s, dir)
      val dev = graft.engine.ReferenceDatasets.lifesavingGavleDeviations(
        graft.engine.ReferenceDatasets.lifesavingGavleMatch(
          lOsm(b), lItems(b), muni2180(s)))
      dev.select(
        element_at(col("upstream_item_ids"), 1).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        diffStr(col("suggested_tags"), Seq("emergency")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }),

    "q_ds_parkeringsautomater_oracle" -> ((s, dir) => {
      val b = pBase(s, dir)
      val dev = graft.engine.ReferenceDatasetsGavle.parkeringsautomaterDeviations(
        graft.engine.ReferenceDatasetsGavle.parkeringsautomaterMatch(
          pOsm(b), pItems(b), muni2180(s)))
      dev.select(
        element_at(col("upstream_item_ids"), 1).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        pDiffStr(col("suggested_tags")).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }),

    "q_ds_busshallplatser_oracle" -> ((s, dir) => {
      val b = busBase(s, dir)
      val items = busItem(b, unitB = false).unionByName(busItem(b, unitB = true))
      val dev = graft.engine.ReferenceDatasetsGavle.busshallplatserDeviations(
        graft.engine.ReferenceDatasetsGavle.busshallplatserMatch(
          busOsm(b), items, muni2180(s)))
      dev.select(
        // get (0-based, null-safe): the anti leg's EMPTY ids array -> NULL
        get(col("upstream_item_ids"), lit(0)).as("item_id"),
        size(col("upstream_item_ids")).as("n_ids"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        diffStrRm(col("suggested_tags"), busKeys).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }),

    "q_ds_badplatser_oracle" -> ((s, dir) => {
      val b = bBase(s, dir)
      val dev = graft.engine.ReferenceDatasetsGavle.badplatserDeviations(
        graft.engine.ReferenceDatasetsGavle.badplatserMatch(
          bOsm(b), bItems(b), muni2180(s)))
      dev.select(
        element_at(col("upstream_item_ids"), 1).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        diffStr(col("suggested_tags"), bKeys).as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }),

    "q_ds_historiskaskyltar_oracle" -> ((s, dir) => {
      val b = hBase(s, dir)
      val dev = graft.engine.ReferenceDatasetsGavle.historiskaskyltarDeviations(
        graft.engine.ReferenceDatasetsGavle.historiskaskyltarMatch(
          hOsm(b), hItems(b), muni2180(s)))
      dev.select(
        element_at(col("upstream_item_ids"), 1).as("item_id"),
        col("osm_element_id").as("osm_id"),
        col("title"), col("description"),
        diffStr(col("suggested_tags"), Seq("information", "inscription"))
          .as("diff"),
        stCentroid(col("center"))("_1").as("cx"),
        stCentroid(col("center"))("_2").as("cy"))
    }))

  val oracle: Map[String, String] = Map(
    "q_ds_lifesaving_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE o_orderkey%5 WHEN 0 THEN 'life_ring' WHEN 1 THEN 'rescue_ladder'
        |      WHEN 2 THEN 'life_ring;rescue_ladder' WHEN 3 THEN 'rescue_boat'
        |      END AS utag
        |  FROM orders),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%9=1 THEN 6
        |      WHEN k%9=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%4 END) AS ox,
        |    uy + (CASE WHEN k%9 IN (1,2) THEN 0 ELSE k%3 END) AS oy,
        |    CASE WHEN k%7=2 THEN 'defibrillator'
        |         WHEN k%7=1 THEN 'rescue_ladder;defibrillator'
        |         WHEN k%7=0 THEN COALESCE(utag, 'life_ring')
        |         ELSE 'life_ring' END AS otag
        |  FROM b WHERE k%9 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000
        |    AND len(list_intersect(string_split(otag, ';'),
        |        ['life_ring','rescue_boat','rescue_ladder'])) > 0),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.otag, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM b u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 5 AND ABS(u.uy-o.oy) <= 5
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 5),
        |best AS (
        |  SELECT uk, osm_id, otag, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Livräddningsutrustning saknas'
        |         ELSE 'Livräddningsutrustning saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas livräddningsutrustning här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på livräddningsutrustningen här'
        |         END AS description,
        |    CASE WHEN u.utag IS NOT NULL
        |          AND (w.osm_id IS NULL OR w.otag IS DISTINCT FROM u.utag)
        |         THEN 'emergency=' || u.utag ELSE '' END AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM b u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin,

    "q_ds_parkeringsautomater_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE WHEN o_orderkey%6<>0
        |         THEN 'P-' || CAST(o_orderkey%500 AS VARCHAR) END AS uref
        |  FROM orders),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%10 IN (1,2) THEN 80 WHEN k%10 IN (3,4) THEN 40
        |      WHEN k%10=5 THEN 101
        |      WHEN k%10=6 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      WHEN k%10=7 THEN 60 ELSE k%40 END) AS ox,
        |    uy + (CASE WHEN k%10 IN (8,9) THEN k%30 ELSE 0 END) AS oy,
        |    CASE WHEN k%10 IN (1,2,5,7) THEN COALESCE(uref, 'P-none')
        |         WHEN k%10=4 THEN 'ZZZ' END AS oref,
        |    k%13=0 AS pdeb, k%17=0 AS csek
        |  FROM b WHERE k%10 <> 0
        |  UNION ALL
        |  SELECT k, k+2000000000 AS osm_id, ux + 81 AS ox, uy AS oy,
        |    LOWER(COALESCE(uref, 'P-none')) AS oref,
        |    k%13=0 AS pdeb, k%17=0 AS csek
        |  FROM b WHERE k%10 = 2),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oref, o.pdeb, o.csek, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist,
        |    CASE WHEN o.oref IS NOT NULL AND u.uref IS NOT NULL
        |          AND o.oref = u.uref
        |         THEN 100 + SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy))
        |         ELSE 50 + SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy))
        |         END AS score
        |  FROM b u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 100 AND ABS(u.uy-o.oy) <= 100
        |   AND ((o.oref IS NOT NULL AND u.uref IS NOT NULL
        |         AND LOWER(o.oref) = LOWER(u.uref)
        |         AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 100)
        |     OR SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 50)),
        |best AS (
        |  SELECT uk, osm_id, oref, pdeb, csek, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY score, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Parkeringsautomat saknas'
        |         ELSE 'Parkeringsautomat saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en parkeringsautomat här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på parkeringsautomaten här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      CASE WHEN w.osm_id IS NULL THEN 'amenity=vending_machine' END,
        |      CASE WHEN w.osm_id IS NULL OR NOT w.csek THEN 'currency:SEK=yes' END,
        |      'payment:credit_cards=yes',
        |      CASE WHEN w.osm_id IS NULL OR NOT w.pdeb
        |           THEN 'payment:debit_cards=yes' END,
        |      'payment:others=no',
        |      CASE WHEN w.osm_id IS NULL AND u.uref IS NOT NULL
        |           THEN 'ref=' || u.uref
        |           WHEN w.osm_id IS NOT NULL
        |            AND (u.uref IS DISTINCT FROM w.oref)
        |           THEN 'ref=' || COALESCE(u.uref, '__remove__') END,
        |      CASE WHEN w.osm_id IS NULL THEN 'vending=parking_tickets' END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM b u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy FROM dev""".stripMargin,

    "q_ds_busshallplatser_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE o_orderkey%3
        |      WHEN 0 THEN 'Gävle Hpl ' || CAST(o_orderkey%100 AS VARCHAR)
        |      WHEN 1 THEN 'Hpl ' || CAST(o_orderkey%100 AS VARCHAR)
        |      ELSE 'Hpl Gävle Norr ' || CAST(o_orderkey%100 AS VARCHAR)
        |      END AS namna,
        |    CASE WHEN o_orderkey%4<>0
        |         THEN CAST(o_orderkey%900 + 100 AS VARCHAR) END AS nr,
        |    CASE WHEN o_orderkey%5<>0 THEN
        |      (CASE o_orderkey%6 WHEN 0 THEN 'A' WHEN 1 THEN 'B' WHEN 2 THEN 'C'
        |        WHEN 3 THEN 'D' WHEN 4 THEN 'E' ELSE 'F' END) END AS lage,
        |    CASE WHEN o_orderkey%7=0
        |         THEN 'https://img.example/' || CAST(o_orderkey AS VARCHAR)
        |         END AS bild,
        |    CASE WHEN o_orderkey%8=1 THEN 2 ELSE 1 END AS n_ids,
        |    CASE WHEN o_orderkey%8=1 THEN 'no'
        |         WHEN o_orderkey%13<=3 THEN 'no' ELSE 'yes' END AS shel
        |  FROM orders),
        |u0 AS (
        |  SELECT k, ux, uy, n_ids, nr, lage, bild, shel,
        |    REPLACE(namna, 'Gävle ', '') AS nm
        |  FROM b),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%10 IN (1,2) THEN 400 WHEN k%10 IN (3,4) THEN 200
        |      WHEN k%10 IN (5,7) THEN 30
        |      WHEN k%10=6 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%40 END) AS ox,
        |    uy + (CASE WHEN k%10 IN (8,9) THEN k%30 ELSE 0 END) AS oy,
        |    CASE WHEN k%10 IN (1,2,7) THEN nm WHEN k%10=3 THEN LOWER(nm)
        |         WHEN k%10 IN (4,5) THEN 'Annan' END AS oname,
        |    CASE WHEN k%10=1 THEN COALESCE(lage, 'X9')
        |         WHEN k%10=2 THEN 'Q7' END AS olref,
        |    CASE WHEN k%10=7 THEN COALESCE(nr, 'R-none') END AS oref,
        |    CASE WHEN k%10=7 THEN 'yes' END AS oshel,
        |    CASE WHEN k%19=0 THEN 'https://osm.example/img' END AS oimg,
        |    k%21=0 AS opt
        |  FROM u0 WHERE k%10 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oname, o.olref, o.oref, o.oshel,
        |    o.oimg, o.opt, o.ox, o.oy,
        |    CASE WHEN o.oname IS NOT NULL AND o.olref IS NOT NULL
        |          AND o.oname = u.nm AND o.olref = u.lage
        |         THEN 500 + SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy))
        |         WHEN o.oname IS NOT NULL AND LOWER(o.oname) = LOWER(u.nm)
        |         THEN 250 + SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy))
        |         ELSE 50 + SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy))
        |         END AS score
        |  FROM u0 u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 500 AND ABS(u.uy-o.oy) <= 500
        |   AND ((o.oname IS NOT NULL AND o.olref IS NOT NULL AND o.oname = u.nm
        |         AND o.olref = u.lage
        |         AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 500)
        |     OR (o.oname IS NOT NULL AND LOWER(o.oname) = LOWER(u.nm)
        |         AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 250)
        |     OR SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 50)),
        |best AS (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY score, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, u.n_ids, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Busshållplats saknas'
        |         ELSE 'Busshållplats saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en busshållplats här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på busshållplatsen här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      'bus=yes',
        |      CASE WHEN w.osm_id IS NULL THEN 'highway=bus_stop' END,
        |      CASE WHEN u.bild IS NOT NULL
        |            AND (w.osm_id IS NULL OR w.oimg IS DISTINCT FROM u.bild)
        |           THEN 'image=' || u.bild
        |           WHEN w.osm_id IS NOT NULL AND u.bild IS NULL
        |            AND w.oimg IS NOT NULL THEN 'image=__remove__' END,
        |      CASE WHEN u.lage IS NOT NULL
        |            AND (w.osm_id IS NULL OR w.olref IS DISTINCT FROM u.lage)
        |           THEN 'local_ref=' || u.lage
        |           WHEN w.osm_id IS NOT NULL AND u.lage IS NULL
        |            AND w.olref IS NOT NULL THEN 'local_ref=__remove__' END,
        |      CASE WHEN w.osm_id IS NULL OR w.oname IS DISTINCT FROM u.nm
        |           THEN 'name=' || u.nm END,
        |      CASE WHEN w.osm_id IS NULL OR NOT w.opt
        |           THEN 'public_transport=platform' END,
        |      CASE WHEN u.nr IS NOT NULL
        |            AND (w.osm_id IS NULL OR w.oref IS DISTINCT FROM u.nr)
        |           THEN 'ref=' || u.nr
        |           WHEN w.osm_id IS NOT NULL AND u.nr IS NULL
        |            AND w.oref IS NOT NULL THEN 'ref=__remove__' END,
        |      CASE WHEN w.osm_id IS NULL OR w.oshel IS DISTINCT FROM u.shel
        |           THEN 'shelter=' || u.shel END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM u0 u LEFT JOIN best w ON u.k = w.uk
        |  UNION ALL
        |  SELECT NULL AS item_id, 0 AS n_ids, o.osm_id,
        |    'Busshållplats möjligen stängd' AS title,
        |    'Enligt Gävle kommun finns det ingen busshållplats här, den kan vara stängd' AS description,
        |    '' AS diff, o.ox AS cx, o.oy AS cy
        |  FROM osm o
        |  WHERE o.osm_id NOT IN (SELECT DISTINCT osm_id FROM cand))
        |SELECT item_id, n_ids, osm_id, title, description, diff, cx, cy
        |FROM dev""".stripMargin,

    "q_ds_badplatser_oracle" ->
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    'Bad ' || CAST(o_orderkey AS VARCHAR) AS nm,
        |    CASE o_orderkey%5 WHEN 0 THEN 'Storgatan' WHEN 1 THEN 'Industrivägen'
        |      WHEN 2 THEN 'Hamngatan' WHEN 3 THEN 'Norra Kungsgatan'
        |      ELSE 'Fältvägen' END AS street,
        |    CAST(o_orderkey%97+1 AS VARCHAR) ||
        |      (CASE WHEN o_orderkey%6=0 THEN 'B' ELSE '' END) AS hn,
        |    CASE WHEN o_orderkey%14=3 THEN NULL
        |         WHEN o_orderkey%14=1 THEN 'http://bad.example/' || CAST(o_orderkey AS VARCHAR)
        |         ELSE 'https://bad.example/' || CAST(o_orderkey AS VARCHAR) END AS url,
        |    CASE o_orderkey%4 WHEN 0 THEN 'Fin sandstrand.'
        |      WHEN 1 THEN 'Kallbadhus med brygga.'
        |      WHEN 3 THEN 'Välkommen igen! Bra.' END AS descsv
        |  FROM orders),
        |ups AS (
        |  SELECT k, ux, uy, nm, url, descsv,
        |    CASE WHEN k%11<>0 THEN street END AS astreet,
        |    CASE WHEN k%11<>0 THEN hn END AS ahn,
        |    CASE WHEN k%11<>0 AND k%5<>2 THEN 'Gävle' END AS acity
        |  FROM b),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%9=1 THEN 260
        |      WHEN k%9=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      ELSE k%200 END) AS ox,
        |    uy + (CASE WHEN k%9 IN (1,2) THEN 0 ELSE k%150 END) AS oy,
        |    CASE WHEN k%2=0 THEN 'bathing_place' ELSE 'swimming_area' END AS oleis,
        |    CASE WHEN k%10=0 OR k%9=1 THEN nm
        |         WHEN k%10=1 THEN 'Annat Bad' END AS oname,
        |    CASE WHEN k%14 IN (0,1) THEN 'https://bad.example/' || CAST(k AS VARCHAR)
        |         WHEN k%14=2 THEN 'https://other.example/' END AS oweb
        |  FROM b WHERE k%9 <> 0),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, o.osm_id, o.oleis, o.oname, o.oweb, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM ups u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 250 AND ABS(u.uy-o.oy) <= 250
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 250),
        |best AS (
        |  SELECT uk, osm_id, oleis, oname, oweb, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Badplats saknas'
        |         ELSE 'Badplats saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en badplats här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på badplatsen här'
        |         END AS description,
        |    CONCAT_WS(';',
        |      CASE WHEN u.acity IS NOT NULL THEN 'addr:city=' || u.acity END,
        |      CASE WHEN u.ahn IS NOT NULL THEN 'addr:housenumber=' || u.ahn END,
        |      CASE WHEN u.astreet IS NOT NULL THEN 'addr:street=' || u.astreet END,
        |      CASE WHEN u.url IS NOT NULL AND u.url NOT LIKE 'http://%'
        |            AND (w.osm_id IS NULL OR w.oweb IS NULL)
        |           THEN 'contact:website=' || u.url END,
        |      CASE WHEN u.descsv IS NOT NULL THEN 'description:sv=' || u.descsv END,
        |      CASE WHEN w.osm_id IS NULL THEN 'leisure=bathing_place' END,
        |      CASE WHEN w.osm_id IS NULL OR w.oname IS DISTINCT FROM u.nm
        |           THEN 'name=' || u.nm END,
        |      CASE WHEN w.osm_id IS NOT NULL AND w.oweb IS NOT NULL
        |            AND u.url IS NOT NULL AND w.oweb <> u.url
        |            AND NOT (u.url LIKE 'http://%'
        |                     AND w.oweb = 'https://' || SUBSTR(u.url, 8))
        |           THEN 'website=' || u.url END) AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM ups u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin,

    "q_ds_historiskaskyltar_oracle" ->
      // the alternative matching the node's information value is always one
      // diff-key cheaper, so matched diffs carry inscription ONLY; missing
      // rows tie and array order pins the 'sign' alternative
      """WITH b AS (
        |  SELECT o_orderkey AS k,
        |    CAST((o_orderkey*48271)%1000000 AS DOUBLE) AS ux,
        |    CAST((o_orderkey*69621)%1000000 AS DOUBLE) AS uy,
        |    CASE WHEN o_orderkey%11<>0
        |         THEN 'Skylt ' || CAST(o_orderkey AS VARCHAR) END AS nm
        |  FROM orders),
        |osm0 AS (
        |  SELECT k, k+1000000000 AS osm_id,
        |    ux + (CASE WHEN k%8=1 THEN 51
        |      WHEN k%8=2 THEN 820001 + k%100 - CAST(ux AS BIGINT)
        |      WHEN k%8 IN (3,4,5) THEN 40
        |      WHEN k%8=6 THEN 30 ELSE 10 END) AS ox,
        |    uy AS oy,
        |    CASE WHEN k%8 IN (3,5) THEN 'board'
        |         WHEN k%8=7 THEN 'map' ELSE 'sign' END AS info,
        |    CASE WHEN k%8=3 THEN nm WHEN k%8=5 THEN 'Annan text' END AS insc
        |  FROM b WHERE k%8 <> 0
        |  UNION ALL
        |  SELECT k, k+2000000000 AS osm_id, ux + 10 AS ox, uy AS oy,
        |    'board' AS info, NULL AS insc
        |  FROM b WHERE k%8 = 6),
        |osm AS (
        |  SELECT * FROM osm0
        |  WHERE info IN ('board','sign')
        |    AND ox >= 0 AND ox <= 820000 AND oy >= 0 AND oy <= 1000000),
        |cand AS (
        |  SELECT u.k AS uk, u.nm, o.osm_id, o.info, o.insc, o.ox, o.oy,
        |    SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) AS dist
        |  FROM b u JOIN osm o
        |    ON ABS(u.ux-o.ox) <= 50 AND ABS(u.uy-o.oy) <= 50
        |   AND SQRT((u.ux-o.ox)*(u.ux-o.ox)+(u.uy-o.oy)*(u.uy-o.oy)) <= 50),
        |best AS (
        |  SELECT uk, osm_id, insc, ox, oy FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uk ORDER BY dist, osm_id) AS rn
        |    FROM cand) WHERE rn = 1),
        |dev AS (
        |  SELECT u.k AS item_id, w.osm_id,
        |    CASE WHEN w.osm_id IS NULL THEN 'Skylt saknas'
        |         ELSE 'Skylt saknar taggar' END AS title,
        |    CASE WHEN w.osm_id IS NULL
        |         THEN 'Enligt Gävle kommun ska det finnas en skylt här'
        |         ELSE 'Följande taggar, härledda ur från Gävle kommuns data, saknas på skylten här'
        |         END AS description,
        |    CASE WHEN w.osm_id IS NULL THEN
        |        'information=sign' ||
        |        CASE WHEN u.nm IS NOT NULL THEN ';inscription=' || u.nm ELSE '' END
        |      WHEN u.nm IS NOT NULL AND (w.insc IS NULL OR w.insc <> u.nm)
        |        THEN 'inscription=' || u.nm
        |      ELSE '' END AS diff,
        |    CASE WHEN w.osm_id IS NULL THEN u.ux ELSE w.ox END AS cx,
        |    CASE WHEN w.osm_id IS NULL THEN u.uy ELSE w.oy END AS cy
        |  FROM b u LEFT JOIN best w ON u.k = w.uk)
        |SELECT item_id, osm_id, title, description, diff, cx, cy
        |FROM dev WHERE osm_id IS NULL OR diff <> ''""".stripMargin)
}
