package graft.core.tags

/**
 * Pure-Scala port of the reference's scalar tag functions
 * (/root/reference/database/migrations/03-general-functions.sql,
 * 03a-match.sql, 13-v-deviation_schools_skolverket.sql:1-14).
 *
 * Tag maps are Map[String, String] where a null VALUE models a JSON null
 * ("delete this tag" in suggested_tags — tests/test_tag_diff.sql:25-32).
 * An ABSENT key and a null-valued key are distinct states, exactly as in
 * JSONB.
 *
 * Golden-tested in TagsSpec against every case in
 * database/tests/test_{tag_diff,new_tag_value,fix_name,tag_alternatives}.sql.
 */
object Tags {
  type TagMap = Map[String, String]

  final case class NewTagValue(replace: Boolean, value: String)

  // --- process_tags ingest normalizer (replication/process_tags.py:4-37) ---
  /** Raw OSM tag strings -> the `->>`-level text the reference's jsonb tags
    * yield downstream: "yes"/"no" become booleans ("true"/"false"),
    * ";"-valued tags become a jsonb array (PG text form: `["a", true]`,
    * elements processed recursively), EXCEPT for the free-text keys fixme /
    * description / source / source:* which are kept verbatim. */
  def processTagValue(key: String, value: String): String = {
    if (value == null) return null
    val excluded = key == "fixme" || key == "description" || key == "source" ||
      key.startsWith("source:")
    if (excluded) value
    else if (value.contains(";"))
      value.split(";", -1).map { v =>
        // recursion depth is 1: split parts contain no ';'
        if (v == "yes") "true"
        else if (v == "no") "false"
        else "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      }.mkString("[", ", ", "]")
    else if (value == "yes") "true"
    else if (value == "no") "false"
    else value
  }

  def processTags(tags: TagMap): TagMap =
    if (tags == null) null
    else tags.map { case (k, v) => k -> processTagValue(k, v) }

  // --- fix_name (03-general-functions.sql:12-17) ---------------------------
  /** Postgres INITCAP: words = runs of alphanumerics; first char upper, rest lower. */
  def initcap(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevAlnum = false
    for (c <- s) {
      val alnum = Character.isLetterOrDigit(c)
      if (alnum && !prevAlnum) sb.append(Character.toUpperCase(c))
      else if (alnum) sb.append(Character.toLowerCase(c))
      else sb.append(c)
      prevAlnum = alnum
    }
    sb.toString
  }

  def fixName(original: String): String = {
    if (original == null) return null
    if (original.trim.isEmpty) return null
    val ic = initcap(original)
    // \y in PG regex = word boundary; (?U) makes Java \b Unicode-aware so
    // Swedish letters count as word characters. PG's 3-arg REGEXP_REPLACE is
    // NON-global — only the first occurrence is replaced (ADVICE r1).
    val fixed = ic.replaceFirst("(?U)\\bKommun\\b", "kommun")
                  .replaceFirst("(?U)\\bAb\\b", "AB")
    fixed.trim
  }

  // --- fix_phone (03:19-37) --------------------------------------------------
  def fixPhone(original: String): String = {
    if (original == null) return null
    val phone = original.replace(" ", "").replace("-", "")
    if (phone.startsWith("+")) {
      if (phone.length <= 3) phone + " "
      else phone.substring(0, 3) + " " + phone.substring(3)
    } else if (phone.startsWith("00")) {
      // NB: the tail comes from the ORIGINAL (with spacing) — quirk preserved
      // from the SQL (SUBSTRING(original FROM 5)).
      "+" + phone.substring(2, math.min(4, phone.length)) + " " +
        (if (original.length > 4) original.substring(4) else "")
    } else if (phone.startsWith("0")) {
      "+46 " + phone.substring(1)
    } else phone
  }

  // --- translate_operator (03:44-52, seeds 03b-operator_aliases.sql) -------
  val operatorTranslation: Map[String, String] = Map(
    "borås kommun" -> "Borås Stad",
    "göteborg kommun" -> "Göteborgs Stad",
    "göteborgs kommun" -> "Göteborgs Stad",
    "haparanda kommun" -> "Haparanda stad",
    "haparandas kommun" -> "Haparanda stad",
    "helsingborg kommun" -> "Helsningborgs stad",
    "helsingborgs kommun" -> "Helsningborgs stad",
    "landskrona kommun" -> "Landskrona stad",
    "landskronas kommun" -> "Landskrona stad",
    "lidingö kommun" -> "Lidingö stad",
    "lidingös kommun" -> "Lidingö stad",
    "malmö kommun" -> "Malmö stad",
    "malmös kommun" -> "Malmö stad",
    "mölndal kommun" -> "Mölndals stad",
    "mölndals kommun" -> "Mölndals stad",
    "solna kommun" -> "Solna stad",
    "solnas kommun" -> "Solna stad",
    "stockholm kommun" -> "Stockholms stad",
    "stockholms kommun" -> "Stockholms stad",
    "sundbyberg kommun" -> "Sundbybergs stad",
    "sundbybergs kommun" -> "Sundbybergs stad",
    "trollhättan kommun" -> "Trollhättans Stad",
    "trollhättans kommun" -> "Trollhättans Stad",
    "vaxholm kommun" -> "Vaxholms stad",
    "vaxholms kommun" -> "Vaxholms stad",
    "västerås kommun" -> "Västerås stad")

  def translateOperator(value: String): String =
    if (value == null) null
    else operatorTranslation.getOrElse(value.toLowerCase, value)

  // --- new_website (03:74-85): SQL three-valued logic preserved -------------
  /** Returns the SQL boolean: Some(true/false) or None (=SQL NULL). */
  private def newWebsite3(n: String, o: String): Option[Boolean] = {
    val distinct = n != o // IS DISTINCT FROM is null-safe
    if (!distinct) return Some(false)
    // downgrade = starts_with(new,'http://') AND starts_with(old,'https://')
    //             AND substring(new from 'http://(.*)') = substring(old from 'https://(.*)')
    def sw(s: String, p: String): Option[Boolean] =
      if (s == null) None else Some(s.startsWith(p))
    def sub(s: String, p: String): Option[String] =
      if (s != null && s.startsWith(p)) Some(s.substring(p.length)) else None
    val eq: Option[Boolean] = (sub(n, "http://"), sub(o, "https://")) match {
      case (Some(a), Some(b)) => Some(a == b)
      case _                  => None // NULL = x is NULL
    }
    val downgrade = and3(and3(sw(n, "http://"), sw(o, "https://")), eq)
    // distinct(true) AND NOT downgrade
    and3(Some(true), not3(downgrade))
  }

  private def and3(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] = (a, b) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true))            => Some(true)
    case _                                   => None
  }
  private def not3(a: Option[Boolean]): Option[Boolean] = a.map(!_)

  def newWebsite(n: String, o: String): Boolean = newWebsite3(n, o).contains(true)

  // --- new_phone (03:87-92) --------------------------------------------------
  def newPhone(n: String, o: String): Boolean = fixPhone(n) != fixPhone(o)

  // --- normalize_float (03:94-102) -------------------------------------------
  def normalizeFloat(value: String): String = {
    if (value == null) return null
    try java.lang.Double.parseDouble(value.trim).toString
    catch { case _: Exception => value }
  }

  // --- new_tag_value (03:104-128) ---------------------------------------------
  def newTagValue(key: String, n: String, o: String): NewTagValue = key match {
    case "website" | "contact:website" =>
      if (newWebsite(n, o)) NewTagValue(true, n) else NewTagValue(false, null)
    case "phone" | "contact:phone" =>
      if (newPhone(n, o)) NewTagValue(true, n) else NewTagValue(false, null)
    case "operator" =>
      val tn = translateOperator(n); val to = translateOperator(o)
      val ln = if (tn == null) null else tn.toLowerCase
      val lo = if (to == null) null else to.toLowerCase
      if (ln != lo) NewTagValue(true, tn) else NewTagValue(false, null)
    case "generator:output:electricity" =>
      def firstToken(s: String): String =
        if (s == null || s.isEmpty) null else s.split(" ", -1)(0)
      if (normalizeFloat(firstToken(n)) != normalizeFloat(firstToken(o)))
        NewTagValue(true, n)
      else NewTagValue(false, null)
    case _ =>
      if (n != o) NewTagValue(true, n) else NewTagValue(false, null)
  }

  // --- tag_aliases + tag_diff (03:54-65, 130-189) -----------------------------
  final case class TagAlias(preferred: String, alternative: String, category: String)
  val tagAliases: Seq[TagAlias] = Seq(
    TagAlias("contact:email", "email", "contact"),
    TagAlias("contact:phone", "phone", "contact"),
    TagAlias("contact:website", "website", "contact"))

  /**
   * Diff of two tag maps: the suggested changes to bring `oldT` toward `newT`.
   * Result: canonical-key -> new value (null value = delete the tag). Keys
   * only come from the new side. Alias canonicalization picks, per category,
   * the variant the old object consistently uses (exactly-one-variant vote,
   * else the preferred form) — 03:139-149.
   */
  def tagDiff(oldT: TagMap, newT: TagMap): TagMap = {
    val old = if (oldT == null) Map.empty[String, String] else oldT
    val nw = if (newT == null) Map.empty[String, String] else newT
    val picks: Map[String, String] = tagAliases.groupBy(_.category).flatMap {
      case (cat, as) =>
        var sawPreferred = false; var sawAlternative = false
        for (a <- as) {
          if (old.contains(a.preferred)) sawPreferred = true
          if (old.contains(a.alternative)) sawAlternative = true
        }
        (sawPreferred, sawAlternative) match {
          case (true, false) => Some(cat -> "preferred")
          case (false, true) => Some(cat -> "alternative")
          case _             => None // zero or both variants: no pick
        }
    }
    val aliasMap: Map[String, String] = tagAliases.flatMap { a =>
      val to = if (picks.get(a.category).contains("alternative")) a.alternative
               else a.preferred
      Seq(a.preferred -> to, a.alternative -> to)
    }.toMap
    def canon(m: TagMap): TagMap =
      m.map { case (k, v) => aliasMap.getOrElse(k, k) -> v }
    val cn = canon(nw)
    val co = canon(old)
    cn.flatMap { case (k, v) =>
      val ntv = newTagValue(k, v, co.get(k).orNull)
      if (ntv.replace) Some(k -> ntv.value) else None
    }
  }

  def countKeys(m: TagMap): Int = if (m == null) 0 else m.size

  /** jsonb_strip_nulls */
  def stripNulls(m: TagMap): TagMap = m.filter(_._2 != null)

  /** tag_alternatives (03:191-196): strip_nulls(constants || alt) per alt. */
  def tagAlternatives(alternatives: Seq[TagMap], constants: TagMap): Seq[TagMap] =
    alternatives.map(alt => stripNulls(constants ++ alt))

  // --- process_school_tags (13-v-deviation_schools_skolverket.sql:1-14) ------
  def processSchoolTags(unitsIn: Seq[TagMap]): TagMap = {
    var units = unitsIn
    if (units.exists(u => u.get("amenity").exists(_ != null)))
      units = units.filter(u => u.get("amenity").exists(_ != null))
    def isSpecial(u: TagMap): Int = {
      val name = u.get("name").orNull
      if (name == null) 0
      else {
        val l = name.toLowerCase
        if (l.contains("anpassad") || l.contains("vuxen") || l.contains("komvux") ||
            name.contains("SFI") || l.contains("särvux") || l.contains("särskola")) 1
        else 0
      }
    }
    units = units.sortBy(isSpecial) // stable sort, specials last
    val refs = units.flatMap(u => Option(u.get("ref:se:skolverket").orNull)).sorted
    val refVal = if (refs.isEmpty) null else refs.mkString(";")
    units.head + ("ref:se:skolverket" -> refVal)
  }

  // --- match_condition / match_score (03a-match.sql) -------------------------
  /**
   * One spec per match_condition/match_score overload family:
   * refKeys empty + nameKey empty  -> distance-only overload
   * nameKey only                   -> name overload
   * nameKey + 1 or 2 refKeys       -> ref overloads.
   * Distances in meters (planar EPSG:3006).
   */
  final case class MatchSpec(
      nameKey: Option[String],
      refKeys: Seq[String],
      dOther: Double,
      dName: Double = 0.0,
      dRef: Double = 0.0) {
    /** the widest distance any disjunct can accept — the join bucket radius */
    def maxDistance: Double = math.max(dOther, math.max(dName, dRef))
  }

  private def multiValueOverlap(a: String, b: String): Boolean = {
    if (a == null || b == null) return false
    // limit -1 KEEPS trailing empty elements: PG's STRING_TO_ARRAY('A;', ';')
    // is {A,""} (03a-match.sql:9), so "A;" overlaps "B;" on the shared "" —
    // Java's default split dropped them and diverged from both the reference
    // and the native Column form (Spark's split also keeps them)
    val sa = a.split(";", -1); val sb = b.split(";", -1)
    sa.exists(x => sb.contains(x))
  }

  private def refsAgree(spec: MatchSpec, tagsA: TagMap, tagsB: TagMap): Boolean =
    spec.refKeys.nonEmpty &&
      spec.refKeys.forall(k => tagsA.contains(k)) &&
      spec.refKeys.forall(k =>
        multiValueOverlap(tagsA.get(k).orNull, tagsB.get(k).orNull))

  private def namesAgree(spec: MatchSpec, tagsA: TagMap, tagsB: TagMap): Boolean =
    spec.nameKey.exists { nk =>
      tagsA.contains(nk) && {
        val a = tagsA.get(nk).orNull; val b = tagsB.get(nk).orNull
        a != null && b != null && a.toLowerCase == b.toLowerCase
      }
    }

  /** match_condition: dist is the precomputed planar ST_Distance(a, b). */
  def matchCondition(spec: MatchSpec, tagsA: TagMap, tagsB: TagMap, dist: Double): Boolean =
    (refsAgree(spec, tagsA, tagsB) && dist <= spec.dRef) ||
    (namesAgree(spec, tagsA, tagsB) && dist <= spec.dName) ||
    dist <= spec.dOther

  /**
   * match_score — replicates each overload's quirks exactly:
   * - 2-ref overload compares ref2 by plain equality (03a:58), not overlap;
   * - the name-only overload compares names case-SENSITIVELY (03a:70),
   *   while ref overloads use LOWER (03a:46).
   */
  def matchScore(spec: MatchSpec, tagsA: TagMap, tagsB: TagMap, dist: Double): Double = {
    val tierRef: Boolean = spec.refKeys match {
      case Seq(r1) =>
        tagsA.contains(r1) &&
          multiValueOverlap(tagsA.get(r1).orNull, tagsB.get(r1).orNull)
      case Seq(r1, r2) =>
        tagsA.contains(r1) && tagsA.contains(r2) &&
          multiValueOverlap(tagsA.get(r1).orNull, tagsB.get(r1).orNull) && {
            val a = tagsA.get(r2).orNull; val b = tagsB.get(r2).orNull
            a != null && b != null && a == b
          }
      case _ => false
    }
    if (tierRef) spec.dRef + dist
    else {
      val tierName: Boolean = spec.nameKey.exists { nk =>
        val a = tagsA.get(nk).orNull; val b = tagsB.get(nk).orNull
        if (spec.refKeys.nonEmpty)
          tagsA.contains(nk) && a != null && b != null && a.toLowerCase == b.toLowerCase
        else a != null && b != null && a == b // name-only overload: plain '='
      }
      if (tierName) spec.dName + dist else spec.dOther + dist
    }
  }
}
