package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions._
import graft.operators.SpatialJoin
import graft.operators.SpatialJoin.DWithinSpec

/**
 * Incremental deviation maintenance — the batch re-expression of the
 * reference's row triggers (15-recalculation.sql:131-190, SURVEY.md §2.10 T5):
 *
 *  on element DELETE: pure-deletion suggestions (no suggested geom/tags) are
 *    marked fixed; rows with upstream references are recalculated;
 *  on element UPDATE: tag-only suggestions now satisfied
 *    (tag_diff(new_tags, suggested_tags) = {}) are marked fixed; others
 *    recalculated;
 *  on element INSERT: open "missing" deviations (osm_element_id NULL) within
 *    100 m of the new element's geometry are recalculated — note the fixed
 *    100 m radius is its OWN spec, independent of any dataset's match
 *    distances (SURVEY.md §7.4.7);
 *  recalculate (15:65-93): re-read the freshly recomputed deviation view; a
 *    matching row (same dataset/layer and same upstream ids OR same osm
 *    element) updates tags/geom/title/description/element in place (action
 *    preserved); no match → mark fixed if the upstream items still exist,
 *    else delete unless user-actioned.
 *
 * All steps are set-based joins over the snapshot store — the per-row trigger
 * loop becomes three joins + one merge, shuffle-partitioned by element key /
 * cell, so the same code handles one edit or a 10^9-row replication batch.
 */
object Incremental {

  /**
   * T7: item-refresh invalidation (09-api-deviation.sql:121-129,
   * `t_item_delete_deviation`): deviations whose `upstream_item_ids` overlap
   * a replaced/refreshed item id are DELETED (unconditionally — the
   * reference trigger has no action guard), so the next sync recomputes them
   * from the fresh item. The per-row trigger becomes one explode + semi-join
   * per view partition (J9 array-overlap join). `replacedIds` needs an `id`
   * column. Returns rows deleted.
   *
   * (Reference quirk noted, not replicated: the trigger is declared AFTER
   * INSERT but reads OLD — the set-based semantics implemented here are the
   * intended ones.)
   */
  /** surrogate row key: NULLS-NOT-DISTINCT uniq tuple as a hash — avoids both
    * null-eq pitfalls and ambiguous self-join references. ONE definition for
    * every incremental path (invalidation + edit merge) so they can never
    * disagree on row identity. */
  private def withK(d: DataFrame): DataFrame =
    d.withColumn("__k", sha2(to_json(struct(
      (DeviationStore.keyCols :+ "view_name").map(col): _*)), 256))

  def invalidateReplacedItems(store: DeviationStore, replacedIds: DataFrame): Long = {
    val ids = replacedIds.select(col("id").as("__iid")).distinct().cache()
    val deleted = store.views.map { view =>
      val dev = store.latestFor(view)
      val hitKeys = withK(dev)
        .withColumn("__iid", explode(col("upstream_item_ids")))
        .join(ids, Seq("__iid"), "left_semi")
        .select("__k").distinct()
      val keep = withK(dev)
        .join(hitKeys, Seq("__k"), "left_anti")
        .drop("__k")
      val n = hitKeys.count()
      if (n > 0) store.commitView(view, keep, s"item-invalidate:$view")
      n
    }.sum
    ids.unpersist()
    deleted
  }

  /** One OSM edit batch. `inserted`/`updated` carry full element rows
    * (type, id, tags, geom, cx, cy, is_point); `deleted` needs (type, id). */
  final case class OsmEditBatch(
      inserted: Option[DataFrame] = None,
      updated: Option[DataFrame] = None,
      deleted: Option[DataFrame] = None)

  private val tagDiffEmpty = udf(
    (newTags: Map[String, String], suggested: Map[String, String]) =>
      graft.core.tags.Tags.tagDiff(
        if (newTags == null) Map.empty[String, String] else newTags,
        if (suggested == null) Map.empty[String, String] else suggested).isEmpty)

  /**
   * Apply one edit batch. `recomputeView` must produce the deviation view
   * (DeviationView.deviations output) evaluated against the POST-edit element
   * state. `upstreamItems` = current upstream.item (id, dataset_id).
   * Writes a new store snapshot; returns (recalculated, fixed, deleted).
   */
  def applyEdits(
      store: DeviationStore,
      batch: OsmEditBatch,
      recomputeView: () => DataFrame,
      upstreamItems: DataFrame,
      viewName: String,
      actionTs: java.sql.Timestamp): (Long, Long, Long) = {

    // per-view partitioned store: read ONLY this view's snapshot
    val dev = store.latestFor(viewName).cache()

    val elemKey = (d: DataFrame) =>
      d.select(col("id").as("e_id"), col("type").as("e_type"),
               col("tags").as("e_tags"))

    // --- classify per trigger semantics ---
    val onDeleted: DataFrame = batch.deleted.map { del =>
      dev.join(del.select(col("id").as("e_id"), col("type").as("e_type")),
        col("osm_element_id") === col("e_id") && col("osm_element_type") === col("e_type"),
        "inner").drop("e_id", "e_type")
    }.getOrElse(dev.limit(0))

    // QUIRK PARITY (15:172-180): the reference's tag_diff never returns NULL
    // (it coalesces to '{}'), so no view writer ever stores NULL
    // suggested_tags and the delete trigger's both-NULL "mark fixed" branch
    // is dead in the reference too; likewise an anti-leg row (ids = [],
    // array_length = NULL in PG) matches NEITHER branch and keeps its
    // dangling element reference after a delete. Both behaviors reproduced
    // deliberately.
    val delFixed = onDeleted.filter(col("suggested_geom").isNull && col("suggested_tags").isNull)
    val delRecalc = onDeleted.filter(
      !(col("suggested_geom").isNull && col("suggested_tags").isNull) &&
        size(col("upstream_item_ids")) > 0)

    val onUpdated: DataFrame = batch.updated.map { upd =>
      dev.join(elemKey(upd),
        col("osm_element_id") === col("e_id") && col("osm_element_type") === col("e_type"),
        "inner")
    }.getOrElse(dev.limit(0).withColumn("e_tags", lit(null).cast("map<string,string>")))

    val updFixed = onUpdated.filter(
      col("suggested_geom").isNull && col("suggested_tags").isNotNull &&
        tagDiffEmpty(col("e_tags"), col("suggested_tags")))
      .drop("e_id", "e_type", "e_tags")
    val updRecalc = onUpdated.filter(
      !(col("suggested_geom").isNull && col("suggested_tags").isNotNull &&
        tagDiffEmpty(col("e_tags"), col("suggested_tags"))))
      .drop("e_id", "e_type", "e_tags")

    val insRecalc: DataFrame = batch.inserted.map { ins =>
      val openMissing = SpatialJoin.withGeoMeta(
        dev.filter(col("osm_element_id").isNull && col("suggested_geom").isNotNull),
        "suggested_geom")
      // new elements within 100 m of an open suggestion (fixed radius, T5)
      SpatialJoin.dwithinCandidates(
          build = ins, probe = openMissing,
          buildGeom = "geom", probeGeom = "suggested_geom",
          spec = DWithinSpec(100.0, 1000.0))
        .select(dev.columns.map(c => col(s"p_$c").as(c)): _*)
    }.getOrElse(dev.limit(0))

    val key = DeviationStore.keyCols :+ "view_name"

    // toRecalc is read FOUR times (match join, unmatched split, counts,
    // touchedKeys) — cache it; it is bounded by the edit batch's dirty rows
    val toRecalc = withK(delRecalc.unionByName(updRecalc).unionByName(insRecalc)
      .dropDuplicates(key)).cache()
    val toFix = delFixed.unionByName(updFixed).dropDuplicates(key)

    // --- recalculate against the fresh view ---
    // cache the recompute: it feeds both the counts action and commitView's
    // write — uncached, the (dominant) view recompute ran twice per batch.
    // The reference materializes the same thing (mv_match + the view scan).
    val view = recomputeView().withColumn("view_name", lit(viewName)).cache()
    val vk = view.columns.foldLeft(view)((d, c) => d.withColumnRenamed(c, "v_" + c))
    // The reference matches `upstream_item_ids = $1.upstream_item_ids OR
    // (element equality)` (15:73-75) — but PG's `'{}' = '{}'` is TRUE, and
    // SELECT INTO then picks ONE arbitrary row. A join form must NOT
    // replicate the empty-to-empty disjunct: it would cross-match every
    // anti-leg row of the view (same dataset/layer, ids = []) instead of
    // picking one. Anti-leg rows carry their identity in the element columns,
    // so the element disjunct alone finds the intended row deterministically.
    val matchCond =
      col("dataset_id") === col("v_dataset_id") &&
      col("layer_id") === col("v_layer_id") && (
        (size(col("upstream_item_ids")) > 0 &&
         col("upstream_item_ids") <=> col("v_upstream_item_ids")) ||
        (col("osm_element_id").isNotNull &&
         col("osm_element_id") <=> col("v_osm_element_id") &&
         col("osm_element_type") <=> col("v_osm_element_type")))

    val joined = toRecalc.join(vk, matchCond, "left")

    // ONE view row per recalculated deviation, like the reference's SELECT
    // INTO (15:73) — but deterministic: prefer the ids-equality match, then
    // order by the view row's identity columns. Without this, a store row
    // whose item re-matched a new element AND whose old element is still in
    // the view would emit TWO updates where the reference writes one.
    val pickW = org.apache.spark.sql.expressions.Window.partitionBy(col("__k"))
      .orderBy(
        (!(col("upstream_item_ids") <=> col("v_upstream_item_ids"))).cast("int"),
        element_at(col("v_upstream_item_ids"), 1).asc_nulls_last,
        col("v_osm_element_id").asc_nulls_last, col("v_osm_element_type"))
    val matched = joined.filter(col("v_dataset_id").isNotNull)
      .withColumn("__pick", row_number().over(pickW))
      .filter(col("__pick") === 1)
      .select(
        col("dataset_id"), col("layer_id"),
        col("upstream_item_ids"),
        col("v_suggested_geom").as("suggested_geom"),
        col("v_suggested_tags").as("suggested_tags"),
        col("v_osm_element_id").as("osm_element_id"),
        col("v_osm_element_type").as("osm_element_type"),
        col("v_title").as("title"),
        col("v_description").as("description"),
        col("note"), col("view_name"), col("center"),
        col("municipality_code"), col("action"), col("action_at"))
      .dropDuplicates(Seq("dataset_id", "layer_id", "upstream_item_ids",
        "osm_element_id", "osm_element_type")) // store key stays unique

    val unmatched = joined.filter(col("v_dataset_id").isNull)
      .select(toRecalc.columns.map(col): _*)
    // upstream items still present? (explode ids, semi-join items)
    val stillExistKeys = unmatched
      .withColumn("__iid", explode_outer(col("upstream_item_ids")))
      .join(upstreamItems.select(col("id").as("__iid")).distinct(), Seq("__iid"), "left_semi")
      .select("__k").distinct()
    val stillExists = unmatched.join(stillExistKeys, Seq("__k"), "left_semi")
    val gone = unmatched.join(stillExistKeys, Seq("__k"), "left_anti")

    val fixedFromRecalc = stillExists
      .withColumn("action", lit("fixed"))
      .withColumn("action_at", lit(actionTs))
    val deletedRows = gone.filter(col("action").isNull || col("action") === "deferred")
    val keptGone = gone.filter(col("action").isNotNull && col("action") =!= "deferred")

    val fixed = withK(toFix)
      .withColumn("action", lit("fixed"))
      .withColumn("action_at", lit(actionTs))

    // --- merge: untouched ∪ matched-updates ∪ fixed ∪ kept ---
    val touchedKeys = toRecalc.select("__k").unionByName(fixed.select("__k")).distinct()
    val untouched = withK(dev).join(touchedKeys, Seq("__k"), "left_anti")

    val cols = DeviationStore.schema.fieldNames.map(col)
    val result = untouched.select(cols: _*)
      .unionByName(matched.select(cols: _*))
      .unionByName(fixedFromRecalc.select(cols: _*))
      .unionByName(keptGone.select(cols: _*))
      .unionByName(fixed.select(cols: _*))

    // ONE aggregation for all three returned metrics (the pipelineCounts
    // flag-column pattern, VERDICT r2 #9) — the r2 code ran 4 separate count
    // actions, each a full job over the same joins
    val cnts = toRecalc.select(lit("recalc").as("__st"))
      .unionByName(fixedFromRecalc.select(lit("fixed").as("__st")))
      .unionByName(fixed.select(lit("fixed").as("__st")))
      .unionByName(deletedRows.select(lit("deleted").as("__st")))
      .groupBy("__st").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nRecalc = cnts.getOrElse("recalc", 0L)
    val nFixed = cnts.getOrElse("fixed", 0L)
    val nDeleted = cnts.getOrElse("deleted", 0L)
    store.commitView(viewName, result, s"incremental:$viewName")
    dev.unpersist(); toRecalc.unpersist(); view.unpersist()
    (nRecalc, nFixed, nDeleted)
  }
}
