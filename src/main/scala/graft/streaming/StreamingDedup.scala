package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Dedup-at-ingest with EXPLICIT per-key state — the brief's
 * `KeyValueGroupedDataset.flatMapGroupsWithState` surface: the first document
 * seen for each content fingerprint is emitted, every later copy is dropped
 * at the ingest boundary (so downstream shuffles never carry the duplicate
 * mass; the batch `Dedup.dedupPipeline` is the right tool for retroactive
 * corpus dedup, this is the right tool in front of it).
 *
 * Scale design: state is ONE boolean per distinct fingerprint inside the
 * watermark horizon. With `expireState = true` an event-time timeout drops a
 * key's state `stateTtlMs` after its last-seen event time, so the state
 * store is bounded by (distinct docs per TTL window), not by the corpus —
 * the price is that a duplicate arriving after the TTL re-emits. With
 * expiry off the operator is an exact all-time dedup whose state grows with
 * the distinct corpus (also the batch-mode configuration: batch execution
 * has no watermark, so timeouts are unavailable there by Spark's rules).
 *
 * Within one micro-batch the winner is deterministic: min (ts, doc_id), not
 * iterator order — which is what makes the batch form of this operator
 * SQL-oracle-able (ROW_NUMBER over (fp ORDER BY ts, doc_id) = 1).
 */
object StreamingDedup {

  final case class DocIn(fp: String, doc_id: Long, ts: java.sql.Timestamp)
  final case class FirstSeen(fp: String, doc_id: Long)

  /**
   * @param docs        streaming or batch frame holding idCol/textCol/tsCol
   * @param watermarkDelay max event-time disorder tolerated before state
   *                    eviction decisions (streaming only)
   * @param stateTtlMs  state lifetime past a key's last-seen event time
   * @param expireState true = bounded state via EventTimeTimeout (requires a
   *                    streaming query with the watermark); false = exact
   *                    all-time dedup / batch mode
   */
  def firstSeenDedup(docs: DataFrame, idCol: String, textCol: String,
                     tsCol: String, watermarkDelay: String = "1 hour",
                     stateTtlMs: Long = 3600000L,
                     expireState: Boolean = true): Dataset[FirstSeen] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the id cast must be loud: cast("long") on a string/UUID id column
    // nulls EVERY row and the null-drop below would silently emit an empty
    // result (r3 review finding) — per-row bad data is dropped, a wrongly
    // typed SCHEMA is an error
    val idType = docs.schema(idCol).dataType
    require(org.apache.spark.sql.GraftBridge.isIntegral(idType),
      s"firstSeenDedup: $idCol must be an integral id column, got $idType")
    val in = docs.select(
        md5(encode(col(textCol), "UTF-8")).as("fp"),
        col(idCol).cast("long").as("doc_id"),
        col(tsCol).cast("timestamp").as("ts"))
      // a row without identity, content, or event time cannot participate in
      // event-time first-seen dedup — dropped HERE, visibly, rather than
      // NPE-ing inside the state function (null ts passes the watermark
      // operator; the primitive-Long encoder rejects null ids)
      .filter(col("doc_id").isNotNull && col("fp").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[DocIn]
    val timeoutConf =
      if (expireState) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    in.groupByKey(_.fp)
      .flatMapGroupsWithState[Boolean, FirstSeen](OutputMode.Append, timeoutConf) {
        (fp: String, rows: Iterator[DocIn], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // timeout invocation (no data for this key this trigger, watermark
            // passed the timeout): drop the boolean — the key's next copy
            // will be treated as first-seen again, which is the documented
            // TTL trade for bounded state
            state.remove()
            Iterator.empty
          } else {
            // one O(1)-memory pass over the iterator: a duplicate-heavy key
            // (the exact case this operator absorbs) can carry millions of
            // copies per trigger — buffering them in an Array would OOM the
            // executor for a min/max the fold computes in place
            var n = 0L
            var maxTs = Long.MinValue
            var bestTs = Long.MaxValue
            var bestId = Long.MaxValue
            while (rows.hasNext) {
              val r = rows.next(); n += 1
              val t = r.ts.getTime
              if (t > maxTs) maxTs = t
              if (t < bestTs || (t == bestTs && r.doc_id < bestId)) {
                bestTs = t; bestId = r.doc_id
              }
            }
            if (n == 0) Iterator.empty
            else {
              val alreadySeen = state.exists
              state.update(true)
              if (expireState) {
                // must be strictly above the current watermark or Spark
                // rejects the timestamp (the key would be already expired)
                state.setTimeoutTimestamp(
                  math.max(maxTs + stateTtlMs, state.getCurrentWatermarkMs() + 1))
              }
              if (alreadySeen) Iterator.empty
              else Iterator.single(FirstSeen(fp, bestId))
            }
          }
      }
  }
}
