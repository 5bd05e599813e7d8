package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Event-time operator family (operators/Temporal.scala) behind the DuckDB
 * oracle: backward as-of join (DuckDB re-derives it with its own native
 * ASOF LEFT JOIN — an independent implementation, not a transcription),
 * interval range join (plain inequality join on the oracle side vs the
 * binned equi-join on the Spark side), and gap sessionization (window-SQL
 * recompute). All inputs come straight from the driver's events/orders
 * parquet, no synthesis.
 */
object QueriesTemporal {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    round(sum(c.cast("decimal(20,6)")), scale).cast("double")

  /** Modular interval fixtures over the first 2000 order keys (integral
    * doubles — bin math bit-exact in both engines). limit() collapses to
    * one partition, so repartition after (the QueriesEmbOracle lesson). */
  private def intervals(s: SparkSession, dir: String, mulA: Int, addA: Int,
                        lenMod: Int, idName: String, sName: String, eName: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey").as(idName))
      .orderBy(idName).limit(2000).repartition(8)
      .withColumn(sName, pmod(col(idName) * mulA + addA, lit(1000)).cast("double"))
      .withColumn(eName, col(sName) + pmod(col(idName), lit(lenMod)).cast("double"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // backward as-of: every purchase picks the user's latest signup at or
    // before it; unmatched purchases survive with null right columns
    "q_tm_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val l = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id", "value")
      val r = ev.filter(col("event_type") === "signup")
        .select("user_id", "ts", "event_id", "value")
      graft.operators.Temporal.asofJoin(l, r, Seq("user_id"), "ts", tieCol = "event_id")
    }),

    // interval overlap join, aggregated per left interval (pair set ~100k
    // -> a compact deterministic frame)
    "q_tm_range" -> ((s, dir) => {
      val l = intervals(s, dir, 7, 0, 37, "lid", "ls", "le")
      val r = intervals(s, dir, 13, 5, 29, "rid", "rs", "re")
      graft.operators.Temporal.rangeJoin(l, r, "ls", "le", "rs", "re", binWidth = 25.0)
        .groupBy("lid")
        .agg(count(lit(1)).as("n_overlaps"),
          min(col("rid")).as("min_rid"), max(col("rid")).as("max_rid"),
          sum(col("rs").cast("long")).as("sum_rs"))
    }),

    // Spark's NATIVE session_window (streaming-capable; batch form here,
    // stream==batch parity in StreamingSpec) — boundary rule is >= gap
    // starts a new session, unlike q_tm_sessions' strict >
    "q_stream_sessions" -> ((s, dir) =>
      graft.streaming.StreamingIngest.sessionsAgg(
        t(s, dir, "events"), "user_id", "ts", "30 minutes")),

    // gap sessionization (30 min) summarized per session
    "q_tm_sessions" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Temporal
        .sessionize(ev, "user_id", "ts", gapSeconds = 1800.0, tieCols = Seq("event_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          dsum(col("value")).as("sum_value"))
    }))

  val oracle: Map[String, String] = Map(
    "q_tm_asof" ->
      """WITH l AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
        |r0 AS (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'signup'),
        |r AS (SELECT user_id, ts, event_id, value FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM r0) WHERE rn = 1)
        |SELECT l.user_id, l.ts, l.event_id, l.value,
        |       r.ts AS r_ts, r.event_id AS r_event_id, r.value AS r_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,
    "q_tm_range" ->
      """WITH ks AS (SELECT o_orderkey AS k FROM orders ORDER BY k LIMIT 2000),
        |l AS (SELECT k AS lid, CAST((k * 7) % 1000 AS DOUBLE) AS ls,
        |             CAST((k * 7) % 1000 + k % 37 AS DOUBLE) AS le FROM ks),
        |r AS (SELECT k AS rid, CAST((k * 13 + 5) % 1000 AS DOUBLE) AS rs,
        |             CAST((k * 13 + 5) % 1000 + k % 29 AS DOUBLE) AS re FROM ks)
        |SELECT lid, COUNT(*) AS n_overlaps, MIN(rid) AS min_rid, MAX(rid) AS max_rid,
        |       CAST(SUM(CAST(rs AS BIGINT)) AS BIGINT) AS sum_rs
        |FROM l JOIN r ON l.ls <= r.re AND r.rs <= l.le
        |GROUP BY lid""".stripMargin,
    "q_stream_sessions" ->
      """WITH d AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM d)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "q_tm_sessions" ->
      """WITH d AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM d)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |       MIN(ts) AS session_start, MAX(ts) AS session_end,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_value
        |FROM s GROUP BY 1, 2""".stripMargin)
}
