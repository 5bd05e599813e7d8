package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Generic relational operators (SURVEY.md §2.2/2.4/2.5/2.6/2.7/2.8) exposed
 * through the driver's correctness gate, oracle-checked against DuckDB.
 *
 * FP-determinism recipe used throughout: double arithmetic (IEEE-identical
 * across engines) -> cast to DECIMAL(20,6) BEFORE aggregation (exact sums)
 * -> round at decimal precision -> cast back to double (both engines produce
 * the correctly-rounded double of the same rational). Column names are
 * aliased identically in Spark and SQL — the driver hashes by sorted name.
 */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    round(sum(c.cast("decimal(20,6)")), scale).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A-family: group aggregates with map-side partial agg (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // J8-family: multi-way equi join; dims broadcast (plan-checked in specs)
    "q2_join" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name").isin("ASIA", "EUROPE"))
        .groupBy(n("n_name").as("nation"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(o("o_totalprice")).as("total_price"))
    }),

    // W2: rank-1..k per group with pinned total order
    "q3_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long")) // BIGINT like the oracle's ROW_NUMBER
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    }),

    // J5: anti join (NOT EXISTS) — customers with no 1995 order (every
    // customer has SOME order in this data, so the date scoping makes the
    // anti set non-trivial)
    "q4_antijoin" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // semi join (EXISTS)
    "q5_semijoin" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
    }),

    // P1/P2: selective scan with pushed filters (TPC-H Q6 shape)
    "q6_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
                col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
                col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
             count(lit(1)).as("n_rows"))
    }),

    // set ops: UNION (distinct)
    "q7_union" -> ((s, dir) => {
      val a = t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("1993-01-01").cast("timestamp"))
        .select(col("l_suppkey").as("suppkey"))
      val b = t(s, dir, "supplier").filter(col("s_nationkey") < 5)
        .select(col("s_suppkey").as("suppkey"))
      a.union(b).distinct()
    }),

    // string predicates + min/max aggregates
    "q8_strings" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_name").contains("a") && col("p_size") >= 10)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"),
             max(upper(col("p_name"))).as("max_name"),
             min(col("p_retailprice").cast("decimal(20,6)")).cast("double").as("min_price"))
    }),

    // T-family batch equivalent: tumbling hourly window over the event stream
    "q9_events_hourly" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             dsum(col("value")).as("sum_value"),
             countDistinct(col("user_id")).as("n_users"))
    }),

    // global sort + limit (top-k)
    "q10_top_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    }),

    // LATERAL-explode analog: order-priority histogram via explode of split
    "q11_explode" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("word", explode(split(col("o_orderpriority"), "-")))
        .groupBy("word").agg(count(lit(1)).as("n"))
    }),

    // regexp projection (P3-style attribute parsing) on the events props JSON
    "q12_regexp" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
    }))

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_qty,
        | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_base_price,
        | CAST(ROUND(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_join" ->
      """SELECT n_name AS nation, COUNT(*) AS n_orders,
        | CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,6))), 2) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA','EUROPE') GROUP BY n_name""".stripMargin,
    "q3_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        | SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        | FROM orders) WHERE rn <= 3""".stripMargin,
    "q4_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')""".stripMargin,
    "q5_semijoin" ->
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
        |  AND l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01')""".stripMargin,
    "q6_filter" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice*l_discount AS DECIMAL(20,6))), 2) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q7_union" ->
      """SELECT l_suppkey AS suppkey FROM lineitem WHERE l_shipdate < TIMESTAMP '1993-01-01'
        |UNION
        |SELECT s_suppkey AS suppkey FROM supplier WHERE s_nationkey < 5""".stripMargin,
    "q8_strings" ->
      """SELECT p_brand, COUNT(*) AS n_parts, MAX(UPPER(p_name)) AS max_name,
        | CAST(MIN(CAST(p_retailprice AS DECIMAL(20,6))) AS DOUBLE) AS min_price
        |FROM part WHERE POSITION('a' IN p_name) > 0 AND p_size >= 10
        |GROUP BY p_brand""".stripMargin,
    "q9_events_hourly" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n_events,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(20,6))), 2) AS DOUBLE) AS sum_value,
        | COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q10_top_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q11_explode" ->
      """SELECT word, COUNT(*) AS n FROM (
        | SELECT UNNEST(STRING_SPLIT(o_orderpriority, '-')) AS word FROM orders)
        |GROUP BY word""".stripMargin,
    "q12_regexp" ->
      """SELECT event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(REGEXP_EXTRACT(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        | MAX(CAST(REGEXP_EXTRACT(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin)
}
