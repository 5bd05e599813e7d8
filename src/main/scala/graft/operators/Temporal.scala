package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-time operators a large-scale training/event pipeline needs beyond
 * the reference's surface (builder brief "beyond the reference" list):
 * backward as-of join, interval range join, and gap sessionization. All
 * three are declarative single-shuffle plans — no driver loops, no
 * cartesian products, no per-row UDFs — so Catalyst/AQE keep them
 * broadcast-able/skew-splittable at the 100 TB design point.
 *
 * Scale notes per operator are on the methods; the common theme: the as-of
 * join and sessionization are RUNNING window frames (Spark's WindowExec
 * keeps O(1) state for `rowsBetween(unboundedPreceding, currentRow)` —
 * nothing is buffered per key beyond the sort spill), and the range join
 * is the 1-D instance of the grid equi-join used by SpatialJoin: explode
 * to bins, equi-join, first-shared-bin dedup, exact refinement — the same
 * shape that survives the spatial 100× scale-up.
 */
object Temporal {

  private val TS = "__ts"
  private val SIDE = "__side"
  private val LPAY = "__l"
  private val RPAY = "__r"

  /**
   * Backward as-of join: for every left row, the single most recent right
   * row with equal keys and `right.tsCol <= left.tsCol` (ties at equal ts
   * match — the right row sorts first), LEFT OUTER semantics (unmatched
   * left rows keep null right columns). Right columns are emitted as
   * `rightPrefix + name` (key columns once, un-prefixed).
   *
   * Plan: union both sides tagged with a side bit, ONE window over
   * (keys, ts, side) with a running `last(rightPayload, ignoreNulls)` —
   * i.e. one shuffle + one sort, never a join explosion: a key with a
   * million quotes and a million trades costs O(n log n) sort, not O(n²)
   * pairing. The running frame is computed incrementally (no per-key
   * buffering). Per-key order is total (ts, side, right tie columns), so
   * results are deterministic when (keys, tsCol) collide IF the caller's
   * right side is deduped per (keys, ts) — `asofJoin` does that itself
   * with `tieCol` (keeps the max) so the pick never depends on partition
   * order.
   *
   * `tolerance`: optional predicate on (leftTs, matchedRightTs) — e.g.
   * `(l, r) => unix_micros(l) - unix_micros(r) <= lit(3600L * 1000000L)`;
   * a match outside it is nulled (the row stays, outer-style).
   *
   * NULL semantics follow SQL joins: right rows with a null key or null ts
   * can never match and are dropped; left rows with null key/ts survive
   * unmatched (a null-ts left row sorts before every right row of its key).
   */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, tieCol: String,
               tolerance: Option[(Column, Column) => Column] = None,
               rightPrefix: String = "r_"): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin needs at least one key column")
    require(!keyCols.contains(tsCol), "tsCol must not be a key column")
    require(!left.columns.contains(TS) && !right.columns.contains(TS),
      s"reserved column name $TS in input")
    val rValueCols = right.columns.filterNot(keyCols.contains).toSeq
    require(rValueCols.contains(tsCol),
      s"right side lacks ts column $tsCol")
    val clashes = left.columns.toSet
      .intersect(rValueCols.map(rightPrefix + _).toSet)
    require(clashes.isEmpty,
      s"left columns collide with prefixed right outputs: ${clashes.mkString(", ")}")

    // SQL join semantics: a NULL never equals anything and a NULL ts is
    // never "at or before" — but a window PARTITIONs null keys together
    // and sorts null ts FIRST (where a null-ts right row would become the
    // match for every left row of its key). Dropping right rows with any
    // null key/ts restores join semantics exactly: a null-key left row
    // then partitions alone (no right rows) and stays unmatched.
    val rClean = (keyCols :+ tsCol).foldLeft(right)((df, c) => df.filter(col(c).isNotNull))
    // one right row per (keys, ts): keep the max tieCol — a deterministic
    // rule both engines (and the DuckDB oracle) can reproduce
    val rw = Window.partitionBy((keyCols :+ tsCol).map(col): _*)
      .orderBy(col(tieCol).desc)
    val rDedup = rClean
      .withColumn("__rn", row_number().over(rw)).filter(col("__rn") === 1)
      .drop("__rn")

    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as(TS), lit(1).as(SIDE),
        struct(left.columns.filterNot(keyCols.contains).map(col): _*).as(LPAY),
        lit(null).cast(structType(rDedup, rValueCols)).as(RPAY)): _*)
    val rTagged = rDedup.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as(TS), lit(0).as(SIDE),
        lit(null).cast(structType(left, left.columns.filterNot(keyCols.contains).toSeq)).as(LPAY),
        struct(rValueCols.map(col): _*).as(RPAY)): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(TS).asc, col(SIDE).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col(RPAY), ignoreNulls = true).over(w)

    val withMatch = lTagged.unionByName(rTagged)
      .withColumn("__m", matchedRaw)
      .filter(col(SIDE) === 1)
    val gated = tolerance match {
      case Some(p) =>
        withMatch.withColumn("__m",
          when(col("__m").isNotNull && p(col(TS), col("__m").getField(tsCol)),
            col("__m")))
      case None => withMatch
    }
    val leftOut = keyCols.map(col) ++
      left.columns.filterNot(keyCols.contains).map(c => col(s"$LPAY.$c").as(c))
    val rightOut = rValueCols.map(c => col(s"__m.$c").as(s"$rightPrefix$c"))
    gated.select(leftOut ++ rightOut: _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))

  /**
   * Interval overlap join over a numeric axis: pairs (l, r) with
   * `l.start <= r.end AND r.start <= l.end` (closed intervals). The 1-D
   * grid equi-join: each interval explodes over its covered bins of width
   * `binWidth`, bins equi-join (shuffle on the bin key — broadcast/AQE
   * applies like any equi-join), and each surviving pair is kept only in
   * the FIRST bin the two intervals share (`bin == max(firstBin_l,
   * firstBin_r)` — exactly one bin qualifies when they overlap, so no
   * distinct/dedup shuffle), then the exact predicate refines. Pick
   * `binWidth` near the median interval length; a row covering more than
   * `maxBinsPerRow` bins fails loudly instead of silently exploding the
   * build side (same contract as SpatialJoin's cover bound). NULL interval
   * bounds also fail loudly (the validity predicate is not TRUE for them)
   * — an interval table with nulls must be cleaned explicitly first.
   */
  def rangeJoin(left: DataFrame, right: DataFrame,
                lStart: String, lEnd: String, rStart: String, rEnd: String,
                binWidth: Double, maxBinsPerRow: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"rangeJoin requires disjoint column names, shared: ${shared.mkString(", ")}")
    def binned(df: DataFrame, s: String, e: String): DataFrame = {
      val b0 = floor(col(s) / binWidth).cast("long")
      val b1 = floor(col(e) / binWidth).cast("long")
      val nBins = b1 - b0 + 1L
      df.filter(when(col(e) >= col(s) && nBins <= maxBinsPerRow.toLong, lit(true))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: bad interval (end < start or > $maxBinsPerRow bins): ["),
            col(s).cast("string"), lit(", "), col(e).cast("string"), lit("]")))))
        .withColumn("__bin", explode(sequence(b0, b1, lit(1L))))
        .withColumn("__fb", b0)
    }
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd).withColumnsRenamed(
      Map("__bin" -> "__rbin", "__fb" -> "__rfb"))
    l.join(r, col("__bin") === col("__rbin") &&
        col("__bin") === greatest(col("__fb"), col("__rfb")) &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .drop("__bin", "__fb", "__rbin", "__rfb")
  }

  /**
   * Gap sessionization: a new session starts when the gap to the key's
   * previous event exceeds `gapSeconds` (strictly greater; an event exactly
   * at the gap continues the session). Appends `session_id` (1-based,
   * per key, in time order). One shuffle + one sort; both window frames
   * are running (lag(1) and a running sum), so state per key is O(1).
   * `tieCols` break equal-timestamp order deterministically (ts collisions
   * otherwise make the lag — and thus session boundaries near the gap —
   * partition-order-dependent). Rows with a NULL ts are dropped (they sort
   * first and would poison the following row's gap computation with a
   * null comparison); null keys group into their own session stream.
   */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Double, tieCols: Seq[String] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    require(!events.columns.contains("session_id"),
      "input already has a session_id column")
    val clean = events.filter(col(tsCol).isNotNull)
    val order = (col(tsCol).asc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col(tsCol), 1).over(w)
    // timestamp difference as a day-time interval: works for TIMESTAMP and
    // TIMESTAMP_NTZ alike, no zone conversion involved
    val gap = make_dt_interval(
      lit(0), lit(0), lit(0), lit(gapSeconds).cast("decimal(18,6)"))
    val newSession = prev.isNull || (col(tsCol) - prev) > gap
    clean
      .withColumn("__ns", newSession.cast("long"))
      .withColumn("session_id", sum(col("__ns")).over(run))
      .drop("__ns")
  }
}
