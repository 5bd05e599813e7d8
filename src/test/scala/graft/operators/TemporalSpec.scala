package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** Differential tests for the event-time operator family (as-of join /
  * interval range join / gap sessionization) against in-memory brute
  * force, plus the loud-guard and plan-shape contracts. */
class TemporalSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  // ---- as-of join ---------------------------------------------------------

  // deliberately includes duplicate (key, ts) rows on BOTH sides and
  // left timestamps exactly equal to right ones (tie must match)
  private val asofLeft: Seq[(Long, Long, String)] = {
    val r = rng(11)
    (0 until 200).map(i => (r.nextInt(6).toLong, r.nextInt(100).toLong, s"l$i"))
  }
  private val asofRight: Seq[(Long, Long, Long, Double)] = {
    val r = rng(23)
    (0 until 150).map(i => (r.nextInt(6).toLong, r.nextInt(100).toLong, i.toLong, r.nextInt(1000) / 10.0))
  }

  private def bruteAsof(tol: Option[Long]): Seq[(Long, Long, String, Option[(Long, Long, Double)])] =
    asofLeft.map { case (k, lts, tag) =>
      val cands = asofRight.filter { case (rk, rts, _, _) => rk == k && rts <= lts &&
        tol.forall(t => lts - rts <= t) }
      val best = if (cands.isEmpty) None else {
        val maxTs = cands.map(_._2).max
        // dedup rule: max tie column (rid) wins within equal (key, ts)
        Some(cands.filter(_._2 == maxTs).maxBy(_._3)).map(c => (c._2, c._3, c._4))
      }
      (k, lts, tag, best)
    }

  private def runAsof(tol: Option[Long]) = {
    val l = asofLeft.toDF("k", "ts", "tag")
    val r = asofRight.toDF("k", "ts", "rid", "px")
    Temporal.asofJoin(l, r, Seq("k"), "ts", tieCol = "rid",
        tolerance = tol.map(t => (lc: org.apache.spark.sql.Column, rc: org.apache.spark.sql.Column) => lc - rc <= lit(t)))
      .collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getString(2),
        if (row.isNullAt(3)) None
        else Some((row.getLong(3), row.getLong(4), row.getDouble(5)))))
      .toSeq
  }

  test("asofJoin == brute force (dup timestamps, equal-ts ties, outer rows)") {
    val got = runAsof(None).sortBy(r => (r._1, r._2, r._3))
    val exp = bruteAsof(None).sortBy(r => (r._1, r._2, r._3))
    assert(got.size == asofLeft.size) // left outer: every left row survives
    assert(got == exp)
  }

  test("asofJoin tolerance nulls too-old matches but keeps the row") {
    val got = runAsof(Some(10L)).sortBy(r => (r._1, r._2, r._3))
    val exp = bruteAsof(Some(10L)).sortBy(r => (r._1, r._2, r._3))
    assert(got == exp)
    assert(got.exists(_._4.isEmpty) && got.exists(_._4.nonEmpty))
  }

  test("asofJoin NULL semantics match SQL joins: null right key/ts never matches") {
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "nullkey"),
        (Some(1L), None, "nullts"))
      .toDF("k", "ts", "tag")
    val r = Seq((Some(1L), Some(5L), 1L, 1.0),   // valid: matches "a"
        (None, Some(1L), 2L, 2.0),               // null key: must never match
        (Some(1L), None, 3L, 3.0))               // null ts: must never match
      .toDF("k", "ts", "rid", "px")
    val got = Temporal.asofJoin(l, r, Seq("k"), "ts", tieCol = "rid")
      .collect().map(row => (row.getString(2),
        if (row.isNullAt(4)) None else Some(row.getLong(4)))).toMap
    assert(got == Map("a" -> Some(1L), "nullkey" -> None, "nullts" -> None))
  }

  test("asofJoin plans as window, not a join (no cartesian/BNL, bounded exchanges)") {
    val l = asofLeft.toDF("k", "ts", "tag")
    val r = asofRight.toDF("k", "ts", "rid", "px")
    val plan = Temporal.asofJoin(l, r, Seq("k"), "ts", tieCol = "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"))
    assert("Exchange".r.findAllIn(plan).size <= 2,
      s"expected <=2 exchanges (right dedup + window):\n$plan")
  }

  // ---- range join ---------------------------------------------------------

  private val intsLeft: Seq[(Long, Double, Double)] = {
    val r = rng(31)
    (0 until 120).map { i =>
      val s = r.nextInt(1000) / 2.0
      (i.toLong, s, s + r.nextInt(120) / 2.0) // lengths 0..60, bins of 20
    }
  }
  private val intsRight: Seq[(Long, Double, Double)] = {
    val r = rng(41)
    (0 until 140).map { i =>
      val s = r.nextInt(1000) / 2.0
      (i.toLong, s, s + r.nextInt(120) / 2.0)
    }
  }

  test("rangeJoin == brute-force interval overlap, each pair exactly once") {
    val l = intsLeft.toDF("lid", "ls", "le")
    val r = intsRight.toDF("rid", "rs", "re")
    val got = Temporal.rangeJoin(l, r, "ls", "le", "rs", "re", binWidth = 20.0)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val exp = for {
      (lid, ls, le) <- intsLeft
      (rid, rs, re) <- intsRight
      if ls <= re && rs <= le
    } yield (lid, rid)
    assert(got.size == got.distinct.size, "pair emitted in more than one bin")
    assert(got.sorted == exp.sorted)
  }

  test("rangeJoin fails loudly on inverted intervals and on bin blow-ups") {
    val l = Seq((1L, 10.0, 5.0)).toDF("lid", "ls", "le") // end < start
    val r = intsRight.toDF("rid", "rs", "re")
    val e = intercept[Exception] {
      Temporal.rangeJoin(l, r, "ls", "le", "rs", "re", binWidth = 20.0).count()
    }
    assert(e.getMessage != null)
    val wide = Seq((1L, 0.0, 1e9)).toDF("lid", "ls", "le") // >1024 bins
    val e2 = intercept[Exception] {
      Temporal.rangeJoin(wide, r, "ls", "le", "rs", "re", binWidth = 20.0).count()
    }
    assert(e2.getMessage != null)
  }

  // ---- sessionize ---------------------------------------------------------

  // gaps around the exact boundary: 1800 s continues, 1801 s starts anew
  private val sessEvents: Seq[(Long, Long, Long)] = {
    val r = rng(53)
    (0L until 8L).flatMap { u =>
      var t = 1000000L * u
      (0 until 40).map { i =>
        t += (if (r.nextInt(4) == 0) 1801L else if (r.nextInt(3) == 0) 1800L
              else r.nextInt(1700).toLong)
        (u, t * 1000000L, i.toLong) // micros
      }
    }
  }

  test("sessionize drops null-ts rows instead of corrupting neighbors' gaps") {
    val df = Seq((1L, Some(1000L), 1L), (1L, None, 2L), (1L, Some(2000L), 3L))
      .toDF("user_id", "ts_us", "eid")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val got = Temporal.sessionize(df, "user_id", "ts", gapSeconds = 1.0,
        tieCols = Seq("eid"))
      .select("eid", "session_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 3L -> 1L)) // 1 ms apart: same session, null row gone
  }

  test("sessionize == brute force incl. the exact-gap boundary") {
    val df = sessEvents.toDF("user_id", "ts_us", "eid")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    val got = Temporal.sessionize(df, "user_id", "ts", gapSeconds = 1800.0,
        tieCols = Seq("eid"))
      .select("user_id", "eid", "session_id").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val exp = sessEvents.groupBy(_._1).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._2, e._3))
      var sid = 0L; var prev = Option.empty[Long]
      sorted.map { case (_, ts, eid) =>
        if (prev.forall(p => ts - p > 1800L * 1000000L)) sid += 1
        prev = Some(ts)
        ((u, eid), sid)
      }
    }
    assert(got == exp)
  }
}
