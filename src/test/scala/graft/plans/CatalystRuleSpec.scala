package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core.geom.Geom
import graft.engine.SparkTestBase
import graft.functions.GeoFunctions

/** SURVEY §4 phase 2: a plain `join(..., st_dwithin(a, b, d))` must PLAN as
  * the bucketed cell equi-join (no cartesian / BNL), produce exactly the
  * brute-force pair set (reference-cell dedup), and keep the refinement in
  * whole-stage codegen via the native expressions. */
class CatalystRuleSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._
  GeoFunctions.registerAll(spark)
  GraftExtensions.install(spark)

  private def rng(seed: Long) = new scala.util.Random(seed)

  // left: mixed points and 400 m boxes (multi-cell covers exercise the
  // reference-cell dedup); right: points
  private val leftRows: Seq[(Long, Array[Byte])] = {
    val r = rng(1)
    (1L to 150L).map { i =>
      val x = r.nextDouble() * 20000; val y = r.nextDouble() * 20000
      val g = if (i % 5 == 0) Geom.envelopePoly(x, y, x + 400, y + 400)
              else Geom.point(x, y)
      (i, Geom.toWkb(g))
    }
  }
  private val rightRows: Seq[(Long, Array[Byte])] = {
    val r = rng(2)
    (1L to 150L).map { i =>
      (i, Geom.toWkb(Geom.point(r.nextDouble() * 20000, r.nextDouble() * 20000)))
    }
  }
  private val expectedPairs: Set[(Long, Long)] = {
    val pairs = for {
      (i, ga) <- leftRows
      (j, gb) <- rightRows
      if Geom.dwithin(Geom.fromWkb(ga), Geom.fromWkb(gb), 500.0)
    } yield (i, j)
    pairs.toSet
  }

  test("join condition st_dwithin rewrites to a bucketed equi-join, exact and duplicate-free") {
    val l = leftRows.toDF("lid", "ga")
    val r = rightRows.toDF("rid", "gb")
    val joined = l.join(r, expr("st_dwithin(ga, gb, 500.0)"))

    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") && !physical.contains("BroadcastNestedLoop"),
      physical.linesIterator.take(25).mkString("\n"))
    assert(physical.contains("cellcover") || physical.contains("CellCover"), "cell cover missing")

    val got = joined.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size, "duplicate pairs — reference-cell dedup broken")
    assert(got.toSet == expectedPairs,
      s"missing=${(expectedPairs -- got.toSet).take(5)} extra=${(got.toSet -- expectedPairs).take(5)}")
  }

  test("filter-after-cross form is pushed into the join and rewritten too") {
    val l = leftRows.toDF("lid", "ga")
    val r = rightRows.toDF("rid", "gb")
    val joined = l.crossJoin(r).filter(expr("st_dwithin(ga, gb, 500.0)"))
    val physical = joined.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct") && !physical.contains("BroadcastNestedLoop"),
      physical.linesIterator.take(25).mkString("\n"))
    assert(joined.count() == expectedPairs.size)
  }

  test("injectOptimizerRule placement (spark.sql.extensions path) is idempotent under pushdown") {
    // ADVICE r2 (high): via spark.sql.extensions the rule sits in the
    // fixed-point operator-optimization batch, where PushPredicateThroughJoin
    // re-materializes st_dwithin in the join condition each iteration — the
    // unguarded rule re-fired per iteration and nested Generate layers until
    // OOM. Build a REAL session through the extensions path (GraftBridge —
    // Builder.getOrCreate can't apply extensions once a session exists).
    val ext = org.apache.spark.sql.GraftBridge.sessionWithExtensions(
      spark.sparkContext, new GraftExtensions()(_))
    try {
      GeoFunctions.registerAll(ext)
      val l = ext.createDataFrame(leftRows).toDF("lid", "ga")
      val r = ext.createDataFrame(rightRows).toDF("rid", "gb")
      val joined = l.join(r, expr("st_dwithin(ga, gb, 500.0)"))
      val opt = joined.queryExecution.optimizedPlan
      val nGen = opt.collect { case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }.size
      assert(nGen == 2, s"expected exactly one Generate per side, got $nGen:\n${opt.treeString.take(1500)}")
      // the rule must be a no-op on the already-optimized (pushed-down) plan
      assert(DWithinJoinRule(opt).fastEquals(opt), "rule re-fired on its own output")
      val got = joined.select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, "duplicate pairs under extensions path")
      assert(got.toSet == expectedPairs)
    } finally {
      // shared context stays up; just drop the active-session pointer
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("native expressions stay in whole-stage codegen") {
    val l = leftRows.toDF("lid", "ga")
    val r = rightRows.toDF("rid", "gb")
    val joined = l.join(r, expr("st_dwithin(ga, gb, 500.0)"))
    // the refinement filter must sit inside a WholeStageCodegen span; with
    // AQE the spans only appear in the FINAL executed plan, so run THIS
    // dataset's own query execution first (count() would plan a new one)
    joined.collect()
    val physical = joined.queryExecution.executedPlan.toString
    assert(physical.contains("WholeStageCodegen") || physical.contains("*("),
      physical.take(800))
    // and evaluating the native predicate standalone matches the kernel
    import org.apache.spark.sql.GraftBridge
    val col = GraftBridge.column(STDWithin(
      GraftBridge.expression(org.apache.spark.sql.functions.col("ga")),
      GraftBridge.expression(org.apache.spark.sql.functions.col("gb")),
      org.apache.spark.sql.catalyst.expressions.Literal(500.0)))
    val n = l.crossJoin(r).filter(col).count()
    assert(n == expectedPairs.size)
  }
}
