package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/**
 * Plan-quality gates (SURVEY.md §4): the declarative queries must produce
 * the physical plans a 100 TB deployment needs — pushed parquet filters,
 * broadcast joins for dims, whole-stage codegen on the hot path. Guards
 * against regressions that silently de-optimize (e.g. a UDF slipping into a
 * filter and killing pushdown).
 */
class PlanQualitySpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  private def plan(q: String): String =
    finalPlan(SparkEntry.queries(q)(spark, dir))

  test("q6 selective scan pushes filters into the parquet reader") {
    val p = plan("q6_filter")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("l_shipdate") && p.contains("l_quantity"))
  }

  test("q2 joins dims via broadcast, not shuffle") {
    val p = plan("q2_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q1 aggregates with map-side partial aggregation inside codegen") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"), p.take(2000))
    // formatted mode marks codegen'd operators with [codegen id : N]
    assert(p.contains("codegen id"), p.take(2000))
  }

  test("match candidate refinement stays native (no UDF filter)") {
    val pages = graft.sources.Pages.synthesize(spark, 100L)
    val m = BenchPipeline.matchRows(pages, cacheInputs = false)
    val p = finalPlan(m)
    // the dist refinement + match condition must appear as native SQRT /
    // map-key expressions (Catalyst rewrites map_contains_key to
    // array_contains(map_keys)); the only allowed UDF is the non-point
    // distance fallback branch inside the CASE
    assert(p.contains("SQRT"), "point distance should be native arithmetic")
    assert(p.contains("array_contains(map_keys") || p.contains("map_contains_key"),
      "tag predicate should be native map access")
    assert(p.contains("lower("), "name tier should be native lower() equality")
  }
}
