package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Pages

/** Constant-density synthesis (VERDICT r4 #1 fixture mode): scaling the
  * bbox area with nSites must preserve the fixture's STATISTICS — a site's
  * OSM twin stays ≤80 m away, so per-site match/deviation rates hold. The
  * round-5 sweep's first pass caught exactly this failing (the OSM side
  * kept the unscaled box and every upstream row went "Missing"); this spec
  * is the regression pin. */
class ConstantDensitySpec extends AnyFunSuite {
  val spark = SparkTestBase.spark

  test("ref == n constant-density fixture is row-identical to the default") {
    val a = Pages.synthesize(spark, 3000L)
    val b = Pages.synthesize(spark, 3000L, densityRefSites = Some(3000L))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("per-site match/deviation rates hold when the area scales 4x") {
    val (m1, d1) = BenchPipeline.pipelineCounts(spark, 5000L)
    val (m4, d4) = BenchPipeline.pipelineCounts(spark, 20000L, Some(5000L))
    val (mr1, mr4) = (m1 / 5000.0, m4 / 20000.0)
    val (dr1, dr4) = (d1 / 5000.0, d4 / 20000.0)
    assert(math.abs(mr4 - mr1) < 0.05,
      s"per-site match rate moved under area scaling: $mr1 -> $mr4")
    assert(math.abs(dr4 - dr1) < 0.05,
      s"per-site deviation rate moved under area scaling: $dr1 -> $dr4")
    assert(d4 < 0.9 * 20000L, "every site deviating = twins lost their sites")
  }
}
