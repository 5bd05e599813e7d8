package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin
import graft.operators.SpatialJoin.DWithinSpec

/**
 * Measured evidence for the explicit hot-cell salting (north rule: skew
 * handled explicitly): a build-dense hot cell — the case the histogram
 * pre-pass detects — joined unsalted vs salted at the same parallelism.
 * Unsalted, the single (cell) key serializes the whole hot cell's pair
 * stream into one task; salted, the build mass hash-splits across
 * saltFactor sub-keys and the cores share it. Salting never changes the
 * pair total (correctness pinned in SkewAndTilesSpec); this probe measures
 * the wall-clock redistribution win. Results feed BASELINE.md.
 *
 * Envs: SKEW_BUILD (hot-cell build rows, default 100k), SKEW_PROBE (hot
 * probes, default 500), SKEW_CORES (default 8), SKEW_FACTOR (default 16).
 */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val nBuild = sys.env.getOrElse("SKEW_BUILD", "100000").toLong
    val nProbe = sys.env.getOrElse("SKEW_PROBE", "500").toLong
    val cores = sys.env.getOrElse("SKEW_CORES", "8").toInt
    val factor = sys.env.getOrElse("SKEW_FACTOR", "16").toInt
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("skew-probe")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.sql.adaptive.enabled", "false") // isolate the explicit salt
      // model the 100 TB design point: BOTH sides too big to broadcast. A
      // sandbox-sized probe side would auto-broadcast, making the join
      // embarrassingly parallel and the hot cell invisible — the skew only
      // exists on the shuffled path.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    // one 1000 m hot cell holding every row; coords deterministic
    def side(n: Long, seed: Long) = SpatialJoin.withGeoMeta(
      s.range(n).select(col("id"),
        (lit(660000.0) + pmod(col("id") * seed, lit(1000L)).cast("double")).as("x"),
        (lit(6570000.0) + pmod(col("id") * (seed + 2), lit(1000L)).cast("double")).as("y"))
        .withColumn("geom", graft.functions.GeoFunctions.stPoint(col("x"), col("y"))),
      "geom")
    val build = side(nBuild, 48271L).cache(); build.count()
    val probe = side(nProbe, 94261L).cache(); probe.count()

    def time(spec: DWithinSpec): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SpatialJoin.dwithinCandidates(build, probe, "geom", "geom", spec).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val unsaltedSpec = DWithinSpec(50.0, 1000.0)
    val saltedSpec = DWithinSpec(50.0, 1000.0, saltThreshold = 1000L, saltFactor = factor)
    // warm-up (codegen/JIT both shapes), then interleaved min-of-2
    time(unsaltedSpec); time(saltedSpec)
    val (u1, nu) = time(unsaltedSpec); val (s1, ns) = time(saltedSpec)
    val (u2, _) = time(unsaltedSpec); val (s2, _) = time(saltedSpec)
    require(nu == ns, s"salting changed the pair count: $nu vs $ns")
    val u = math.min(u1, u2); val sa = math.min(s1, s2)
    println(f"SKEWPROBE build=$nBuild probe=$nProbe cores=$cores factor=$factor " +
      f"pairs=$nu unsalted=${u}%.2fs salted=${sa}%.2fs speedup=${u / sa}%.2fx")
    s.stop()
  }
}
