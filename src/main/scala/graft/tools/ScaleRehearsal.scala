package graft.tools

import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/**
 * Round-4 measurement harness (VERDICT r3 #3/#6/#7), one subcommand per ask:
 *
 *   rehearse <cores> <nSites>   — one pipeline run at bench-pipeline config
 *       (AQE off, 4 parts/core) recording wall, GC-time delta, peak heap
 *       and throughput. Run at 4-10x the bench point (10-25M sites) at 8
 *       and 32 cores to show the uncached operating point survives the next
 *       4x without configuration change (BASELINE.md §3d).
 *
 *   aqe <cores> <nSites> <on|off>  — flagship wall-clock with AQE ON
 *       (partitions LEFT TO AQE: shuffle.partitions=256 + coalescing + skew
 *       join, the 1000-executor-cluster defaults) vs the sandbox bench
 *       config (AQE off, explicit 4/core) — the config note for which to
 *       ship at which scale.
 *
 *   density <cores> <nSites> [refSites=2.5M] — constant-density pipeline
 *       run + candidate count (VERDICT r4 #1): bbox area scales with
 *       nSites so the ≤250 m pair count grows ~linearly, the honest
 *       corpus-scale-up fixture. Run at 2.5M/10M/25M × {8,32} cores;
 *       rows/s flat (±20%) + linear candidates = the measured
 *       linear-in-corpus operating point (BASELINE.md §3f).
 *
 *   tagdiff <cores> <nSites>    — 20 ms stack sampler over a pipeline run
 *       measuring the fraction of RUNNABLE executor samples inside
 *       Tags.tagDiff / countKeys (the per-row UDF on the deviation
 *       alternatives-window + post-filter path): promote to a native
 *       expression only if it shows >=10%.
 *
 * All runs are min-of-1 by design — run the tool detached, repeatedly, and
 * read the spread; 2-core-repeatability rules from NOTES_r3 apply.
 */
object ScaleRehearsal {

  private def session(cores: Int, aqeOn: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"rehearsal-$cores")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqeOn.toString)
    val s = (if (aqeOn)
      b.config("spark.sql.shuffle.partitions", "256")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
    else
      b.config("spark.sql.shuffle.partitions", (cores * 4).toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def gcMillis(): Long =
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum

  private def heapPools() =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)

  private def runOnce(s: SparkSession, n: Long,
                      densityRef: Option[Long] = None): (Double, Long, Long) = {
    val t0 = System.nanoTime()
    val (mr, dr) = graft.engine.BenchPipeline.pipelineCounts(s, n, densityRef)
    val sec = (System.nanoTime() - t0) / 1e9
    s.sharedState.cacheManager.clearCache()
    (sec, mr, dr)
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val cores = args(1).toInt
    val n = args(2).toLong

    mode match {
      case "rehearse" =>
        val s = session(cores, aqeOn = false)
        runOnce(s, 50000L) // warm codegen/JIT
        System.gc()
        heapPools().foreach(_.resetPeakUsage())
        val gc0 = gcMillis()
        val (sec, mr, dr) = runOnce(s, n)
        val gcSec = (gcMillis() - gc0) / 1000.0
        val peakGb = heapPools().map(_.getPeakUsage.getUsed).sum / 1e9
        println(f"REHEARSE cores=$cores n=$n sec=$sec%.1f gc_sec=$gcSec%.1f " +
          f"peak_heap_gb=$peakGb%.1f match=$mr dev=$dr " +
          f"rows_per_sec=${(mr + dr) / sec}%.0f")
        s.stop()

      case "aqe" =>
        val aqeOn = args(3) == "on"
        val s = session(cores, aqeOn)
        runOnce(s, 50000L)
        System.gc()
        // two same-size runs, report both (first carries codegen for the
        // exact literals; min is the representative figure)
        val r1 = runOnce(s, n)._1
        System.gc()
        val r2 = runOnce(s, n)._1
        println(f"AQE cores=$cores n=$n aqe=${args(3)} run1=$r1%.1f run2=$r2%.1f min=${math.min(r1, r2)}%.1f")
        s.stop()

      case "tagdiff" =>
        val s = session(cores, aqeOn = false)
        runOnce(s, 50000L)
        System.gc()
        @volatile var stop = false
        val total = new java.util.concurrent.atomic.AtomicLong
        val inTagDiff = new java.util.concurrent.atomic.AtomicLong
        val inUdfAny = new java.util.concurrent.atomic.AtomicLong
        val sampler = new Thread(() => {
          while (!stop) {
            Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
              if (t.getName.startsWith("Executor task launch") &&
                  t.getState == Thread.State.RUNNABLE) {
                total.incrementAndGet()
                val names = frames.map(f => f.getClassName + "." + f.getMethodName)
                if (names.exists(x => x.contains("Tags$") &&
                    (x.contains("tagDiff") || x.contains("countKeys") ||
                     x.contains("newTagValue"))))
                  inTagDiff.incrementAndGet()
                if (names.exists(_.contains("ScalaUDF")))
                  inUdfAny.incrementAndGet()
              }
            }
            Thread.sleep(20)
          }
        })
        sampler.setDaemon(true); sampler.start()
        val (sec, mr, dr) = runOnce(s, n)
        stop = true; Thread.sleep(50)
        val tot = total.get.max(1)
        println(f"TAGDIFF cores=$cores n=$n sec=$sec%.1f busy_samples=$tot " +
          f"tagdiff_pct=${100.0 * inTagDiff.get / tot}%.2f " +
          f"any_udf_pct=${100.0 * inUdfAny.get / tot}%.2f match=$mr dev=$dr")
        s.stop()

      case "density" =>
        // THE LINEAR-IN-CORPUS OPERATING POINT (VERDICT r4 #1): one
        // pipeline run + one candidate count at CONSTANT site density
        // (bbox area grows with n; ref = the 2.5M bench point, where the
        // fixture is bit-identical to the default mode). Across a 10x n
        // range, rows/s should hold ~flat and candidates grow ~linearly —
        // the premise of the 100-TB claim, measured instead of argued.
        // Run detached, repeatedly, at 8 and 32 cores (min-of-1 rule).
        val ref = if (args.length > 3) args(3).toLong else 2500000L
        val s = session(cores, aqeOn = false)
        runOnce(s, 50000L, Some(ref)) // warm codegen/JIT
        System.gc()
        val gc0 = gcMillis()
        val (sec, mr, dr) = runOnce(s, n, Some(ref))
        val gcSec = (gcMillis() - gc0) / 1000.0
        val pages = graft.sources.Pages.synthesize(s, n, densityRefSites = Some(ref))
        val (osm, ups) = graft.engine.BenchPipeline.extract(pages)
        val spec0 = graft.engine.BenchPipeline.spec
        val t1 = System.nanoTime()
        val c = graft.operators.SpatialJoin.dwithinCandidates(
          build = osm, probe = ups, buildGeom = "geom", probeGeom = "geometry",
          spec = graft.operators.SpatialJoin.DWithinSpec(spec0.maxDistance, 1000.0)).count()
        println(f"DENSITY cores=$cores n=$n ref=$ref sec=$sec%.1f gc_sec=$gcSec%.1f " +
          f"match=$mr dev=$dr rows_per_sec=${(mr + dr) / sec}%.0f " +
          f"candidates=$c cand_sec=${(System.nanoTime() - t1) / 1e9}%.1f")
        s.stop()

      case "cands" =>
        // candidate-pair count of the pipeline's cell join — evidence for
        // the superlinear wall at fixed-bbox site scale-up: pairs within
        // the 250 m radius grow ~quadratically in density, so 4x sites at
        // the SAME Sweden bbox ≈ 16x candidates (a real corpus scale-up
        // grows area/corpus at ~constant density instead)
        val s = session(cores, aqeOn = false)
        val pages = graft.sources.Pages.synthesize(s, n)
        val (osm, ups) = graft.engine.BenchPipeline.extract(pages)
        val spec = graft.engine.BenchPipeline.spec
        val t0 = System.nanoTime()
        val c = graft.operators.SpatialJoin.dwithinCandidates(
          build = osm, probe = ups, buildGeom = "geom", probeGeom = "geometry",
          spec = graft.operators.SpatialJoin.DWithinSpec(spec.maxDistance, 1000.0)).count()
        println(f"CANDS cores=$cores n=$n candidates=$c sec=${(System.nanoTime() - t0) / 1e9}%.1f")
        s.stop()

      case other => sys.error(s"unknown mode: $other")
    }
  }
}
