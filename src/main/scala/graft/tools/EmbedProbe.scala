package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N→4N scaling probe for the embedding-curation family (semDedup,
  * pqEncode, pqTopK, ivfPqTopK) — WebGraphProbe protocol: min-of-N trials,
  * hash-mixed synthesis, run at 2 and 8 cores on the SAME n, sequentially.
  *
  * Corpus: 16-dim integral vectors mixed from xxhash64(id) with a
  * controlled duplicate rate (~1 in 50 rows repeats a hot pattern) so
  * semDedup has real cliques without the fixed-mod periodicity that made
  * every doc a copy in early WebTextProbe runs.
  * Usage: runMain graft.tools.EmbedProbe <nVecs> <cores> [trials=2] [stages] */
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cores = args(1).toInt
    val trials = if (args.length > 2) args(2).toInt else 2
    val stageFilter = if (args.length > 3) args(3).split(",").toSet
      else Set.empty[String]
    def want(s: String): Boolean = stageFilter.isEmpty || stageFilter(s)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"embed-probe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ~1 in 50 ids collapses onto one of 1000 hot patterns; the rest are
    // unique-ish (2^20 patterns). Components stay SMALL (hot cliques of
    // ~n/50000) — the operator cost is cells + in-cell pairs, not CC depth.
    val pat = when(pmod(xxhash64(lit(1), col("id")), lit(50L)) === 0,
      pmod(xxhash64(lit(2), col("id")), lit(1000L)))
      .otherwise(pmod(xxhash64(lit(3), col("id")), lit(1048576L)))
    val corpus = spark.range(n).select(col("id").as("vid"),
        array((0 until 16).map(d =>
          (pmod(xxhash64(lit(10 + d), pat), lit(19L)) - 9L).cast("float")): _*)
          .as("emb"))
      .localCheckpoint() // probe the operators, not the generator

    // max(1, ...) guards n < 50 (r6, ADVICE r5): a zero modulus crashed
    // the probe instead of failing usefully; with 1 every row is a query,
    // which is the sane degenerate-probe behavior.
    val queries = corpus.filter(pmod(col("vid"), lit(math.max(1L, n / 50L))) === 0)

    def timeMin(name: String)(body: => Long): Unit = {
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime(); val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val best = secs.minBy(_._1)
      println(f"PROBE stage=$name cores=$cores n=$n sec=${best._1}%.2f " +
        f"rows=${best._2} vecs_per_sec=${n / best._1}%.0f")
    }

    // nlist ≈ √(n/2) balances the two cost terms: assignment is n·nlist·16
    // flops, the in-cell pair search is n²/nlist·8 — equal at nlist²≈n/2
    // (the same √N operating-point rule as ivfTopK's scaladoc)
    val nlist = math.max(8, math.sqrt(n / 2.0).toInt)
    import graft.operators.{Dedup, EmbedCurate, Similarity}
    if (want("semDedup")) timeMin("semDedup") {
      EmbedCurate.semDedup(corpus, "vid", "emb",
          nlist = nlist, threshold = 0.95, iters = 0)
        .filter(col("id") =!= col("canonical_id")).count()
    }
    // decomposition of the semDedup profile: the assignment UDF pass, the
    // in-cell pair search over a pre-materialized assignment, and the
    // connected-components rounds over pre-materialized edges — CC is
    // many SMALL jobs (per-round join + convergence count), i.e. mostly
    // fixed launch latency that no core count compresses
    lazy val centroids = Similarity.trainIvfCentroids(corpus, "vid", "emb", nlist, 0)
    lazy val assigned = EmbedCurate.assignCells(corpus, "vid", "emb", centroids)
      .localCheckpoint()
    if (want("sd_assign")) timeMin("sd_assign") {
      EmbedCurate.assignCells(corpus, "vid", "emb", centroids)
        .groupBy("cell").count().count()
    }
    if (want("sd_edges")) timeMin("sd_edges") {
      EmbedCurate.cellEdges(assigned, 0.95).count()
    }
    lazy val edges = EmbedCurate.cellEdges(assigned, 0.95).localCheckpoint()
    if (want("sd_cc")) timeMin("sd_cc") {
      Dedup.connectedComponents(edges).count()
    }
    if (want("pqEncode")) timeMin("pqEncode") {
      EmbedCurate.pqEncode(corpus, "vid", "emb", m = 4, ksub = 16)
        .agg(sum(col("recon2"))).collect()(0).getLong(0)
    }
    if (want("pqTopK")) timeMin("pqTopK") {
      EmbedCurate.pqTopK(corpus, queries, "vid", "emb",
        k = 5, m = 4, ksub = 16).count()
    }
    if (want("ivfPqTopK")) timeMin("ivfPqTopK") {
      EmbedCurate.ivfPqTopK(corpus, queries, "vid", "emb",
        k = 5, nlist = nlist, nprobe = 4, m = 4, ksub = 16).count()
    }
    spark.stop()
  }
}
