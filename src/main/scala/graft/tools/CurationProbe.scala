package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N→4N scaling probe for the round-5 curation operators (bannedWords,
  * mixtureAllocate) — the WebGraphProbe protocol: min-of-N trials per
  * stage, hash-mixed synthesis (a linear form in id is periodic), run at
  * 2 and 8 cores on the SAME n, never two Spark procs concurrently.
  * Usage: runMain graft.tools.CurationProbe <nDocs> <cores> [trials=2] */
object CurationProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cores = args(1).toInt
    val trials = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master(s"local[$cores]")
      .appName(s"curation-probe-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ~12 words/doc, hash-mixed vocab of 50k — LETTER-ONLY words (the
    // operator's [a-z]+ word domain would strip digits and collapse a
    // "w123"-style vocab to one token — the probe's first run measured
    // exactly that mistake); ~1 in 25 words is a banned hit
    def h(tag: Int) = pmod(xxhash64(lit(tag), col("id")), lit(50000L))
    def word(tag: Int) = concat(lit("w"),
      translate(h(tag).cast("string"), "0123456789", "abcdefghij"))
    def wordStr(i: Long): String =
      "w" + i.toString.map(c => ('a' + (c - '0')).toChar)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ", (1 to 12).map(word): _*).as("text"),
      concat(lit("d"), pmod(xxhash64(lit(99), col("id")), lit(40L))).as("dom"))
      .localCheckpoint() // probe the OPERATORS, not the generator

    val banned = (0L until 2000L).map(wordStr).toDF("w")
    val weights = (0 until 20).map(i => s"d$i" -> 50000L)

    def timeMin(name: String)(body: => Long): Unit = {
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime(); val r = body
        ((System.nanoTime() - t0) / 1e9, r)
      }
      val best = secs.minBy(_._1)
      println(f"PROBE stage=$name cores=$cores n=$n sec=${best._1}%.2f " +
        f"rows=${best._2} docs_per_sec=${n / best._1}%.0f")
    }

    timeMin("bannedWords") {
      graft.operators.WebText.bannedWords(docs, "doc_id", "text", banned, "w",
        maxHits = 1L).filter(!col("kept")).count()
    }
    // decomposition stages (diagnosis of the scaling profile): the word
    // explode + broadcast probe alone, then + the hit aggregation — the
    // difference to the full op is the doc-spine join-back
    timeMin("bw_explode_join") {
      docs.select(col("doc_id"),
          explode(filter(split(lower(col("text")), "[^a-z]+"),
            w => length(w) > 0)).as("word"))
        .join(broadcast(banned.select(lower(col("w")).as("word")).distinct()),
          Seq("word"))
        .count()
    }
    timeMin("bw_hits_agg") {
      docs.select(col("doc_id"),
          explode(filter(split(lower(col("text")), "[^a-z]+"),
            w => length(w) > 0)).as("word"))
        .join(broadcast(banned.select(lower(col("w")).as("word")).distinct()),
          Seq("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), countDistinct(col("word")).as("nd"),
          min(col("word")).as("fb"))
        .count()
    }
    timeMin("mixtureAllocate") {
      // sum REAL output columns: a bare count() lets Catalyst prune the
      // token sums (and with them the text scan) out of the aggregates
      graft.operators.Sampling.mixtureAllocate(docs, "doc_id", "dom", "text",
          weights, budgetTokens = n, salt = 7L)
        .agg(sum(col("tokens") + col("kept_tokens") + col("n_kept")))
        .collect()(0).getLong(0)
    }
    spark.stop()
  }
}
