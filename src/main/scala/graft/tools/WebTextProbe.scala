package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.WebText

/**
 * Throughput evidence for the web-text curation family at pipeline scale
 * (feeds BASELINE.md): deterministic synthetic corpus (docs of `WT_WORDS`
 * words over a 4k vocab, modular arithmetic — no RNG, no files), each
 * operator timed as min-of-2 after a warm-up pass.
 *
 * Envs: WT_DOCS (default 2,000,000), WT_WORDS (default 60), WT_CORES
 * (default 8).
 */
object WebTextProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("WT_DOCS", "2000000").toLong
    val nWords = sys.env.getOrElse("WT_WORDS", "60").toInt
    val cores = sys.env.getOrElse("WT_CORES", "8").toInt
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("webtext-probe")
      .config("spark.sql.shuffle.partitions", (cores * 4).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    // doc i = hash-mixed words over a 4k vocab: xxhash64(id, j) decorrelates
    // docs, so no two distinct docs share an 8-gram (a linear congruential
    // form here is periodic in id and silently made EVERY doc a copy of a
    // benchmark doc — the first probe run measured 100% contamination)
    val docs = s.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(nWords - 1)),
        j => concat(lit("w"), pmod(xxhash64(col("id"), j), lit(4096L))))).as("text"))
      .cache()
    docs.count()

    // benchmark set for decontamination: the corpus generator at 1/211
    // of the id space — those docs (and only those) are contaminated
    val bench = docs.filter(pmod(col("doc_id"), lit(211L)) === 0)

    def time(label: String)(body: => Long): Unit = {
      body // warm-up
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (sec, n) = runs.minBy(_._1)
      println(f"WTPROBE $label%-12s docs=$nDocs%d sec=$sec%.2f docs_per_s=${nDocs / sec}%.0f rows=$n%d")
    }

    time("repetition") {
      WebText.withRepetitionStats(docs, "doc_id", "text")
        .agg(sum("n_words"), sum("dup3_frac")).head(); nDocs
    }
    time("pii") {
      WebText.withPiiRedacted(docs, "text")
        .agg(sum("n_emails"), sum(length(col("redacted")))).head(); nDocs
    }
    time("tfidf") { WebText.tfidfTopTerms(docs, "doc_id", "text", k = 5).count() }
    time("contam") { WebText.contamination(docs, bench, "doc_id", "text", n = 8).count() }
    time("chunks") { WebText.chunkDocs(docs, "doc_id", "text", 20, 5).count() }
    time("quantiles") {
      WebText.valueQuantiles(
        docs.withColumn("lang", pmod(col("doc_id"), lit(5L)).cast("string"))
          .withColumn("len", length(col("text"))),
        "lang", "len", Seq(10, 50, 90)).count()
    }
    s.stop()
  }
}
