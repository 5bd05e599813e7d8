package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/**
 * Gate entries for BPE vocabulary induction ([[TextAnalysis.bpeTrain]]):
 * the learned merge table and the final segmented vocabulary, both behind a
 * DuckDB oracle that unrolls the merge loop as CTE chains (the pagerank3
 * pattern — one `p{i}/b{i}/v{i}` triple per merge, argmax + two-pass
 * space-bounded replace re-derived in SQL step for step).
 */
object QueriesBpe {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  val NumMerges = 6

  /** morphology-rich corpus: the base word-salad text plus a verb class
    * (doc_id%3) crossed with a suffix class (%4: bare/ing/ed/er), an
    * adjective-gradation class (%5: low/lower/lowest/slow/slowly), an
    * uppercase word on %7 (exercises lower()) and a non-[a-z] token on %11
    * (exercised the word-domain filter). Reproduced VERBATIM in the oracle's
    * `corpus` CTE. */
  private def bpeCorpus(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), concat(
      col("text"), lit(" "),
      when(pmod(col("doc_id"), lit(3L)) === 0, "walk")
        .when(pmod(col("doc_id"), lit(3L)) === 1, "talk").otherwise("hunt"),
      when(pmod(col("doc_id"), lit(4L)) === 0, "")
        .when(pmod(col("doc_id"), lit(4L)) === 1, "ing")
        .when(pmod(col("doc_id"), lit(4L)) === 2, "ed").otherwise("er"),
      lit(" "),
      when(pmod(col("doc_id"), lit(5L)) === 0, "low")
        .when(pmod(col("doc_id"), lit(5L)) === 1, "lower")
        .when(pmod(col("doc_id"), lit(5L)) === 2, "lowest")
        .when(pmod(col("doc_id"), lit(5L)) === 3, "slow").otherwise("slowly"),
      when(pmod(col("doc_id"), lit(7L)) === 0, " Mixed").otherwise(""),
      when(pmod(col("doc_id"), lit(11L)) === 0, " x9y").otherwise("")).as("text"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_txt_bpemerges" -> ((s, dir) =>
      TextAnalysis.bpeTrain(bpeCorpus(s, dir), "text", NumMerges)._1),
    "q_txt_bpevocab" -> ((s, dir) =>
      TextAnalysis.bpeTrain(bpeCorpus(s, dir), "text", NumMerges)._2),

    // train then ENCODE the same corpus; the corpus-wide token histogram
    // weighs every merge application by word multiplicity
    "q_txt_bpeencode" -> ((s, dir) => {
      val corpus = bpeCorpus(s, dir)
      val merges = TextAnalysis.bpeTrain(corpus, "text", NumMerges)._1
      TextAnalysis.bpeEncode(corpus, "doc_id", "text", merges)
        .select(explode(col("toks")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
    }))

  /** corpus + v0 CTEs — regex/replace constants are the Scala ones VERBATIM
    * (plain string: `\s+` / `\1` must stay literal backslashes). */
  private val oraclePre: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |    text || ' '
      |      || (CASE doc_id % 3 WHEN 0 THEN 'walk' WHEN 1 THEN 'talk' ELSE 'hunt' END)
      |      || (CASE doc_id % 4 WHEN 0 THEN '' WHEN 1 THEN 'ing' WHEN 2 THEN 'ed' ELSE 'er' END)
      |      || ' '
      |      || (CASE doc_id % 5 WHEN 0 THEN 'low' WHEN 1 THEN 'lower' WHEN 2 THEN 'lowest'
      |              WHEN 3 THEN 'slow' ELSE 'slowly' END)
      |      || (CASE WHEN doc_id % 7 = 0 THEN ' Mixed' ELSE '' END)
      |      || (CASE WHEN doc_id % 11 = 0 THEN ' x9y' ELSE '' END) AS text2
      |  FROM documents),
      |w AS (
      |  SELECT w AS word FROM (SELECT unnest(regexp_split_to_array(lower(text2), '\s+')) AS w FROM corpus)
      |  WHERE regexp_matches(w, '^[a-z]+$')),
      |v0 AS (
      |  SELECT word, COUNT(*) AS cnt,
      |    regexp_replace(word, '(.)', '\1 ', 'g') || '</w>' AS sym
      |  FROM w GROUP BY word)""".stripMargin

  /** one merge round: adjacent-pair counts via zipped slice unnests, argmax
    * with the (c DESC, l, r) total order, two-pass padded replace — the
    * engine's merge semantics verbatim. */
  private def oracleIter(i: Int): String =
    s""",
       |p$i AS (
       |  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS c FROM (
       |    SELECT cnt, unnest(a[1:len(a) - 1]) AS l, unnest(a[2:len(a)]) AS r
       |    FROM (SELECT cnt, string_split(sym, ' ') AS a FROM v${i - 1}) t
       |    WHERE len(a) >= 2)
       |  GROUP BY 1, 2),
       |b$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
       |v$i AS (
       |  SELECT word, cnt,
       |    trim(replace(replace(' ' || sym || ' ',
       |      ' ' || l || ' ' || r || ' ', ' ' || l || r || ' '),
       |      ' ' || l || ' ' || r || ' ', ' ' || l || r || ' ')) AS sym
       |  FROM v${i - 1}, b$i)""".stripMargin

  private val oracleChain: String =
    oraclePre + (1 to NumMerges).map(oracleIter).mkString

  val oracle: Map[String, String] = Map(
    "q_txt_bpemerges" -> (oracleChain + "\n" +
      (1 to NumMerges).map(i =>
        s"SELECT $i AS merge_rank, l AS pair_left, r AS pair_right, " +
          s"l || r AS merged, c AS pair_count FROM b$i")
        .mkString("\nUNION ALL ")),
    "q_txt_bpevocab" -> (oracleChain + s"\nSELECT word, cnt, sym FROM v$NumMerges"),
    // encoding the training corpus == the trained segmentation, so the
    // token histogram is v6's syms weighted by word count
    "q_txt_bpeencode" -> (oracleChain +
      s"""
         |SELECT t AS token, CAST(SUM(cnt) AS BIGINT) AS n
         |FROM (SELECT cnt, UNNEST(STRING_SPLIT(sym, ' ')) AS t FROM v$NumMerges)
         |GROUP BY t""".stripMargin))
}
