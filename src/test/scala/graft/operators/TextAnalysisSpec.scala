package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SparkTestBase

/** Portable (mod-p, column-expression) winnowing fingerprint vs a direct
  * Scala recompute of the same recurrence — the variant behind the
  * q_txt_fingerprint_oracle DuckDB gate entry. */
class TextAnalysisSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private val k = 8
  private val win = 16
  private val p = 2147483647L

  /** reference implementation: k-char poly hashes mod p, min of each
    * non-overlapping win-window, distinct. */
  private def reference(text: String): Set[Long] = {
    val n = text.length - k + 1
    if (text.length < k + win - 1) Set.empty
    else {
      val hs = (0 until n).map { i =>
        text.substring(i, i + k).foldLeft(0L)((acc, c) => (acc * 31 + c) % p)
      }
      (0 to (n - win) / win).map(s => hs.slice(s * win, s * win + win).min).toSet
    }
  }

  test("portableFingerprints == reference recompute on varied texts") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "a" * 40),                        // constant text -> single fp value
      (3L, "short"),                         // < k chars -> no fingerprints
      (4L, "exactly twenty-three c"),        // 22 chars -> below k+win-1 -> none
      (5L, (0 until 50).map(i => s"tok$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.portableFingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val texts = Map(
      1L -> "the quick brown fox jumps over the lazy dog again and again and again",
      2L -> "a" * 40,
      3L -> "short",
      4L -> "exactly twenty-three c",
      5L -> (0 until 50).map(i => s"tok$i").mkString(" "))
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == reference(t), s"doc $id")
    }
    assert(reference(texts(1L)).nonEmpty && reference(texts(3L)).isEmpty)
  }

  test("BPE-ish token stats: hand-computed counts, whitespace runs excluded") {
    // "it's 2 cats!" -> it | 's | ' 2' | ' cats' | '!'         = 5 tokens
    // "don't stop"   -> don | 't | ' stop'                     = 3 tokens
    // "a  b\nc"      -> a | ws-run ' ' | ' b' | ws-run '\n' | c:
    //   after 'a', ' ?\p{L}+' cannot start at the first of two spaces (the
    //   optional space would need a letter right after), so the whitespace
    //   alternative eats it, then ' b' matches; '\n' is not eaten by ' ?'
    //   -> kept tokens a, ' b', c                               = 3 tokens
    // "aa aa"        -> aa | ' aa' -> 2 tokens, 2 DISTINCT (prefix differs)
    val docs = Seq(
      (1L, "it's 2 cats!"), (2L, "don't stop"), (3L, "a  b\nc"), (4L, "aa aa"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.withBpeTokenStats(docs, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (5L, 5L))
    assert(got(2L) == (3L, 3L))
    assert(got(3L) == (3L, 3L))
    assert(got(4L) == (2L, 2L))
  }

  test("portable fingerprint values stay in [0, 2^31)") {
    val docs = Seq((1L, ('a' to 'z').mkString(" "))).toDF("doc_id", "text")
    val vals = TextAnalysis.portableFingerprints(docs, "doc_id", "text")
      .collect().map(_.getLong(1))
    assert(vals.nonEmpty && vals.forall(v => v >= 0 && v < p))
  }

  test("invertedIndex: df/tf totals, top-k postings by (tf DESC, doc ASC), df cap NULLs postings") {
    val docs = Seq(
      (1L, "cat cat cat dog"),
      (2L, "cat  dog dog"),   // double space -> empty token filtered
      (3L, "cat dog"),
      (4L, "cat bird"),
      (5L, "cat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text", k = 3, dfCap = 4L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
    // cat: df 5 > cap -> postings NULL, stats still reported
    assert(got("cat") == ((5L, 7L, None)))
    // dog: df 3; tf 2 in doc2, 1 in docs 1,3 -> postings "2,1,3"
    assert(got("dog") == ((3L, 4L, Some("2,1,3"))))
    assert(got("bird") == ((1L, 1L, Some("4"))))
  }

  test("invertedIndex: k caps postings length; ties broken by doc_id ASC") {
    val docs = Seq((1L, "w"), (2L, "w"), (3L, "w"), (4L, "w")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text", k = 2, dfCap = 10L)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(got == Map("w" -> "1,2"))
  }

  test("packSequences == driver brute force; bucketSize-invariant; zero-token doc") {
    // non-contiguous ids (gaps must not matter), double space (no empty-token
    // words), a zero-token doc, counts straddling sequence boundaries
    val docs = Seq(
      (2L, "a b c"),            // toks 3: start 0, seqs 0..0
      (5L, "d  e f g"),         // toks 4: start 3, 3..6 -> seqs 0..1 (seqLen 5)
      (7L, ""),                 // toks 0: start 7, no sequence
      (11L, "h i j k l m n o"), // toks 8: start 7, 7..14 -> seqs 1..2
      (12L, "p"))               // toks 1: start 15 -> seq 3
      .toDF("doc_id", "text")
    def run(b: Long) = TextAnalysis.packSequences(docs, "doc_id", "text",
      seqLen = 5, bucketSize = b)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val got = run(3L) // ids straddle buckets {0,1}, {1}, {2}, {3}, {4}
    assert(got == run(1000L)) // one bucket: degenerate single-window form
    assert(got(2L) == ((3L, 0L, 0L, 0L, 1L)))
    assert(got(5L) == ((4L, 3L, 0L, 1L, 2L)))
    assert(got(7L) == ((0L, 7L, 1L, 1L, 0L)))
    assert(got(11L) == ((8L, 7L, 1L, 2L, 2L)))
    assert(got(12L) == ((1L, 15L, 3L, 3L, 1L)))
  }

  private def bruteSurprisal(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    def words(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    def bitlen(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val perDoc = docs.map { case (id, t) =>
      id -> words(t).sliding(2).filter(_.size == 2).map(p => (p(0), p(1))).toSeq
    }
    val all = perDoc.flatMap(_._2)
    val cPair = all.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val cLeft = all.groupBy(_._1).map { case (k2, v) => k2 -> v.size.toLong }
    perDoc.map { case (id, bs) =>
      val ss = bs.map(p => bitlen(cLeft(p._1)) - bitlen(cPair(p))).map(_.toLong).sum
      val nb = bs.size.toLong
      id -> ((nb, ss, if (nb > 0) 100L * ss / nb else 0L))
    }.toMap
  }

  test("bigramSurprisal: brute-force differential; rare-continuation docs score higher") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "The cat sat, the cat sat."),
      (3L, "Zq!"),                        // 1 word -> no bigrams
      (4L, ""),                           // empty
      (5L, "the cat the cat the dog"),
      (6L, "purple cat quantum mat"))     // rare continuations
    val got = TextAnalysis.bigramSurprisal(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == bruteSurprisal(docs))
    assert(got(3L) == ((0L, 0L, 0L)) && got(4L) == ((0L, 0L, 0L)))
    // the gibberish doc's mean surprisal strictly exceeds the common-prose doc's
    assert(got(6L)._3 > got(2L)._3)
  }
}
