package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SparkTestBase

/** BPE vocabulary induction vs an independent list-based greedy reference:
  * merge choices, counts, and final segmentations on the classic Sennrich
  * corpus; word-domain filtering; the no-remaining-pair invariant of the
  * two-pass replace merge step. */
class BpeSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  /** independent reference: word-frequency BPE with list-based greedy-left
    * merges (Sennrich et al. 2016 fig. 1 semantics). */
  private def refBpe(words: Seq[String], k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, (Long, List[String])]) = {
    def mergeList(sym: List[String], l: String, r: String): List[String] = sym match {
      case a :: b :: rest if a == l && b == r => (a + b) :: mergeList(rest, l, r)
      case a :: rest => a :: mergeList(rest, l, r)
      case Nil => Nil
    }
    var vocab: Map[String, (Long, List[String])] = words.groupBy(identity).map {
      case (w, ws) => w -> ((ws.size.toLong, w.split("").toList :+ "</w>"))
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (cnt, sym) =>
        sym.zip(sym.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + cnt)
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        vocab = vocab.map { case (w, (cnt, sym)) => w -> ((cnt, mergeList(sym, l, r))) }
        merges += ((rank, l, r, c))
      }
    }
    (merges.toSeq, vocab)
  }

  private val sennrich: Seq[String] =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("merges and final vocab match the greedy reference on the Sennrich corpus") {
    val docs = Seq((1L, sennrich.mkString(" "))).toDF("doc_id", "text")
    val (mergesDf, vocabDf) = TextAnalysis.bpeTrain(docs, "text", numMerges = 8)
    val got = mergesDf.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
      .sortBy(_._1)
    val (want, wantVocab) = refBpe(sennrich, 8)
    assert(got === want)
    val gotVocab = vocabDf.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(gotVocab === wantVocab.map { case (w, (c, s)) => w -> ((c, s.mkString(" "))) })
    // the classic first merges: (e,s) then (es,t) then (est,</w>)
    assert(got.take(3).map(m => (m._2, m._3)) ===
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
  }

  test("word domain: lowercased, [a-z]+ only, whitespace-split") {
    val docs = Seq((1L, "Aa aa  B2b\tcc\ncc "), (2L, "x9 AA !")).toDF("doc_id", "text")
    val (_, vocabDf) = TextAnalysis.bpeTrain(docs, "text", numMerges = 0)
    val vocab = vocabDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("aa" -> 3L, "cc" -> 2L))
  }

  test("minCount prunes the tail before the merge loop") {
    val docs = Seq((1L, "dog dog dog cat")).toDF("doc_id", "text")
    val (mergesDf, vocabDf) = TextAnalysis.bpeTrain(docs, "text", 1, minCount = 2L)
    assert(vocabDf.select("word").as[String].collect().toSeq === Seq("dog"))
    val m = mergesDf.collect().head
    assert((m.getString(1), m.getString(2), m.getLong(4)) === (("d", "o", 3L)))
  }

  test("two-pass replace reaches a pair-free state on random corpora incl. repeat runs") {
    val r = new scala.util.Random(7)
    val letters = "abcde"
    val words = (0 until 120).map { _ =>
      (0 until (1 + r.nextInt(7))).map(_ => letters(r.nextInt(letters.size))).mkString
    } :+ "aaaaaa" :+ "ababab" :+ "aaaa"
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val (mergesDf, vocabDf) = TextAnalysis.bpeTrain(docs, "text", numMerges = 10)
    val merges = mergesDf.collect().map(r => (r.getString(1), r.getString(2)))
    val syms = vocabDf.collect().map(_.getString(2).split(" ").toList)
    // no learned pair survives adjacent in the final segmentation
    for (sym <- syms; (l, r) <- merges)
      assert(!sym.zip(sym.tail).contains((l, r)),
        s"pair ($l,$r) still adjacent in ${sym.mkString(" ")}")
    // segment mass is conserved: stripping spaces and </w> recovers the word
    vocabDf.collect().foreach { row =>
      assert(row.getString(2).replace(" ", "").stripSuffix("</w>") === row.getString(0))
    }
  }

  test("self-adjacent pair runs: the documented two-pass deviation is pinned") {
    val aa = Seq(("a", "a"))
    // run 4: two passes DO reach the canonical greedy result
    assert(TextAnalysis.applyBpeMerges("aaaa", aa) === Seq("aa", "aa", "</w>"))
    // run 5: same merge COUNT as canonical, leftover single sits mid-run
    assert(TextAnalysis.applyBpeMerges("aaaaa", aa) === Seq("aa", "a", "aa", "</w>"))
    // run 6: the known deviation — 2 merges where canonical greedy does 3;
    // pinned so any kernel change that silently alters segmentation fails
    // here first (train/encode/oracle all share this kernel's semantics)
    assert(TextAnalysis.applyBpeMerges("aaaaaa", aa) ===
      Seq("aa", "a", "aa", "a", "</w>"))
    // non-self-adjacent pairs always match canonical greedy
    assert(TextAnalysis.applyBpeMerges("ababab", Seq(("a", "b"))) ===
      Seq("ab", "ab", "ab", "</w>"))
  }

  test("bpeEncode reproduces the trained segmentation and encodes unseen words") {
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest newest newest newest newest"),
      (3L, "widest widest widest new Mixed x9"))
      .toDF("doc_id", "text")
    val (merges, vocab) = TextAnalysis.bpeTrain(docs, "text", 6)
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
    // every encoded word's toks == the trained vocabulary's segmentation
    val trained = vocab.collect()
      .map(r => r.getString(0) -> r.getString(2).split(" ").toSeq).toMap
    enc.select("word", "toks").distinct().collect().foreach { r =>
      assert(r.getSeq[String](1) == trained(r.getString(0)), r.getString(0))
    }
    // token positions/multiplicity survive: doc 1 has 5 occurrences of 'low'
    assert(enc.filter(org.apache.spark.sql.functions.col("doc_id") === 1L).count() == 5)
    // out-of-domain tokens (Mixed is lowercased to 'mixed'; x9 dropped) —
    // 'mixed' is in-domain after lower(), x9 fails ^[a-z]+$
    val d3 = enc.filter(org.apache.spark.sql.functions.col("doc_id") === 3L)
      .select("word").collect().map(_.getString(0)).toSet
    assert(d3 == Set("widest", "new", "mixed"))
    // an UNSEEN word encodes with the learned merges: driver-side kernel
    // equals a manual application of the merge list
    val ms = merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val unseen = TextAnalysis.applyBpeMerges("lowest", ms)
    assert(unseen.mkString("").stripSuffix("</w>") == "lowest")
  }
}
