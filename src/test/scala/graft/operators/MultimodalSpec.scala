package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** The stubbed per-partition media decode: header parse, byte features, and
  * the exact truncated mean that makes the features DuckDB-oracleable. */
class MultimodalSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  test("decodeStub: hand-computed features for a known payload") {
    // "IMG|1|1|A" = bytes [73,77,71,124,49,124,49,124,65]: n=9, sum=756,
    // mean = trunc(756*10000/9)/10000 = 84.0, 6 distinct byte values
    val media = Seq((1L, "IMG|1|1|A".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val f = Multimodal.decodeStub(media).collect()(0)
    assert(f.kind == "IMG" && f.width == 1 && f.height == 1)
    assert(f.n_bytes == 9L && f.mean_byte == 84.0 && f.distinct_bytes == 6)
  }

  test("decodeStub: non-header payload falls back to RAW with zero dims") {
    val media = Seq((2L, Array[Byte](1, 2, 2, 3))).toDF("doc_id", "payload")
    val f = Multimodal.decodeStub(media).collect()(0)
    assert(f.kind == "RAW" && f.width == 0 && f.height == 0)
    assert(f.n_bytes == 4L && f.distinct_bytes == 3)
    // sum=8, trunc(8*10000/4)/10000 = 2.0
    assert(f.mean_byte == 2.0)
  }

  test("decodeStub: malformed pipe payloads and null payloads fall back to RAW, no crash") {
    // 4 '|'-separated parts but wrong magic / non-numeric dims: a real codec
    // rejects such input gracefully; the stub previously threw
    // NumberFormatException and killed the task
    val media = Seq(
      (3L, "a|b|c|d".getBytes("UTF-8")),
      (4L, "IMG|x|2|body".getBytes("UTF-8")),
      (5L, "IMG|999999999999|2|body".getBytes("UTF-8")), // digits but > Int
      (6L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeStub(media).collect().map(f => f.doc_id -> f).toMap
    assert(out.values.forall(f => f.kind == "RAW" && f.width == 0 && f.height == 0))
    assert(out(6L).n_bytes == 0L && out(6L).mean_byte == 0.0)
  }

  test("decodeStub: header decision is contained in the first 24 bytes") {
    // the longest valid header is exactly 24 bytes ("IMG|" + 9 digits + "|"
    // + 9 digits + "|"); anything needing bytes past that is invalid anyway,
    // so the parser may (and does) decode only a 24-byte prefix per row
    val media = Seq(
      (7L, ("IMG|123456789|123456789|" + "body").getBytes("UTF-8")),
      (8L, "IMG|1234567890123|2|body".getBytes("UTF-8")), // >9-digit width
      (9L, ("IMGX" + "z" * 30 + "|1|2|b").getBytes("UTF-8"))) // pipes past 24
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeStub(media).collect().map(f => f.doc_id -> f).toMap
    assert(out(7L).kind == "IMG" && out(7L).width == 123456789 &&
      out(7L).height == 123456789)
    assert(out(8L).kind == "RAW" && out(9L).kind == "RAW")
  }

  test("asFakeMedia -> decodeStub round trip: header fields match doc_id arithmetic") {
    val docs = Seq((0L, "alpha"), (62L, "beta"), (63L, "gamma")).toDF("doc_id", "text")
    val out = Multimodal.decodeStub(Multimodal.asFakeMedia(docs, "doc_id", "text"))
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(0L).width == 1 && out(0L).height == 1)
    assert(out(62L).width == 63 && out(62L).height == 16)
    assert(out(63L).width == 1 && out(63L).height == 17)
    assert(out.values.forall(_.kind == "IMG"))
    // mean is the exact truncated rational of the raw byte sum
    val p = "IMG|1|1|alpha".getBytes("UTF-8")
    val sum = p.map(_ & 0xFF).map(_.toLong).sum
    assert(out(0L).mean_byte == (sum * 10000L / p.length).toDouble / 10000)
  }

  test("resize: nearest-neighbor mapping, zero-fill past short bodies, RAW fallback") {
    // body "WXYZ" = row-major 2x2 pixels [87,88 / 89,90]
    val media = Seq(
      (1L, "IMG|2|2|WXYZ".getBytes("UTF-8")),
      (2L, "IMG|2|2|WX".getBytes("UTF-8")), // short body: bottom row reads 0
      (3L, Array[Byte](1, 2, 3))) // no header
      .toDF("doc_id", "payload")
    val one = Multimodal.resize(media, 1, 1).collect().map(r => r.doc_id -> r).toMap
    assert(one(1L).payload.toSeq == Seq(87.toByte) && one(1L).checksum == 87L)
    val same = Multimodal.resize(media, 2, 2).collect().map(r => r.doc_id -> r).toMap
    assert(same(1L).payload.toSeq == "WXYZ".getBytes("UTF-8").toSeq)
    assert(same(1L).checksum == 87L + 88 + 89 + 90)
    assert(same(2L).payload.toSeq == Seq[Byte](87, 88, 0, 0) && same(2L).checksum == 175L)
    assert(same(3L).kind == "RAW" && same(3L).payload.isEmpty && same(3L).checksum == 0L)
    // upscale 4x4 replicates each source pixel 2x2 (floor mapping)
    val up = Multimodal.resize(media, 4, 4).collect().map(r => r.doc_id -> r).toMap
    assert(up(1L).checksum == (87L + 88 + 89 + 90) * 4)
    assert(up(1L).payload.toSeq == Seq[Byte](87, 87, 88, 88, 87, 87, 88, 88,
      89, 89, 90, 90, 89, 89, 90, 90))
  }

  test("frameSample: complete frames only, stride sampling, headerless = raw stream") {
    val body = "A" * 16 + "B" * 16 + "CCC" // 35 body bytes -> 2 complete frames
    val media = Seq((1L, ("IMG|1|1|" + body).getBytes("UTF-8"))).toDF("doc_id", "payload")
    val all = Multimodal.frameSample(media, frameBytes = 16, every = 1)
      .collect().sortBy(_.frame_idx)
    assert(all.map(f => (f.frame_idx, f.n_frames, f.checksum)).toSeq ==
      Seq((0, 2, 65L * 16), (1, 2, 66L * 16)))
    val strided = Multimodal.frameSample(media, frameBytes = 16, every = 2).collect()
    assert(strided.map(f => (f.frame_idx, f.checksum)).toSeq == Seq((0, 65L * 16)))
    // headerless payload: the whole stream is the body (offset 0)
    val raw = Seq((2L, Array.fill[Byte](16)(7))).toDF("doc_id", "payload")
    val rf = Multimodal.frameSample(raw, 16, 1).collect()
    assert(rf.map(f => (f.frame_idx, f.n_frames, f.checksum)).toSeq == Seq((0, 1, 112L)))
  }

  test("featureExtract: folded byte histogram over the body, null-safe") {
    val media = Seq(
      (1L, "IMG|1|1|AB".getBytes("UTF-8")), // body bytes 65,66 -> buckets 1,2
      (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "payload")
    val out = Multimodal.featureExtract(media, 8).collect().map(r => r.doc_id -> r).toMap
    assert(out(1L).embedding.toSeq == Seq(0.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0))
    assert(out(2L).embedding.toSeq == Seq.fill(8)(0.0))
    // counts integrate with the Similarity cosine path: all-integer doubles
    assert(out(1L).embedding.forall(v => v == Math.rint(v)))
  }
}
