package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media as opaque BINARY columns with typed
 * metadata, batch-decoded per partition.
 *
 * The decode itself is STUBBED (no image/audio libs ship in this container):
 * `decodeStub` parses a deterministic fake header and computes byte-level
 * features. Everything around it is the real scale design:
 *  - payloads stay binary end to end (no string round-trips);
 *  - decoding runs per PARTITION via typed Dataset.mapPartitions — the Scala
 *    analog of mapInPandas batches: amortized setup (a real codec would be
 *    initialized once per partition, not per row), pipelined with the scan;
 *  - output is a fixed-schema feature struct, so downstream stays columnar.
 */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, kind: String, width: Int, height: Int,
      n_bytes: Long, mean_byte: Double, distinct_bytes: Int)
  final case class ResizedMedia(
      doc_id: Long, kind: String, out_w: Int, out_h: Int,
      payload: Array[Byte], checksum: Long)
  final case class FrameRow(
      doc_id: Long, frame_idx: Int, n_frames: Int, checksum: Long)
  final case class MediaEmbedding(doc_id: Long, embedding: Array[Double])

  /** header parse shared by the decode family: Some((w, h, bodyOffset)) for a
    * valid "IMG|w|h|" header, None for anything malformed (RAW fallback).
    * The header is pure ASCII, so its char length IS its byte length — and a
    * valid one fits in the first 24 bytes ("IMG|" + 9 digits + "|" + 9 digits
    * + "|"), so only those bytes are decoded: a real media row carries a
    * megabytes-long binary body, and decoding all of it to a String per row
    * just to read the header would be the dominant cost of the whole stage. */
  private val MaxHeaderBytes = 24
  private def parseHeader(payload: Array[Byte]): Option[(Int, Int, Int)] = {
    val n = math.min(payload.length, MaxHeaderBytes)
    val s = new String(payload, 0, n, java.nio.charset.StandardCharsets.UTF_8)
    // limit -1 so a trailing empty part survives ("IMG|5|3|" -> 4 parts);
    // any header this truncation could cut short is invalid either way
    // (third pipe past byte 24 implies a >9-digit dimension).
    val parts = s.split("\\|", -1)
    if (parts.length >= 4 && parts(0) == "IMG" &&
        parts(1).nonEmpty && parts(1).length <= 9 && parts(1).forall(_.isDigit) &&
        parts(2).nonEmpty && parts(2).length <= 9 && parts(2).forall(_.isDigit))
      Some((parts(1).toInt, parts(2).toInt,
        4 + parts(1).length + 1 + parts(2).length + 1))
    else None
  }

  /** wrap text rows as fake media payloads: "IMG|<w>|<h>|" + body bytes. */
  def asFakeMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      encode(concat(
        lit("IMG|"), (pmod(col(idCol), lit(63L)) + 1).cast("string"),
        lit("|"), (pmod(col(idCol), lit(47L)) + 1).cast("string"),
        lit("|"), col(textCol)), "UTF-8").as("payload"))

  /** the stubbed per-partition decoder (real codec would replace the body). */
  def decodeStub(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init happens HERE (codec/session/model handle)
      it.map { r =>
        val payload = if (r.payload == null) Array.empty[Byte] else r.payload
        // a malformed payload (wrong magic / non-numeric dims) must fall
        // back to RAW like any other undecodable input, not kill the task
        // with a NumberFormatException — a real codec would do the same
        val (kind, w, h) = parseHeader(payload) match {
          case Some((pw, ph, _)) => ("IMG", pw, ph)
          case None              => ("RAW", 0, 0)
        }
        var sum = 0L
        val seen = new java.util.BitSet(256)
        var i = 0
        while (i < payload.length) {
          val b = payload(i) & 0xFF
          sum += b; seen.set(b); i += 1
        }
        // mean truncated to 4 decimals via INTEGER arithmetic (sum*10000/len)
        // — exact, so the value is engine-independent (DuckDB-oracleable);
        // a float mean would differ at ULP level between summation orders
        MediaFeatures(r.doc_id, kind, w, h, payload.length,
          if (payload.length == 0) 0.0
          else (sum * 10000L / payload.length).toDouble / 10000,
          seen.cardinality())
      }
    }
  }

  /**
   * Nearest-neighbor resize of the (stubbed) image body to outW × outH.
   *
   * The body bytes are the row-major w×h "pixel" stream after the header;
   * source pixel for target (ty, tx) is (ty*h/outH, tx*w/outW) — pure integer
   * arithmetic, so the checksum is engine-independent (DuckDB-oracleable).
   * Bytes past the end of a short body read as 0, matching a real decoder's
   * zero-padded scanline policy. Malformed headers fall back to an empty RAW
   * result instead of killing the task. Runs per PARTITION (codec init
   * amortized), output stays BINARY — the real 100-TB plumbing around a
   * stubbed kernel.
   */
  def resize(media: DataFrame, outW: Int, outH: Int): Dataset[ResizedMedia] = {
    require(outW > 0 && outH > 0, s"resize dims must be positive: $outW x $outH")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val payload = if (r.payload == null) Array.empty[Byte] else r.payload
        parseHeader(payload) match {
          case Some((w, h, off)) =>
            val out = new Array[Byte](outW * outH)
            var sum = 0L
            var ty = 0
            while (ty < outH) {
              val sy = ty.toLong * h / outH
              var tx = 0
              while (tx < outW) {
                val sx = tx.toLong * w / outW
                val idx = off + (sy * w + sx)
                val b: Byte =
                  if (idx < payload.length) payload(idx.toInt) else 0
                out(ty * outW + tx) = b
                sum += (b & 0xFF)
                tx += 1
              }
              ty += 1
            }
            ResizedMedia(r.doc_id, "IMG", outW, outH, out, sum)
          case None =>
            ResizedMedia(r.doc_id, "RAW", 0, 0, Array.empty[Byte], 0L)
        }
      }
    }
  }

  /**
   * Sample every `every`-th fixed-size frame from the media body (the
   * frame-sample step of a video pipeline, over the stubbed container).
   *
   * The body is cut into consecutive `frameBytes`-byte frames (trailing
   * partial frame dropped, as a codec drops a truncated last frame); frames
   * with index % every == 0 are emitted with their byte-sum checksum.
   * A payload without a container header is treated as a raw stream from
   * byte 0. One input row fans out to n_frames/every rows — flatMap inside
   * mapPartitions keeps it pipelined, never materializing a doc's frames.
   */
  def frameSample(media: DataFrame, frameBytes: Int, every: Int): Dataset[FrameRow] = {
    require(frameBytes > 0 && every > 0,
      s"frameBytes and every must be positive: $frameBytes, $every")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        val payload = if (r.payload == null) Array.empty[Byte] else r.payload
        val off = parseHeader(payload).map(_._3).getOrElse(0)
        val nFrames = (payload.length - off) / frameBytes
        (0 until nFrames).iterator.filter(_ % every == 0).map { fi =>
          var sum = 0L
          var j = off + fi * frameBytes
          val end = j + frameBytes
          while (j < end) { sum += (payload(j) & 0xFF); j += 1 }
          FrameRow(r.doc_id, fi, nFrames, sum)
        }
      }
    }
  }

  /**
   * Feature-extract a fixed-dim embedding from the media body: the byte-value
   * histogram folded mod `dims` (hist[b % dims] += 1 over body bytes).
   *
   * Integer counts stored as doubles — exact in both engines, and the output
   * plugs straight into the Similarity operators (cosinePairs/topK/ANN) for
   * cross-modal near-dup search. Headerless payloads hash the whole stream.
   */
  def featureExtract(media: DataFrame, dims: Int): Dataset[MediaEmbedding] = {
    require(dims > 0, s"embedding dims must be positive: $dims")
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val payload = if (r.payload == null) Array.empty[Byte] else r.payload
        val off = parseHeader(payload).map(_._3).getOrElse(0)
        val hist = new Array[Double](dims)
        var j = off
        while (j < payload.length) {
          hist((payload(j) & 0xFF) % dims) += 1.0
          j += 1
        }
        MediaEmbedding(r.doc_id, hist)
      }
    }
  }
}
