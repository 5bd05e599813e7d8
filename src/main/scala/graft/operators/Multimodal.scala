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
        val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        val parts = s.split("\\|", 4)
        // a malformed 4-part payload (wrong magic / non-numeric dims) must
        // fall back to RAW like any other undecodable input, not kill the
        // task with a NumberFormatException — a real codec would do the same
        val (kind, w, h) =
          if (parts.length == 4 && parts(0) == "IMG" &&
              parts(1).nonEmpty && parts(1).length <= 9 && parts(1).forall(_.isDigit) &&
              parts(2).nonEmpty && parts(2).length <= 9 && parts(2).forall(_.isDigit))
            (parts(0), parts(1).toInt, parts(2).toInt)
          else ("RAW", 0, 0)
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
}
