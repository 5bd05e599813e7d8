package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * WARC/1.0 container parsing — the ingestion edge that turns raw
 * Common-Crawl-style archive blobs into the north-rule pages table
 * (url, warc_ts, html, ...). One input row = one archive file (or one
 * chunk of one): a concatenation of WARC records, each
 *
 * {{{
 * WARC/1.0\r\n
 * <Name>: <value>\r\n ...          (header block, ASCII)
 * \r\n
 * <Content-Length bytes of payload>
 * \r\n\r\n                         (record separator)
 * }}}
 *
 * Parsing is governed by `Content-Length` BYTE counts, never by scanning
 * for the `WARC/1.0` magic — payloads legally contain the magic (and bare
 * `\r\n\r\n`), so split-on-magic parsers corrupt real archives. The gate
 * fixture plants both traps ([[graft.QueriesWebGraph]] `%7` class) and the
 * closed-form oracle predicts the records the Content-Length walk must
 * recover.
 *
 * The per-file walk is a sequential byte-offset recurrence (each record's
 * start depends on the previous record's Content-Length), so it cannot be
 * a per-row column expression; like the Multimodal codecs it runs as one
 * deterministic UDF per file row — the explode after it is the only pivot
 * and there are zero shuffles. At 100 TB the unit of parallelism is the
 * archive chunk (Common Crawl ships ~1 GiB WARC segments; store chunks as
 * rows of a binary column, or `spark.read.format("binaryFile")`), so the
 * scan parallelizes by file and the parser never holds more than one
 * record's payload beyond the current slice. Chunking is ENFORCED, not
 * advisory: [[parseWarc]] rejects rows above `maxBlobBytes` with a loud
 * per-file error (see [[DefaultMaxBlobBytes]]).
 *
 * Malformed input semantics (all spec-asserted): a file not starting with
 * an ASCII `WARC/` magic yields no records; a header block without a
 * terminating blank line, without a parseable `Content-Length`, or
 * declaring more payload bytes than remain stops the walk at that point
 * (records before the damage are kept — truncated tail files are routine
 * in crawl storage); single-CRLF record separators are tolerated.
 */
object Warc {

  /** one parsed record: ordinal within its file, WARC-Type, optional
    * WARC-Target-URI / WARC-Date (absent on e.g. warcinfo records; kept as
    * the raw W3C datetime STRING — lexicographically ordered, engine-
    * portable), and the exact payload bytes. */
  case class WarcRecord(rec_ord: Int, record_type: String,
                        target_uri: Option[String], warc_date: Option[String],
                        payload: Array[Byte])

  private val Magic = "WARC/".getBytes("US-ASCII")

  private def startsWith(blob: Array[Byte], off: Int, pat: Array[Byte]): Boolean = {
    if (off + pat.length > blob.length) return false
    var i = 0
    while (i < pat.length) { if (blob(off + i) != pat(i)) return false; i += 1 }
    true
  }

  /** index of the first `\r\n\r\n` at or after `from`, or -1. */
  private def blankLine(blob: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < blob.length) {
      if (blob(i) == '\r' && blob(i + 1) == '\n' && blob(i + 2) == '\r' && blob(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** pure kernel: walk one archive blob. */
  def parseRecords(blob: Array[Byte]): Seq[WarcRecord] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var off = 0
    var ord = 0
    while (startsWith(blob, off, Magic)) {
      val hdrEnd = blankLine(blob, off)
      if (hdrEnd < 0) return out.toSeq
      // header bytes are ASCII per spec; ISO-8859-1 is byte-preserving for
      // lenient real-world headers
      val header = new String(blob, off, hdrEnd - off, "ISO-8859-1")
      var recType: String = null
      var uri: Option[String] = None
      var date: Option[String] = None
      var clen = -1L
      header.split("\r\n").iterator.drop(1).foreach { line =>
        val i = line.indexOf(':')
        if (i > 0) {
          val name = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          name match {
            case "warc-type"       => recType = value
            case "warc-target-uri" => uri = Some(value)
            case "warc-date"       => date = Some(value)
            case "content-length"  => clen = try value.toLong catch { case _: NumberFormatException => -1L }
            case _                 =>
          }
        }
      }
      val payloadStart = hdrEnd + 4
      if (clen < 0 || payloadStart + clen > blob.length) return out.toSeq
      out += WarcRecord(ord, if (recType == null) "" else recType, uri, date,
        java.util.Arrays.copyOfRange(blob, payloadStart, payloadStart + clen.toInt))
      ord += 1
      off = payloadStart + clen.toInt
      // record separator: two CRLFs per spec, one tolerated
      if (startsWith(blob, off, "\r\n\r\n".getBytes("US-ASCII"))) off += 4
      else if (startsWith(blob, off, "\r\n".getBytes("US-ASCII"))) off += 2
    }
    out.toSeq
  }

  /** Default per-row blob ceiling for [[parseWarc]]: 256 MiB. The walk
    * materializes every record of a blob before the explode (~2× the blob
    * in task heap), so blob size IS the task memory budget — Common Crawl's
    * ~1 GiB segments must be chunked into rows below this before ingest. */
  val DefaultMaxBlobBytes: Long = 256L * 1024 * 1024

  /**
   * Explode a table of archive blobs into one row per WARC record:
   * `(warc_file, rec_ord, record_type, target_uri, warc_date, payload_len,
   * payload)`. `fileCol` passes through as `warc_file`.
   *
   * Blobs larger than `maxBlobBytes` FAIL THE TASK LOUDLY (naming the file
   * and both sizes) instead of silently ballooning the heap: at 100 TB an
   * oversized archive row is a pipeline-config bug (missing chunking), and
   * an OOM kill three operators downstream is the worst way to learn it.
   */
  def parseWarc(files: DataFrame, fileCol: String, blobCol: String,
                maxBlobBytes: Long = DefaultMaxBlobBytes): DataFrame = {
    require(maxBlobBytes > 0, s"maxBlobBytes must be positive, got $maxBlobBytes")
    val parse = udf((file: String, blob: Array[Byte]) =>
      if (blob == null) Seq.empty[WarcRecord]
      else if (blob.length > maxBlobBytes)
        throw new IllegalArgumentException(
          s"WARC blob '$file' is ${blob.length} bytes, above the " +
            s"$maxBlobBytes-byte ceiling — chunk archive files into rows " +
            "below the ceiling (or raise parseWarc's maxBlobBytes)")
      else parseRecords(blob))
    files
      .select(col(fileCol).as("warc_file"),
        explode(parse(col(fileCol).cast("string"), col(blobCol))).as("r"))
      .select(col("warc_file"), col("r.rec_ord").as("rec_ord"),
        col("r.record_type").as("record_type"), col("r.target_uri").as("target_uri"),
        col("r.warc_date").as("warc_date"),
        length(col("r.payload")).cast("long").as("payload_len"),
        col("r.payload").as("payload"))
  }
}
