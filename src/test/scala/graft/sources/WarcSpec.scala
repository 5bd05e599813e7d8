package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.SparkTestBase

/** WARC walk semantics: Content-Length governs (embedded magic and bare
  * CRLF-CRLF in payloads do not shear records), header-name case folding,
  * separator leniency, and stop-on-damage truncation. */
class WarcSpec extends AnyFunSuite {
  val spark = SparkTestBase.spark
  import spark.implicits._

  private def rec(typ: String, uri: Option[String], date: Option[String],
                  payload: String, lowerNames: Boolean = false,
                  sep: String = "\r\n\r\n"): String = {
    val tn = if (lowerNames) "warc-type" else "WARC-Type"
    val cn = if (lowerNames) "content-length" else "Content-Length"
    s"WARC/1.0\r\n$tn: $typ\r\n" +
      uri.map(u => s"WARC-Target-URI: $u\r\n").getOrElse("") +
      date.map(d => s"WARC-Date: $d\r\n").getOrElse("") +
      s"$cn: ${payload.getBytes("UTF-8").length}\r\n\r\n$payload$sep"
  }

  test("parseRecords: embedded magic and blank lines inside payload do not shear") {
    val trap = "pre\r\nWARC/1.0\r\n\r\npost"
    val blob = (rec("response", Some("http://a/1"), Some("2026-01-01T00:00:00Z"), trap) +
      rec("response", Some("http://a/2"), None, "x")).getBytes("UTF-8")
    val got = Warc.parseRecords(blob)
    assert(got.map(r => (r.rec_ord, r.target_uri.get, new String(r.payload, "UTF-8"))) ==
      Seq((0, "http://a/1", trap), (1, "http://a/2", "x")))
  }

  test("parseRecords: lowercase header names, single-CRLF separator tolerated") {
    val blob = (rec("warcinfo", None, Some("2026-01-01T00:00:00Z"), "sw: g",
        lowerNames = true, sep = "\r\n") +
      rec("request", Some("http://a/q"), None, "GET / HTTP/1.1")).getBytes("UTF-8")
    val got = Warc.parseRecords(blob)
    assert(got.map(r => (r.record_type, r.target_uri, r.warc_date)) == Seq(
      ("warcinfo", None, Some("2026-01-01T00:00:00Z")),
      ("request", Some("http://a/q"), None)))
  }

  test("parseRecords: stop-on-damage keeps prior records") {
    val ok = rec("response", Some("http://a/1"), None, "body")
    // truncated header (no blank line)
    assert(Warc.parseRecords((ok + "WARC/1.0\r\nWARC-Type: resp").getBytes("UTF-8")).size == 1)
    // content-length beyond blob end
    val overlong = ok + "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999\r\n\r\nshort"
    assert(Warc.parseRecords(overlong.getBytes("UTF-8")).size == 1)
    // missing content-length entirely
    val noLen = ok + "WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
    assert(Warc.parseRecords(noLen.getBytes("UTF-8")).size == 1)
    // non-WARC prefix: nothing at all
    assert(Warc.parseRecords(("junk" + ok).getBytes("UTF-8")).isEmpty)
  }

  test("parseRecords round-trip: random BINARY payloads incl. spliced magic survive byte-exactly") {
    val r = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val recs = (0 until 1 + r.nextInt(5)).map { i =>
        val raw = Array.fill(r.nextInt(200))(r.nextInt(256).toByte)
        val p = if (i % 2 == 0)
          "WARC/1.0\r\n\r\n".getBytes("ISO-8859-1") ++ raw else raw
        (s"http://t/$trial/$i", p)
      }
      val blob = recs.flatMap { case (u, p) =>
        (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $u\r\n" +
          s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
          p ++ "\r\n\r\n".getBytes("ISO-8859-1")
      }.toArray
      val got = Warc.parseRecords(blob)
      assert(got.size == recs.size, s"trial $trial")
      got.zip(recs).foreach { case (g, (u, p)) =>
        assert(g.target_uri.contains(u))
        assert(java.util.Arrays.equals(g.payload, p), s"payload bytes differ for $u")
      }
    }
  }

  test("parseWarc: explode shape, payload_len, null file") {
    val blob = rec("response", Some("http://a/1"), Some("2026-01-01T00:00:00Z"), "abcde") +
      rec("request", Some("http://a/1"), None, "GET")
    val df = Seq(("f1", blob), ("f2", null.asInstanceOf[String])).toDF("f", "b")
      .withColumn("b", col("b").cast("binary"))
    val got = Warc.parseWarc(df, "f", "b").collect()
    assert(got.length == 2 && got.forall(_.getString(0) == "f1"))
    val resp = got.find(_.getString(2) == "response").get
    assert(resp.getInt(1) == 0 && resp.getLong(5) == 5L &&
      new String(resp.getAs[Array[Byte]](6), "UTF-8") == "abcde")
  }

  test("parseWarc: oversized blob fails loudly, naming the file and the ceiling") {
    val small = rec("response", Some("http://a/1"), None, "ok")
    val big = rec("response", Some("http://a/2"), None, "x" * 200)
    val df = Seq(("small.warc", small), ("big.warc", big)).toDF("f", "b")
      .withColumn("b", col("b").cast("binary"))
    // under-ceiling rows parse; the oversized row kills the job with a
    // message pinpointing the file, not an OOM three stages later
    val ex = intercept[org.apache.spark.SparkException] {
      Warc.parseWarc(df, "f", "b", maxBlobBytes = 100L).collect()
    }
    val msg = Option(ex.getCause).fold(ex.getMessage)(_.getMessage)
    assert(msg.contains("big.warc") && msg.contains("100-byte ceiling"), msg)
    // a permissive ceiling admits both rows unchanged
    assert(Warc.parseWarc(df, "f", "b", maxBlobBytes = 1L << 20).count() == 2)
    assert(intercept[IllegalArgumentException](
      Warc.parseWarc(df, "f", "b", maxBlobBytes = 0L)).getMessage
      .contains("maxBlobBytes"))
  }
}
