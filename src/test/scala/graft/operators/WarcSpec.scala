package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private def rec(t: String, uri: String, body: String): Array[Byte] =
    Warc.writeRecord(t, uri, "2024-01-05T00:00:00Z", body.getBytes("UTF-8"))

  test("multi-record blobs round-trip with exact octet counts") {
    val blob = rec("warcinfo", null, "software: x") ++
      rec("response", "http://e/1", "hello world") ++
      rec("response", "http://e/2", "héllo wörld") // multi-byte: octets != chars
    val got = Warc.parse(blob).get
    assert(got.map(_.warc_type) == Seq("warcinfo", "response", "response"))
    assert(got(1).target_uri == "http://e/1")
    assert(got(0).target_uri == null)
    assert(new String(got(2).body, "UTF-8") == "héllo wörld")
    // Content-Length counts OCTETS: the accented body is 13 bytes, 11 chars
    assert(got(2).content_length == "héllo wörld".getBytes("UTF-8").length)
    assert(got(2).content_length > "héllo wörld".length)
  }

  test("bodies are raw bytes: CRLFs and fake headers inside payloads do not resync") {
    // a payload that CONTAINS a full well-formed record must be returned
    // verbatim as one body — length-delimited framing, not sentinel scan
    val inner = new String(rec("response", "http://inner", "x"), "ISO-8859-1")
    val blob = rec("response", "http://outer", inner)
    val got = Warc.parse(blob).get
    assert(got.length == 1 && got.head.target_uri == "http://outer")
    assert(new String(got.head.body, "ISO-8859-1") == inner)
  }

  test("warc.gz framing: concatenated members round-trip; corrupt gzip quarantines") {
    val r1 = rec("response", "http://e/1", "hello")
    val r2 = rec("response", "http://e/2", "wörld")
    val blob = Warc.gzipMember(r1) ++ Warc.gzipMember(r2)
    // multi-member decompression yields the concatenated records
    assert(Warc.gunzipAll(blob).map(_.toSeq) == Some((r1 ++ r2).toSeq))
    assert(Warc.parse(Warc.gunzipAll(blob).get).get.length == 2)
    // truncated second member
    assert(Warc.gunzipAll(blob.dropRight(5)).isEmpty)
    // flipped byte in the compressed payload breaks the member CRC
    val m1 = Warc.gzipMember(r1)
    val bad = blob.clone()
    bad(m1.length + 20) = (bad(m1.length + 20) ^ 0x40).toByte
    assert(Warc.gunzipAll(bad).isEmpty)
    // bad magic
    val magic = blob.clone(); magic(0) = 0x1e.toByte
    assert(Warc.gunzipAll(magic).isEmpty)
    // not gzip at all
    assert(Warc.gunzipAll("plain".getBytes("UTF-8")).isEmpty)
    assert(Warc.gunzipAll(Array.emptyByteArray).isEmpty)
  }

  test("off-grammar blobs quarantine to None, never a partial parse") {
    val good = rec("response", "http://e/1", "hello") ++
      rec("response", "http://e/2", "world")
    assert(Warc.parse(good).get.length == 2)
    // truncated payload of the SECOND record: nothing survives
    assert(Warc.parse(good.dropRight(3)).isEmpty)
    // wrong version line
    val v = good.clone(); v(5) = '2'.toByte
    assert(Warc.parse(v).isEmpty)
    // overstated Content-Length reads past the end
    val idx = new String(good, "ISO-8859-1").indexOf("Content-Length: 5")
    val over = good.clone(); over(idx + 16) = '9'.toByte
    assert(Warc.parse(over).isEmpty)
    // header without the mandated ': ' separator
    val h = new String(good, "ISO-8859-1").replaceFirst("WARC-Type: ", "WARC-Type:")
    assert(Warc.parse(h.getBytes("ISO-8859-1")).isEmpty)
    // missing record separator after the payload
    val noSep = rec("response", "http://e/1", "hello").dropRight(4) ++
      "xy".getBytes("US-ASCII")
    assert(Warc.parse(noSep ++ rec("response", "http://e/2", "w")).isEmpty)
    // empty input and garbage
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
    assert(Warc.parse("not a warc".getBytes("UTF-8")).isEmpty)
  }
}
