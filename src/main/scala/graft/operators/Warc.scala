package graft.operators

/** Minimal WARC/1.0 reader/writer — the container format web-scale
  * pretraining corpora actually arrive in (Common Crawl ships WARC; the
  * ISO 28500 record grammar is: a version line, CRLF header lines until a
  * blank line, exactly Content-Length payload bytes, then a CRLF CRLF
  * record separator).
  *
  * Same philosophy as the image/audio codecs: reject-don't-guess. A blob
  * that violates the grammar anywhere (bad version line, malformed
  * header, missing/overstated Content-Length, truncated payload, missing
  * separator) parses to None rather than a partial record list — a
  * 100 TB ingest wants corrupt shards quarantined, not silently
  * half-read. Payloads are raw bytes (never decoded here), so binary
  * response bodies pass through untouched.
  */
object Warc {

  /** Gzip one record (or any byte run) as a single member — Common Crawl
    * ships `.warc.gz` as CONCATENATED per-record members, so readers can
    * seek to a record boundary and decompress just that record. */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(buf)
    gz.write(data); gz.close()
    buf.toByteArray
  }

  /** Decompress a (possibly multi-member) gzip blob, or None on any
    * corruption — bad magic, truncated member, CRC/length mismatch
    * (GZIPInputStream verifies both trailers). Same quarantine contract
    * as [[parse]]: a corrupt shard yields nothing, never a prefix. */
  def gunzipAll(blob: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(blob))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      in.close()
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  final case class WarcRecord(
      warc_type: String,
      target_uri: String,
      warc_date: String,
      content_length: Long,
      body: Array[Byte])

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Serialize one record. Standard headers (WARC-Type, WARC-Target-URI,
    * WARC-Date) plus Content-Length are emitted in a fixed order, so the
    * writer is deterministic byte-for-byte. */
  def writeRecord(
      warcType: String,
      targetUri: String,
      warcDate: String,
      body: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (targetUri != null)
      sb.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    sb.append("WARC-Date: ").append(warcDate).append("\r\n")
    sb.append("Content-Length: ").append(body.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    System.arraycopy(Crlf, 0, out, head.length + body.length, 2)
    System.arraycopy(Crlf, 0, out, head.length + body.length + 2, 2)
    out
  }

  /** Parse a whole WARC blob into its records, or None if the grammar is
    * violated anywhere. Headers are case-insensitive per spec; unknown
    * headers are retained only insofar as the record's typed fields miss
    * them (this reader surfaces the four every pipeline needs). */
  def parse(blob: Array[Byte]): Option[Seq[WarcRecord]] = {
    val out = Seq.newBuilder[WarcRecord]
    var i = 0
    // read one CRLF-terminated ASCII line starting at `i`; returns
    // (line-without-terminator, next index) or null on violation
    def line(): String = {
      var j = i
      while (j + 1 < blob.length &&
        !(blob(j) == '\r' && blob(j + 1) == '\n')) j += 1
      if (j + 1 >= blob.length) return null
      val s = new String(blob, i, j - i, "UTF-8")
      i = j + 2
      s
    }
    while (i < blob.length) {
      val version = line()
      if (version == null || version != "WARC/1.0") return None
      var warcType: String = null
      var uri: String = null
      var date: String = null
      var len = -1L
      var headerDone = false
      while (!headerDone) {
        val l = line()
        if (l == null) return None
        if (l.isEmpty) headerDone = true
        else {
          val c = l.indexOf(':')
          if (c <= 0 || c + 1 >= l.length || l.charAt(c + 1) != ' ')
            return None
          val name = l.substring(0, c).toLowerCase(java.util.Locale.ROOT)
          val value = l.substring(c + 2)
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-length" =>
              len = try value.toLong catch { case _: NumberFormatException => return None }
            case _ => () // other headers pass through
          }
        }
      }
      if (warcType == null || len < 0) return None
      if (i + len + 4 > blob.length) return None // truncated payload/sep
      val body = java.util.Arrays.copyOfRange(blob, i, i + len.toInt)
      i += len.toInt
      if (!(blob(i) == '\r' && blob(i + 1) == '\n' &&
        blob(i + 2) == '\r' && blob(i + 3) == '\n')) return None
      i += 4
      out += WarcRecord(warcType, uri, date, len, body)
    }
    val records = out.result()
    if (records.isEmpty) None else Some(records)
  }
}
