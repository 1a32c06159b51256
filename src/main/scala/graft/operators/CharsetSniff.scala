package graft.operators

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CodingErrorAction}

/** Charset sniffing + strict transcode — the missing FIRST stage of web
  * ingest. Real crawls are ~10-20% non-UTF-8 (legacy Latin-1 /
  * windows-1252 pages, the odd UTF-16 export); treating raw response
  * bytes as a JVM string mojibakes every one of them, silently, which is
  * worse than dropping them.
  *
  * Detection priority follows the WHATWG encoding-sniffing algorithm's
  * order (https://html.spec.whatwg.org/#determining-the-character-encoding):
  *
  *   1. BOM — UTF-8 (EF BB BF), UTF-16LE (FF FE), UTF-16BE (FE FF);
  *      a BOM outranks every declaration, including a WRONG one;
  *   2. transport layer — the `charset=` parameter of the HTTP
  *      Content-Type header;
  *   3. in-document prescan — `<meta charset=...>` or the legacy
  *      `<meta http-equiv=content-type content="...; charset=...">`
  *      within the first 1024 bytes (the spec's prescan window);
  *   4. no declaration — STRICT UTF-8 validation. Validity of
  *      multi-byte UTF-8 is structural evidence, not a guess (random
  *      legacy bytes almost never form valid sequences); pure ASCII
  *      passes trivially. Anything else is rejected.
  *
  * Decode is reject-don't-guess, like every codec in this repo: the
  * declared charset is decoded STRICTLY (CodingErrorAction.REPORT), so a
  * wrong declaration (utf-8 declared over latin-1 bytes), a multi-byte
  * sequence split by truncation, or an unmapped windows-1252 byte
  * quarantines the document with a reason instead of yielding U+FFFD
  * soup. Unsupported declared charsets (Shift-JIS, GBK, …) are likewise
  * quarantined by NAME — at 100 TB you route those shards to a
  * transcoding pass with the right decoders, you don't fold them into
  * the wrong one.
  *
  * Everything is per-row byte work (no shuffle, no state); the operator
  * composes in front of [[TextAnalysis.htmlToText]] and the q200 ingest
  * chain.
  */
object CharsetSniff {

  /** charset = the canonical name actually decoded with; source = which
    * rule won (`bom` / `header` / `meta` / `utf8-valid`). */
  final case class Sniffed(charset: String, source: String, text: String)

  /** Reject reasons are stable strings — they land in quarantine tables
    * and specs assert on them. */
  final case class Rejected(reason: String)

  /** label (lowercased alias) -> JDK charset name. Shared with the MIME
    * walk: RFC 2047 encoded-words carry the same real-world labels this
    * table already covers, so a `=?Shift_JIS?B?...?=` subject decodes
    * strictly instead of passing through undecoded. */
  private[operators] val Supported: Map[String, String] = Map(
    "utf-8" -> "UTF-8", "utf8" -> "UTF-8",
    "us-ascii" -> "US-ASCII", "ascii" -> "US-ASCII",
    "iso-8859-1" -> "ISO-8859-1", "latin-1" -> "ISO-8859-1",
    "latin1" -> "ISO-8859-1", "iso8859-1" -> "ISO-8859-1",
    // HTML5 aliases iso-8859-1 labels to windows-1252 — we keep them
    // distinct: latin-1's 0x80-0x9F are valid (C1 controls), 1252's five
    // holes are not, and a corpus wants the stricter read it declared
    "windows-1252" -> "windows-1252", "cp1252" -> "windows-1252",
    "x-cp1252" -> "windows-1252",
    "utf-16le" -> "UTF-16LE", "utf-16be" -> "UTF-16BE",
    // bare utf-16 is honored only when a BOM disambiguates byte order;
    // sniff() resolves it before lookup
    "utf-16" -> "UTF-16",
    // the East-Asian + legacy-European decoders real crawls hit (~10-20%
    // of non-UTF-8 pages): the JDK ships strict implementations of all
    // of them, so "support" costs only the alias table — each still
    // decodes with CodingErrorAction.REPORT, so a WRONG declaration
    // quarantines rather than mojibaking
    "shift_jis" -> "Shift_JIS", "shift-jis" -> "Shift_JIS",
    "sjis" -> "Shift_JIS", "x-sjis" -> "Shift_JIS",
    "windows-31j" -> "windows-31j", "cp932" -> "windows-31j",
    "euc-jp" -> "EUC-JP",
    "gbk" -> "GBK", "gb2312" -> "GB2312", "cp936" -> "GBK",
    "gb18030" -> "GB18030",
    "big5" -> "Big5",
    "euc-kr" -> "EUC-KR", "ks_c_5601-1987" -> "EUC-KR",
    "windows-1251" -> "windows-1251", "cp1251" -> "windows-1251",
    "koi8-r" -> "KOI8-R",
    "iso-8859-2" -> "ISO-8859-2", "latin2" -> "ISO-8859-2",
    "iso-8859-15" -> "ISO-8859-15", "latin9" -> "ISO-8859-15",
    "iso-8859-9" -> "ISO-8859-9", "windows-1254" -> "windows-1254",
    "windows-1250" -> "windows-1250", "windows-1256" -> "windows-1256",
    "tis-620" -> "TIS-620", "windows-874" -> "x-windows-874")

  /** Strict decode: any malformed or unmappable input rejects. */
  def decodeStrict(bytes: Array[Byte], offset: Int, javaName: String): Option[String] =
    try {
      val dec = Charset.forName(javaName).newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(
        ByteBuffer.wrap(bytes, offset, bytes.length - offset)).toString)
    } catch {
      case _: java.nio.charset.CharacterCodingException => None
      case _: java.nio.charset.UnsupportedCharsetException => None
    }

  /** BOM detection: (java charset name, bom length). UTF-16 BOMs are
    * checked before UTF-8's (no prefix ambiguity exists, but the order
    * documents intent). */
  def bomOf(b: Array[Byte]): Option[(String, Int)] =
    if (b.length >= 3 && (b(0) & 0xff) == 0xEF && (b(1) & 0xff) == 0xBB &&
        (b(2) & 0xff) == 0xBF) Some(("UTF-8", 3))
    else if (b.length >= 2 && (b(0) & 0xff) == 0xFF && (b(1) & 0xff) == 0xFE)
      Some(("UTF-16LE", 2))
    else if (b.length >= 2 && (b(0) & 0xff) == 0xFE && (b(1) & 0xff) == 0xFF)
      Some(("UTF-16BE", 2))
    else None

  private val CharsetParam =
    """(?i)charset\s*=\s*"?([A-Za-z0-9._:-]+)"?""".r

  /** The charset parameter of a Content-Type value, lowercased. */
  def declaredInContentType(contentType: String): Option[String] =
    CharsetParam.findFirstMatchIn(contentType)
      .map(_.group(1).toLowerCase(java.util.Locale.ROOT))

  private val MetaCharset =
    """(?i)<meta[^>]*\bcharset\s*=\s*["']?([A-Za-z0-9._:-]+)""".r

  /** Prescan the first 1024 bytes (decoded permissively as latin-1 — the
    * prescan only needs the ASCII skeleton) for a meta charset
    * declaration; covers both `<meta charset=x>` and the http-equiv
    * form, whose charset also arrives via the same `charset=` token. */
  def metaCharset(body: Array[Byte]): Option[String] = {
    val window = new String(body, 0, math.min(1024, body.length), "ISO-8859-1")
    MetaCharset.findFirstMatchIn(window)
      .map(_.group(1).toLowerCase(java.util.Locale.ROOT))
  }

  /** Sniff-and-decode one response body. `contentType` is the transport
    * Content-Type value when the caller has one. */
  def sniff(body: Array[Byte],
      contentType: Option[String] = None): Either[Rejected, Sniffed] = {
    bomOf(body) match {
      case Some((cs, skip)) =>
        return decodeStrict(body, skip, cs)
          .map(t => Sniffed(cs.toLowerCase(java.util.Locale.ROOT), "bom", t))
          .toRight(Rejected(s"malformed_${cs.toLowerCase(java.util.Locale.ROOT)}"))
      case None => ()
    }
    val declared: Option[(String, String)] =
      contentType.flatMap(declaredInContentType).map((_, "header"))
        .orElse(metaCharset(body).map((_, "meta")))
    declared match {
      case Some((label, source)) =>
        Supported.get(label) match {
          case None => Left(Rejected(s"unsupported_charset_$label"))
          case Some("UTF-16") =>
            // byte order is BOM-only information and no BOM matched above
            Left(Rejected("utf-16_without_bom"))
          case Some(javaName) =>
            // the core charsets are spec-guaranteed; the extended set
            // ships in the JDK's charsets module — a stripped runtime
            // missing one quarantines by NAME, never mislabels as
            // malformed bytes
            if (!Charset.isSupported(javaName))
              Left(Rejected(s"charset_missing_in_jvm_$label"))
            else decodeStrict(body, 0, javaName)
              .map(t => Sniffed(javaName.toLowerCase(java.util.Locale.ROOT), source, t))
              .toRight(Rejected(s"malformed_${label}"))
        }
      case None =>
        decodeStrict(body, 0, "UTF-8")
          .map(t => Sniffed("utf-8", "utf8-valid", t))
          .toRight(Rejected("undeclared_not_utf8"))
    }
  }

  /** Split an HTTP response message into (header block, body bytes) at
    * the first CRLFCRLF — the WARC `response` record payload shape. None
    * when no header/body boundary exists or the status line isn't
    * HTTP/x. Header bytes are decoded as latin-1 (RFC 9110: field values
    * are effectively opaque octets; latin-1 preserves them losslessly). */
  def splitHttpResponse(payload: Array[Byte]): Option[(String, Array[Byte])] = {
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return None
    val head = new String(payload, 0, split, "ISO-8859-1")
    if (!head.startsWith("HTTP/")) return None
    Some((head, java.util.Arrays.copyOfRange(payload, split + 4, payload.length)))
  }

  /** The Content-Type value of an HTTP header block, if present. */
  def contentTypeOf(headerBlock: String): Option[String] =
    headerBlock.split("\r\n").iterator.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT)
          .startsWith("content-type:") =>
        l.substring("content-type:".length).trim
    }

  /** The Content-Encoding value (lowercased, full list), if present.
    * Multi-codings ("br, gzip") keep the full list — the decoder below
    * undoes the chain right-to-left per RFC 9110 application order. */
  def contentEncodingOf(headerBlock: String): Option[String] =
    headerBlock.split("\r\n").iterator.drop(1).collectFirst {
      case l if l.toLowerCase(java.util.Locale.ROOT)
          .startsWith("content-encoding:") =>
        l.substring("content-encoding:".length).trim
          .toLowerCase(java.util.Locale.ROOT)
    }

  /** Undo the HTTP Content-Encoding BEFORE the charset gate — a gzip'd
    * body handed straight to the sniffer quarantines as
    * `undeclared_not_utf8` (compressed bytes are never valid UTF-8),
    * which mislabels a perfectly decodable page. identity/absent pass
    * through; gzip/x-gzip inflate via the JDK with the size cap applied
    * BEFORE allocation grows past it (bomb guard); deflate tries the
    * RFC 9110 zlib wrapping first and falls back to raw deflate (the
    * well-known server quirk — both are deterministic, no guessing
    * beyond the documented fallback); br decodes via the from-scratch
    * RFC 7932 decoder (graft.operators.Brotli, interop-pinned against
    * the system libbrotli) with the same bomb cap and named
    * truncation/corruption fates; zstd (RFC 9659's content coding)
    * decodes via the from-scratch RFC 8878 decoder
    * (graft.operators.Zstd, interop-pinned against zstd-jni) with the
    * same cap threaded through (enforced before allocation) and named
    * truncated/corrupt fates — a multi-frame body concatenates frame
    * contents, skippable frames skipped, per the RFC's stream shape;
    * MULTI-CODING chains ("br, gzip" = br applied first, gzip second —
    * RFC 9110 lists codings in application order) undo right-to-left
    * with the cap enforced at EVERY stage (a chain is two bomb
    * opportunities, not one); compress (Unix LZW, the last registered
    * coding) decodes via graft.operators.UnixCompress, encoder-pinned
    * against the system gzip. Coding tokens
    * are matched case-insensitively (RFC 9110 §8.4.1: content-coding
    * values are case-insensitive) — 'Br'/'GZIP' decode, not
    * quarantine. */
  def decodeContentEncoding(body: Array[Byte], encoding: Option[String],
      maxOut: Int = 1 << 24): Either[Rejected, Array[Byte]] = {
    val codings = encoding.map(_.trim).filter(_.nonEmpty).toSeq
      .flatMap(_.split(",").iterator
        .map(_.trim.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty))
      .filter(_ != "identity")
    if (codings.length > 1) {
      if (codings.length > 4) return Left(Rejected("encoding_chain_too_long"))
      return codings.reverse.foldLeft(
        Right(body): Either[Rejected, Array[Byte]]) { (acc, enc) =>
        acc.flatMap(b => decodeOneEncoding(b, enc, maxOut))
      }
    }
    decodeOneEncoding(body, codings.headOption.orNull, maxOut)
  }

  private def decodeOneEncoding(body: Array[Byte], enc: String,
      maxOut: Int): Either[Rejected, Array[Byte]] =
    Option(enc) match {
      case None => Right(body)
      case Some(e) if e == "gzip" || e == "x-gzip" =>
        try {
          val in = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(body))
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](16 * 1024)
          var n = in.read(buf)
          while (n >= 0) {
            out.write(buf, 0, n)
            if (out.size() > maxOut) return Left(Rejected("encoding_bomb"))
            n = in.read(buf)
          }
          Right(out.toByteArray)
        } catch {
          case _: java.io.EOFException => Left(Rejected("truncated_gzip_body"))
          case _: java.io.IOException => Left(Rejected("corrupt_gzip_body"))
        }
      case Some("deflate") =>
        def inflate(raw: Boolean): Either[Rejected, Array[Byte]] = {
          val inf = new java.util.zip.Inflater(raw)
          try {
            inf.setInput(body)
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](16 * 1024)
            while (!inf.finished()) {
              val n = inf.inflate(buf)
              if (n == 0) {
                if (inf.needsInput() || inf.needsDictionary())
                  return Left(Rejected("truncated_deflate_body"))
              } else {
                out.write(buf, 0, n)
                if (out.size() > maxOut) return Left(Rejected("encoding_bomb"))
              }
            }
            Right(out.toByteArray)
          } catch {
            case _: java.util.zip.DataFormatException =>
              Left(Rejected("corrupt_deflate_body"))
          } finally inf.end()
        }
        inflate(raw = false) match {
          case r @ Right(_) => r
          case Left(_) => inflate(raw = true) match {
            case r @ Right(_) => r
            case Left(_) => Left(Rejected("corrupt_deflate_body"))
          }
        }
      case Some("br") =>
        Brotli.decode(body, maxOut) match {
          case Right(d) => Right(d.content)
          case Left(Brotli.Rejected("truncated_brotli")) =>
            Left(Rejected("truncated_br_body"))
          case Left(Brotli.Rejected("brotli_bomb")) =>
            Left(Rejected("encoding_bomb"))
          case Left(_) => Left(Rejected("corrupt_br_body"))
        }
      case Some("zstd") =>
        Zstd.decode(body, None, maxOut) match {
          case Right(frames) =>
            val data = frames.filterNot(_.skippable)
            val total = data.foldLeft(0L)(_ + _.content.length)
            if (total > maxOut) Left(Rejected("encoding_bomb"))
            else if (data.isEmpty) Left(Rejected("corrupt_zstd_body"))
            else if (data.length == 1) Right(data.head.content)
            else {
              val out = new Array[Byte](total.toInt)
              var off = 0
              data.foreach { f =>
                System.arraycopy(f.content, 0, out, off, f.content.length)
                off += f.content.length
              }
              Right(out)
            }
          case Left(Zstd.Rejected("oversized")) =>
            Left(Rejected("encoding_bomb"))
          case Left(Zstd.Rejected(r)) if r.startsWith("truncated_") =>
            Left(Rejected("truncated_zstd_body"))
          case Left(_) => Left(Rejected("corrupt_zstd_body"))
        }
      case Some(e) if e == "bzip2" || e == "x-bzip2" =>
        // not an IANA-registered coding, but real servers ship it; the
        // from-scratch RFC-shaped decoder (graft.operators.Bzip2,
        // 900/900 against libbz2) makes decode strictly better than a
        // named quarantine
        Bzip2.decode(body, maxOut) match {
          case Right(d) => Right(d)
          case Left(Bzip2.Rejected("bzip2_bomb")) =>
            Left(Rejected("encoding_bomb"))
          case Left(Bzip2.Rejected("truncated_bzip2")) =>
            Left(Rejected("truncated_bzip2_body"))
          case Left(_) => Left(Rejected("corrupt_bzip2_body"))
        }
      case Some(e) if e == "xz" || e == "x-xz" =>
        // same footing as bzip2: unofficial but shipped; from-scratch
        // container+LZMA2 decode (graft.operators.Xz, 900/900 against
        // liblzma)
        Xz.decode(body, maxOut) match {
          case Right(d) => Right(d)
          case Left(Xz.Rejected("lzma2_bomb")) =>
            Left(Rejected("encoding_bomb"))
          case Left(Xz.Rejected(r)) if r.startsWith("truncated_") =>
            Left(Rejected("truncated_xz_body"))
          case Left(_) => Left(Rejected("corrupt_xz_body"))
        }
      case Some(e) if e == "compress" || e == "x-compress" =>
        // the last registered coding (RFC 9110 lists it; ancient
        // servers still emit it): Unix LZW via
        // graft.operators.UnixCompress, encoder-pinned against the
        // system gzip (tools/fuzz_compress_diff.py)
        UnixCompress.decode(body, maxOut) match {
          case Right(d) => Right(d)
          case Left(UnixCompress.Rejected("lzw_bomb")) =>
            Left(Rejected("encoding_bomb"))
          case Left(UnixCompress.Rejected("truncated_z")) =>
            Left(Rejected("truncated_compress_body"))
          case Left(_) => Left(Rejected("corrupt_compress_body"))
        }
      case Some(other) =>
        Left(Rejected(
          s"unsupported_encoding_${other.replaceAll("[^a-z0-9x-]", "_")}"))
    }
}
