package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input coverage for the charset sniffer: wrong declared
  * charsets, multi-byte sequences split by truncation, unsupported
  * labels, BOM-vs-declaration precedence, prescan window limits. Pure
  * byte work — no Spark session needed. */
class CharsetSniffSpec extends AnyFunSuite {

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("priority: BOM outranks a wrong transport declaration") {
    val body = Array(0xFF.toByte, 0xFE.toByte) ++ "héllo".getBytes("UTF-16LE")
    val got = CharsetSniff.sniff(body, Some("text/html; charset=iso-8859-1"))
    assert(got == Right(CharsetSniff.Sniffed("utf-16le", "bom", "héllo")))
  }

  test("priority: transport outranks meta") {
    val body = "<meta charset=utf-8>café".getBytes("ISO-8859-1")
    // header says latin-1; meta (wrongly, here) says utf-8 — header wins
    // and the latin-1 decode succeeds
    val got = CharsetSniff.sniff(body, Some("text/html; charset=iso-8859-1"))
    assert(got.map(_.source) == Right("header"))
    assert(got.map(_.text) == Right("<meta charset=utf-8>café"))
  }

  test("meta prescan only reaches the first 1024 bytes") {
    val pad = "x" * 1100
    val body = utf8(pad + "<meta charset=iso-8859-1>") ++ Array(0xE9.toByte)
    // the declaration sits past the window, the stray 0xE9 byte breaks
    // strict UTF-8 validation, and nothing else claims the document
    assert(CharsetSniff.sniff(body, None) ==
      Left(CharsetSniff.Rejected("undeclared_not_utf8")))
    val inWindow = utf8("<meta charset=iso-8859-1>") ++ Array(0xE9.toByte)
    assert(CharsetSniff.sniff(inWindow, None).map(_.source) == Right("meta"))
  }

  test("wrong declaration: utf-8 over latin-1 bytes rejects, not mojibakes") {
    val body = "café".getBytes("ISO-8859-1")
    assert(CharsetSniff.sniff(body, Some("text/plain; charset=utf-8")) ==
      Left(CharsetSniff.Rejected("malformed_utf-8")))
  }

  test("multi-byte sequence split at a buffer edge rejects") {
    val whole = utf8("snow☃") // ☃ is 3 bytes
    val truncated = whole.dropRight(1)
    assert(CharsetSniff.sniff(truncated,
      Some("text/plain; charset=utf-8")).isLeft)
    // same split under UTF-16: odd byte count can't be code units
    val u16 = Array(0xFF.toByte, 0xFE.toByte) ++
      "ab".getBytes("UTF-16LE").dropRight(1)
    assert(CharsetSniff.sniff(u16, None) ==
      Left(CharsetSniff.Rejected("malformed_utf-16le")))
  }

  test("unknown declared charsets quarantine by name") {
    val body = utf8("whatever")
    assert(CharsetSniff.sniff(body, Some("text/html; charset=x-nonexistent-7")) ==
      Left(CharsetSniff.Rejected("unsupported_charset_x-nonexistent-7")))
  }

  test("East-Asian decoders: strict decode, strict reject") {
    val jp = "テスト こんにちは"
    assert(CharsetSniff.sniff(jp.getBytes("Shift_JIS"),
      Some("text/html; charset=Shift_JIS")).map(_.text) == Right(jp))
    val zh = "中文测试"
    assert(CharsetSniff.sniff(zh.getBytes("GBK"),
      Some("text/html; charset=gbk")).map(_.text) == Right(zh))
    val kr = "한국어 문서"
    assert(CharsetSniff.sniff(kr.getBytes("EUC-KR"),
      Some("text/html; charset=euc-kr")).map(_.text) == Right(kr))
    // a WRONG declaration over multi-byte content rejects, not mojibakes:
    // Shift-JIS lead bytes form invalid EUC-KR sequences here
    assert(CharsetSniff.sniff(jp.getBytes("Shift_JIS"),
      Some("text/html; charset=utf-8")) ==
      Left(CharsetSniff.Rejected("malformed_utf-8")))
    // truncation inside a double-byte character rejects
    val cut = java.util.Arrays.copyOf(jp.getBytes("Shift_JIS"),
      jp.getBytes("Shift_JIS").length - 1)
    assert(CharsetSniff.sniff(cut,
      Some("text/html; charset=shift_jis")) ==
      Left(CharsetSniff.Rejected("malformed_shift_jis")))
  }

  test("bare utf-16 declaration without a BOM rejects (byte order unknown)") {
    val body = "ab".getBytes("UTF-16LE")
    assert(CharsetSniff.sniff(body, Some("text/html; charset=utf-16")) ==
      Left(CharsetSniff.Rejected("utf-16_without_bom")))
  }

  test("windows-1252 holes reject; latin-1 C1 bytes do not") {
    val hole = Array(0x81.toByte) // one of 1252's five unmapped bytes
    assert(CharsetSniff.sniff(hole,
      Some("text/html; charset=windows-1252")).isLeft)
    assert(CharsetSniff.sniff(hole,
      Some("text/html; charset=iso-8859-1")).map(_.text.length) == Right(1))
    // and 1252's defined high bytes decode to their Microsoft glyphs
    val euro = Array(0x80.toByte)
    assert(CharsetSniff.sniff(euro,
      Some("text/html; charset=windows-1252")).map(_.text) == Right("€"))
  }

  test("undeclared: strict UTF-8 validation accepts, anything else rejects") {
    assert(CharsetSniff.sniff(utf8("ünïcode"), None) ==
      Right(CharsetSniff.Sniffed("utf-8", "utf8-valid", "ünïcode")))
    assert(CharsetSniff.sniff("café".getBytes("ISO-8859-1"), None) ==
      Left(CharsetSniff.Rejected("undeclared_not_utf8")))
  }

  test("utf-8 BOM is consumed, not leaked into the text") {
    val body = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8("hi")
    assert(CharsetSniff.sniff(body, None) ==
      Right(CharsetSniff.Sniffed("utf-8", "bom", "hi")))
  }

  test("http response split: boundary, missing boundary, non-http") {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
      "\r\nbody\r\n\r\nmore").getBytes("ISO-8859-1")
    val Some((head, body)) = CharsetSniff.splitHttpResponse(payload)
    assert(CharsetSniff.contentTypeOf(head).contains("text/html; charset=utf-8"))
    assert(new String(body, "UTF-8") == "body\r\n\r\nmore") // FIRST boundary splits
    assert(CharsetSniff.splitHttpResponse("no boundary".getBytes("UTF-8")).isEmpty)
    assert(CharsetSniff.splitHttpResponse(
      "GARBAGE\r\n\r\nbody".getBytes("UTF-8")).isEmpty)
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  private def defl(b: Array[Byte], raw: Boolean): Array[Byte] = {
    val df = new java.util.zip.Deflater(6, raw)
    df.setInput(b); df.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!df.finished()) bos.write(buf, 0, df.deflate(buf))
    df.end()
    bos.toByteArray
  }

  test("content-encoding: gzip / zlib-deflate / raw-deflate all inflate") {
    val body = ("x" * 500 + " payload").getBytes("UTF-8")
    assert(CharsetSniff.decodeContentEncoding(gz(body), Some("gzip"))
      .toOption.get.toSeq == body.toSeq)
    assert(CharsetSniff.decodeContentEncoding(gz(body), Some("x-gzip"))
      .toOption.get.toSeq == body.toSeq)
    assert(CharsetSniff.decodeContentEncoding(defl(body, raw = false),
      Some("deflate")).toOption.get.toSeq == body.toSeq)
    // the raw-deflate server quirk decodes via the documented fallback
    assert(CharsetSniff.decodeContentEncoding(defl(body, raw = true),
      Some("deflate")).toOption.get.toSeq == body.toSeq)
    // identity / absent pass through untouched
    assert(CharsetSniff.decodeContentEncoding(body, None).toOption.get eq body)
    assert(CharsetSniff.decodeContentEncoding(body, Some("identity"))
      .toOption.get.toSeq == body.toSeq)
  }

  test("content-encoding hostility: truncation, corruption, bomb, names") {
    val body = ("y" * 400).getBytes("UTF-8")
    val g = gz(body)
    assert(CharsetSniff.decodeContentEncoding(
      java.util.Arrays.copyOf(g, g.length - 5), Some("gzip")) ==
      Left(CharsetSniff.Rejected("truncated_gzip_body")))
    val corrupt = g.clone(); corrupt(12) = (corrupt(12) ^ 0x55).toByte
    assert(CharsetSniff.decodeContentEncoding(corrupt, Some("gzip")).isLeft)
    // wrong declared encoding: plain text labeled gzip rejects by name
    assert(CharsetSniff.decodeContentEncoding(body, Some("gzip")).isLeft)
    assert(CharsetSniff.decodeContentEncoding(body, Some("deflate")) ==
      Left(CharsetSniff.Rejected("corrupt_deflate_body")))
    // bomb cap fires BEFORE the output materializes past the limit
    val bomb = gz(new Array[Byte](1 << 22))
    assert(CharsetSniff.decodeContentEncoding(bomb, Some("gzip"),
      maxOut = 1 << 16) == Left(CharsetSniff.Rejected("encoding_bomb")))
    // br decodes since round 12 — a gzip blob LABELED br is corrupt by
    // name, not unsupported (real br flows are pinned in BrotliSpec)
    assert(CharsetSniff.decodeContentEncoding(g, Some("br")) ==
      Left(CharsetSniff.Rejected("corrupt_br_body")))
    // zstd decodes since round 13 — a gzip blob LABELED zstd is corrupt
    // by name (bad magic), not unsupported
    assert(CharsetSniff.decodeContentEncoding(g, Some("zstd")) ==
      Left(CharsetSniff.Rejected("corrupt_zstd_body")))
    // compress decodes since round 14 — a gzip blob LABELED compress
    // is corrupt by name (bad magic), not unsupported
    assert(CharsetSniff.decodeContentEncoding(g, Some("compress")) ==
      Left(CharsetSniff.Rejected("corrupt_compress_body")))
    // genuinely unknown codings still reject by name, never guess
    assert(CharsetSniff.decodeContentEncoding(g, Some("lzip")) ==
      Left(CharsetSniff.Rejected("unsupported_encoding_lzip")))
    // the real thing round-trips through the coding layer
    val zBody = ("compress coding " * 50).getBytes("UTF-8")
    assert(CharsetSniff.decodeContentEncoding(
      UnixCompress.encode(zBody), Some("x-compress"))
      .toOption.get.sameElements(zBody))
    // a gzip blob labeled "gzip, br" fails at the br stage (undone first)
    assert(CharsetSniff.decodeContentEncoding(g, Some("gzip, br")) ==
      Left(CharsetSniff.Rejected("corrupt_br_body")))
  }

  test("multi-coding chains undo right-to-left with per-stage caps") {
    val body = ("chain " * 100).getBytes("UTF-8")
    // "br, gzip" = br applied first, then gzip: decoder undoes gzip, br
    val wire = gz(Brotli.encode(body))
    assert(CharsetSniff.decodeContentEncoding(wire, Some("br, gzip"))
      .map(_.toSeq) == Right(body.toSeq))
    // identity members are transparent inside a chain
    assert(CharsetSniff.decodeContentEncoding(wire,
      Some("br, identity, gzip")).map(_.toSeq) == Right(body.toSeq))
    // the INNER stage's expansion hits the cap even when the outer
    // layer is small — a chain is two bomb opportunities, not one
    val bomb = gz(Brotli.encode(Array.fill(17 * 1024 * 1024)('x'.toByte)))
    assert(CharsetSniff.decodeContentEncoding(bomb, Some("br, gzip")) ==
      Left(CharsetSniff.Rejected("encoding_bomb")))
    // absurd chain lengths reject by name before any work
    assert(CharsetSniff.decodeContentEncoding(wire,
      Some("gzip, gzip, gzip, gzip, gzip")) ==
      Left(CharsetSniff.Rejected("encoding_chain_too_long")))
    // wrong order rejects with the stage that failed
    assert(CharsetSniff.decodeContentEncoding(wire, Some("gzip, br")) ==
      Left(CharsetSniff.Rejected("corrupt_br_body")))
  }

  test("content-encoding: zstd decodes, truncates, bombs, chains") {
    val body = ("z" * 600 + " rfc9659 payload").getBytes("UTF-8")
    def zc(b: Array[Byte]): Array[Byte] = {
      val ctx = new com.github.luben.zstd.ZstdCompressCtx()
      ctx.setLevel(3); ctx.setChecksum(true)
      try ctx.compress(b) finally ctx.close()
    }
    val z = zc(body)
    assert(CharsetSniff.decodeContentEncoding(z, Some("zstd"))
      .map(_.toSeq) == Right(body.toSeq))
    // RFC 9110 §8.4.1: content-coding tokens are case-insensitive
    assert(CharsetSniff.decodeContentEncoding(z, Some("ZSTD"))
      .map(_.toSeq) == Right(body.toSeq))
    assert(CharsetSniff.decodeContentEncoding(gz(z), Some("Zstd, GZIP"))
      .map(_.toSeq) == Right(body.toSeq))
    // truncation lands the named fate (checksum or block tail missing)
    assert(CharsetSniff.decodeContentEncoding(
      java.util.Arrays.copyOf(z, z.length - 5), Some("zstd")) ==
      Left(CharsetSniff.Rejected("truncated_zstd_body")))
    // corruption: flip a byte inside the frame body
    val corrupt = z.clone(); corrupt(z.length / 2) =
      (corrupt(z.length / 2) ^ 0x55).toByte
    assert(CharsetSniff.decodeContentEncoding(corrupt, Some("zstd")).isLeft)
    // bomb cap enforced before allocation grows past it
    val bomb = zc(new Array[Byte](1 << 22))
    assert(CharsetSniff.decodeContentEncoding(bomb, Some("zstd"),
      maxOut = 1 << 16) == Left(CharsetSniff.Rejected("encoding_bomb")))
    // zstd-in-chain with the INNER expansion hitting the cap
    val chainBomb = gz(zc(Array.fill(17 * 1024 * 1024)('x'.toByte)))
    assert(CharsetSniff.decodeContentEncoding(chainBomb, Some("zstd, gzip")) ==
      Left(CharsetSniff.Rejected("encoding_bomb")))
    // multi-frame bodies concatenate; skippable frames are transparent
    val two = zc(body.take(100)) ++ zc(body.drop(100))
    assert(CharsetSniff.decodeContentEncoding(two, Some("zstd"))
      .map(_.toSeq) == Right(body.toSeq))
  }

  test("content-encoding: bzip2 decodes with named fates") {
    val body = ("b" * 700 + " bzip2 payload").getBytes("UTF-8")
    def bzc(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new org.apache.commons.compress.compressors.bzip2
        .BZip2CompressorOutputStream(bos, 5)
      z.write(b); z.close()
      bos.toByteArray
    }
    val z = bzc(body)
    assert(CharsetSniff.decodeContentEncoding(z, Some("bzip2"))
      .map(_.toSeq) == Right(body.toSeq))
    assert(CharsetSniff.decodeContentEncoding(z, Some("x-bzip2"))
      .map(_.toSeq) == Right(body.toSeq))
    assert(CharsetSniff.decodeContentEncoding(
      java.util.Arrays.copyOf(z, z.length - 5), Some("bzip2")) ==
      Left(CharsetSniff.Rejected("truncated_bzip2_body")))
    assert(CharsetSniff.decodeContentEncoding(body, Some("bzip2")) ==
      Left(CharsetSniff.Rejected("corrupt_bzip2_body")))
    val bomb = bzc(new Array[Byte](1 << 22))
    assert(CharsetSniff.decodeContentEncoding(bomb, Some("bzip2"),
      maxOut = 1 << 16) == Left(CharsetSniff.Rejected("encoding_bomb")))
  }

  test("content-encoding: xz decodes with named fates") {
    val body = ("q" * 800 + " xz payload").getBytes("UTF-8")
    def xzc(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new org.tukaani.xz.XZOutputStream(bos,
        new org.tukaani.xz.LZMA2Options(4))
      z.write(b); z.close()
      bos.toByteArray
    }
    val z = xzc(body)
    assert(CharsetSniff.decodeContentEncoding(z, Some("xz"))
      .map(_.toSeq) == Right(body.toSeq))
    assert(CharsetSniff.decodeContentEncoding(
      java.util.Arrays.copyOf(z, z.length - 7), Some("xz")) ==
      Left(CharsetSniff.Rejected("truncated_xz_body")))
    assert(CharsetSniff.decodeContentEncoding(body, Some("xz")) ==
      Left(CharsetSniff.Rejected("corrupt_xz_body")))
    val bomb = xzc(new Array[Byte](1 << 22))
    assert(CharsetSniff.decodeContentEncoding(bomb, Some("xz"),
      maxOut = 1 << 16) == Left(CharsetSniff.Rejected("encoding_bomb")))
  }

  test("content-encoding header extraction") {
    val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Content-Encoding: GZip\r\n\r\nbody").getBytes("ISO-8859-1")
    val Some((head, _)) = CharsetSniff.splitHttpResponse(payload)
    assert(CharsetSniff.contentEncodingOf(head).contains("gzip"))
  }

  test("quoted and unquoted charset params both parse") {
    assert(CharsetSniff.declaredInContentType("text/html; charset=\"UTF-8\"")
      .contains("utf-8"))
    assert(CharsetSniff.declaredInContentType("text/html;charset=ISO-8859-1")
      .contains("iso-8859-1"))
    assert(CharsetSniff.declaredInContentType("text/html").isEmpty)
  }
}
