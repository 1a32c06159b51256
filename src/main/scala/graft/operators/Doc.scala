package graft.operators

/** Legacy `.doc` (Word 97-2003 binary, [MS-DOC]) text extraction over
  * a [[Cfb]] container. The document text does NOT live at a fixed
  * offset: the FIB (File Information Block) at the head of the
  * `WordDocument` stream points (fcClx/lcbClx) into a TABLE stream
  * (`1Table` or `0Table`, selected by the FIB's fWhichTblStm bit)
  * whose Clx holds the PIECE TABLE — the PlcPcd mapping character
  * positions to byte ranges. Each piece is independently either
  * cp1252 ("fCompressed": one byte per char at fc/2) or UTF-16LE (two
  * bytes per char at fc) — fast-saved files interleave both, which is
  * exactly what naive fixed-offset extractors corrupt.
  *
  * Extraction scope (honest): the MAIN document range (first ccpText
  * characters) — footnotes/headers/annotations that follow it in CP
  * space are counted out by construction. Field codes use the same
  * begin/separator/end discipline as [[Rtf]]: the instruction between
  * 0x13 and 0x14 is dropped, the result between 0x14 and 0x15 is
  * kept. Control chars map per the public semantics: 0x0D paragraph
  * mark and 0x0B line break → '\n', 0x07 cell/row mark → '\t', 0x0C
  * page break → '\n', 0x1E non-breaking hyphen → '-', 0x1F soft
  * hyphen dropped, object anchors dropped.
  *
  * Fancy features reject by NAME: encryption (fEncrypted),
  * obfuscation (fObfuscated), a malformed Clx, a piece table whose
  * pieces escape the WordDocument stream, an unmappable cp1252 byte.
  */
object Doc {

  final case class Extracted(
      text: String,
      nParagraphs: Long,
      nPieces: Int,
      nUnicodePieces: Int)

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private def u16(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 2 > b.length) bail("truncated_fib")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 4 > b.length) bail("truncated_fib")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  }

  // FIB offsets ([MS-DOC] 2.5.1): base(32) + csw(2) + FibRgW(28) +
  // cslw(2) + FibRgLw(88) + cbRgFcLcb(2) = 0x9A; FibRgFcLcb97 pair 33
  // is fcClx/lcbClx -> 0x9A + 33*8 = 0x1A2.
  private val OffFlags = 0x0A
  private val OffCcpText = 0x4C
  private val OffFcClx = 0x1A2
  private val OffLcbClx = 0x1A6

  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  def extract(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[Rejected, Extracted] =
    Cfb.parse(blob, maxOut) match {
      case Left(reason) => Left(Rejected(s"cfb_$reason"))
      case Right(parsed) => extractFromCfb(parsed, maxOut)
    }

  /** Extract from an already-parsed container (the router path —
    * avoids paying the CFB walk twice). */
  def extractFromCfb(parsed: Cfb.Parsed, maxOut: Int = 1 << 26)
      : Either[Rejected, Extracted] =
    try {
      val word = parsed.streams.getOrElse("WordDocument",
        bail("missing_worddocument"))
      if (u16(word, 0) != 0xA5EC) bail("not_word_document")
      val flags = u16(word, OffFlags)
      if ((flags & 0x0100) != 0) bail("doc_encrypted")
      if ((flags & 0x8000) != 0) bail("doc_obfuscated")
      val whichTbl = if ((flags & 0x0200) != 0) "1Table" else "0Table"
      val table = parsed.streams.getOrElse(whichTbl,
        bail("missing_table_stream"))
      val ccpText = u32(word, OffCcpText)
      if (ccpText < 0) bail("bad_ccptext")
      // amplification bomb: overlapping pieces may each map up to the
      // whole WordDocument stream, so a 64 MB hostile .doc can legally
      // declare ccpText near 2^31 — cap BEFORE the decode loop runs
      if (ccpText > maxOut) bail("doc_text_bomb")
      val fcClx = u32(word, OffFcClx)
      val lcbClx = u32(word, OffLcbClx)
      if (lcbClx <= 0 || fcClx < 0 || fcClx.toLong + lcbClx > table.length)
        bail("clx_out_of_table")

      // ---- Clx: skip Prcs, find the Pcdt's PlcPcd -------------------
      var p = fcClx
      val clxEnd = fcClx + lcbClx
      while (p < clxEnd && (table(p) & 0xff) == 0x01) {
        val cb = u16(table, p + 1)
        p += 3 + cb
      }
      if (p >= clxEnd || (table(p) & 0xff) != 0x02) bail("bad_clx")
      val lcbPlc = u32(table, p + 1)
      p += 5
      if (lcbPlc < 4 + 12 || p.toLong + lcbPlc > clxEnd ||
        (lcbPlc - 4) % 12 != 0) bail("bad_piece_table")
      val nPieces = (lcbPlc - 4) / 12
      val cps = Array.tabulate(nPieces + 1)(i => u32(table, p + 4 * i))
      val pcdBase = p + 4 * (nPieces + 1)
      if (cps(0) != 0) bail("bad_piece_table")
      var i = 0
      while (i < nPieces) {
        if (cps(i + 1) <= cps(i)) bail("bad_piece_table")
        i += 1
      }
      if (cps(nPieces) < ccpText) bail("piece_table_short_of_ccptext")

      // ---- decode pieces, stopping at the main-range boundary -------
      val sb = new java.lang.StringBuilder
      var nUnicode = 0
      var decoded = 0 // CPs consumed so far
      i = 0
      while (i < nPieces && decoded < ccpText) {
        val pcd = pcdBase + 8 * i
        val fcField = u32(table, pcd + 2)
        val compressed = (fcField & 0x40000000) != 0
        val fc = fcField & 0x3FFFFFFF
        val pieceLen = cps(i + 1) - cps(i)
        val take = math.min(pieceLen, ccpText - decoded)
        if (compressed) {
          val off = fc / 2
          if (off.toLong + take > word.length) bail("piece_escapes_stream")
          val dec = Cp1252.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
            .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
          try sb.append(dec.decode(
            java.nio.ByteBuffer.wrap(word, off, take)).toString)
          catch {
            case _: java.nio.charset.CharacterCodingException =>
              bail("cp1252_unmappable")
          }
        } else {
          nUnicode += 1
          if (fc.toLong + 2L * take > word.length) bail("piece_escapes_stream")
          sb.append(new String(word, fc, 2 * take, "UTF-16LE"))
        }
        decoded += take
        i += 1
      }
      if (decoded < ccpText) bail("piece_table_short_of_ccptext")

      // ---- control-char mapping + field discipline ------------------
      // fields nest: 0x13 instr [0x14 result] 0x15. Drop text while ANY
      // open field hasn't reached its separator yet (a field missing
      // its 0x14 drops through to its 0x15). One boolean per open
      // field: has-seen-separator.
      val out = new java.lang.StringBuilder(sb.length)
      var nParagraphs = 0L
      val fieldSep = new java.util.ArrayDeque[java.lang.Boolean]()
      var noSepOpen = 0 // open fields still inside their instruction
      var j = 0
      while (j < sb.length) {
        val c = sb.charAt(j)
        c match {
          case 0x13 => fieldSep.push(java.lang.Boolean.FALSE); noSepOpen += 1
          case 0x14 =>
            if (!fieldSep.isEmpty && !fieldSep.peek()) {
              fieldSep.pop(); fieldSep.push(java.lang.Boolean.TRUE)
              noSepOpen -= 1
            }
          case 0x15 =>
            if (!fieldSep.isEmpty && !fieldSep.pop()) noSepOpen -= 1
          case _ if noSepOpen > 0 => () // inside a field instruction
          case 0x0D => out.append('\n'); nParagraphs += 1
          case 0x0B | 0x0C => out.append('\n')
          case 0x07 => out.append('\t')
          case 0x1E => out.append('-')
          case 0x1F | 0x01 | 0x02 | 0x05 | 0x08 => () // anchors/refs
          case 0x09 => out.append('\t')
          case c if c >= 0x20 || c == '\n' => out.append(c)
          case _ => () // remaining C0 noise
        }
        j += 1
      }
      Right(Extracted(out.toString, nParagraphs, nPieces, nUnicode))
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  // ==================================================================
  // Fixture writer
  // ==================================================================

  /** Write a minimal-but-honest `.doc`: a real CFB container, a FIB
    * with fWhichTblStm set, and a TWO-PIECE piece table — the first
    * piece cp1252-compressed, the second UTF-16LE — so every fixture
    * exercises the fast-save mixed-encoding path. Paragraphs join
    * with 0x0D; a decoy `SummaryInformation` stream rides along.
    * (Field chars can be planted by putting 0x13/0x14/0x15 into a
    * paragraph - specs exercise the discipline that way.) */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val text = paragraphs.mkString("\r") + "\r"
    // split: longest prefix that survives cp1252 (capped at half) —
    // guarantees piece 2 is non-empty so both codecs are exercised
    val half = text.length / 2
    val enc = Cp1252.newEncoder()
    var split = 0
    while (split < half && enc.canEncode(text.charAt(split))) split += 1
    // never cut a surrogate pair across the piece boundary
    if (split > 0 && Character.isHighSurrogate(text.charAt(split - 1)))
      split -= 1
    val piece1 = text.substring(0, split)
    val piece2 = text.substring(split)

    val textStart = 0x400 // text begins after the FIB block
    val p1Bytes = {
      val e = Cp1252.newEncoder()
      val bb = e.encode(java.nio.CharBuffer.wrap(piece1))
      val a = new Array[Byte](bb.remaining()); bb.get(a); a
    }
    val p2Bytes = piece2.getBytes("UTF-16LE")
    val p2Start = textStart + p1Bytes.length

    val word = new Array[Byte](textStart + p1Bytes.length + p2Bytes.length)
    def putU16(b: Array[Byte], p: Int, v: Int): Unit = {
      b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
    }
    def putU32(b: Array[Byte], p: Int, v: Int): Unit = {
      b(p) = v.toByte; b(p + 1) = (v >> 8).toByte
      b(p + 2) = (v >> 16).toByte; b(p + 3) = (v >> 24).toByte
    }
    putU16(word, 0, 0xA5EC) // wIdent
    putU16(word, 2, 0x00C1) // nFib (Word 97)
    putU16(word, OffFlags, 0x0200) // fWhichTblStm -> 1Table
    putU16(word, 0x20, 0x000E) // csw
    putU16(word, 0x3E, 0x0016) // cslw
    putU32(word, 0x40, word.length) // cbMac
    putU32(word, OffCcpText, text.length)
    putU16(word, 0x98, 0x005D) // cbRgFcLcb for nFib 0x00C1
    System.arraycopy(p1Bytes, 0, word, textStart, p1Bytes.length)
    System.arraycopy(p2Bytes, 0, word, p2Start, p2Bytes.length)

    // 1Table: a decoy Prc, then the Pcdt with the two-piece PlcPcd
    val nPieces = if (piece2.isEmpty) 1 else 2
    val lcbPlc = 4 * (nPieces + 1) + 8 * nPieces
    val prcData = Array[Byte](7, 7, 7, 7) // opaque property payload
    val table = new Array[Byte](3 + prcData.length + 5 + lcbPlc)
    table(0) = 0x01 // Prc
    putU16(table, 1, prcData.length)
    System.arraycopy(prcData, 0, table, 3, prcData.length)
    var t = 3 + prcData.length
    table(t) = 0x02 // Pcdt
    putU32(table, t + 1, lcbPlc)
    t += 5
    putU32(table, t, 0)
    putU32(table, t + 4, piece1.length)
    if (nPieces == 2) putU32(table, t + 8, text.length)
    var pcd = t + 4 * (nPieces + 1)
    putU16(table, pcd, 0)
    putU32(table, pcd + 2, (textStart * 2) | 0x40000000) // compressed
    putU16(table, pcd + 6, 0)
    if (nPieces == 2) {
      pcd += 8
      putU16(table, pcd, 0)
      putU32(table, pcd + 2, p2Start) // unicode
      putU16(table, pcd + 6, 0)
    }

    putU32(word, OffFcClx, 0)
    putU32(word, OffLcbClx, table.length)

    Cfb.write(Seq(
      "WordDocument" -> word,
      "1Table" -> table,
      "SummaryInformation" -> Array.fill[Byte](32)(0x2A)))
  }
}
