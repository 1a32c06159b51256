package graft.operators

/** Legacy `.xls` (BIFF8, [MS-XLS]) census + shared-string text over a
  * [[Cfb]] container — closing the `ole2_xls` fate [[OfficeRouter]]
  * has named since the CFB walk landed. The `Workbook` stream is a
  * BIFF record stream ([u16 type][u16 size][payload ≤ 8224]): the
  * workbook-globals substream carries BoundSheet8 (sheet names +
  * substream offsets) and the SST (shared strings); each worksheet
  * substream carries the cells — LabelSst points into the SST by
  * index, Number carries an IEEE double, RK the packed 30-bit
  * encoding (int/÷100/double-prefix), MulRk a run of RKs.
  *
  * The part that breaks naive readers — and the reason a censusless
  * `ole2_xls` stays honest until this exists — is SST CONTINUATION:
  * strings split across Continue (0x003C) records, and a split inside
  * character data re-declares the fHighByte flag at the continuation
  * boundary, so one logical string can switch between cp1252-packed
  * and UTF-16LE halves mid-stream. The reader here models the record
  * stream as a cursor that knows field-vs-character-data context.
  * Fixtures deliberately split a string mid-characters WITH a flag
  * flip.
  *
  * Scope (honest): string and numeric cell content + sheet census —
  * what a text-corpus pipeline actually wants from a spreadsheet.
  * Formulas (their cached results are typed records we don't walk),
  * charts, macros are out of scope; encrypted workbooks (FilePass)
  * reject by name. No .xls generator exists on-system (no POI) —
  * construct-and-cross-check with hostile mutations, like [[Cfb]].
  */
object Xls {

  final case class Extracted(
      biffVersion: Int,
      sheetNames: Seq[String],
      nStrings: Long, // cstUnique
      sstText: String, // unique strings joined with '\n'
      nLabelCells: Long,
      nNumberCells: Long,
      numericSum: Double)

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val RecBof = 0x0809
  private val RecEof = 0x000A
  private val RecContinue = 0x003C
  private val RecBoundSheet = 0x0085
  private val RecSst = 0x00FC
  private val RecLabelSst = 0x00FD
  private val RecNumber = 0x0203
  private val RecRk = 0x027E
  private val RecMulRk = 0x00BD
  private val RecFilePass = 0x002F

  private def u16(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 2 > b.length) bail("truncated_record")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 4 > b.length) bail("truncated_record")
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  }

  /** Cursor over an SST that spans its record plus Continue records.
    * Field reads (counts, flags) never straddle a boundary in real
    * files; CHARACTER data may, and the continuation re-declares the
    * compression flag. */
  private final class SstCursor(stream: Array[Byte], sstStart: Int,
      sstLen: Int) {
    // (start, end) of each data region: the SST payload, then each
    // immediately-following Continue payload
    private val regions = {
      val out = Seq.newBuilder[(Int, Int)]
      out += ((sstStart, sstStart + sstLen))
      var p = sstStart + sstLen
      var more = true
      while (more && p + 4 <= stream.length) {
        val t = u16(stream, p)
        val len = u16(stream, p + 2)
        if (t == RecContinue) {
          out += ((p + 4, p + 4 + len))
          p += 4 + len
        } else more = false
      }
      out.result()
    }
    private var region = 0
    private var pos = regions.head._1

    private def regionEnd: Int = regions(region)._2
    def remainingInRegion: Int = regionEnd - pos

    private def advanceRegion(): Unit = {
      if (region + 1 >= regions.length) bail("sst_truncated")
      region += 1
      pos = regions(region)._1
    }

    def u8(): Int = {
      if (pos >= regionEnd) advanceRegion()
      val v = stream(pos) & 0xff
      pos += 1
      v
    }
    def u16le(): Int = u8() | (u8() << 8)
    def u32le(): Long =
      (u16le() & 0xffffL) | ((u16le() & 0xffffL) << 16)

    def skip(n: Long): Unit = {
      var left = n
      while (left > 0) {
        if (pos >= regionEnd) advanceRegion()
        val take = math.min(left, (regionEnd - pos).toLong).toInt
        pos += take
        left -= take
      }
    }

    /** Read cch characters honoring per-region fHighByte re-flags. */
    def chars(cch: Int, firstFlags: Int): String = {
      val sb = new java.lang.StringBuilder(cch)
      var high = (firstFlags & 1) != 0
      var left = cch
      while (left > 0) {
        if (pos >= regionEnd) {
          advanceRegion()
          // continuation inside character data: a fresh flags byte
          high = (u8() & 1) != 0
        }
        if (high) {
          val lo = u8(); val hi = u8()
          sb.append(((hi << 8) | lo).toChar)
        } else {
          // "compressed": the low bytes of UTF-16, i.e. latin-1
          sb.append((u8() & 0xff).toChar)
        }
        left -= 1
      }
      sb.toString
    }
  }

  def extract(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[Rejected, Extracted] =
    Cfb.parse(blob, maxOut) match {
      case Left(reason) => Left(Rejected(s"cfb_$reason"))
      case Right(parsed) => extractFromCfb(parsed)
    }

  def extractFromCfb(parsed: Cfb.Parsed): Either[Rejected, Extracted] =
    try {
      val wb = parsed.streams.get("Workbook")
        .orElse(parsed.streams.get("Book"))
        .getOrElse(bail("missing_workbook"))

      var biffVersion = 0
      val sheetNames = Seq.newBuilder[String]
      var nStrings = 0L
      val sst = Seq.newBuilder[String]
      var nLabel = 0L
      var nNumber = 0L
      var numericSum = 0.0

      var p = 0
      var depth = 0 // BOF/EOF substream nesting
      var sawGlobals = false
      while (p + 4 <= wb.length) {
        val typ = u16(wb, p)
        val len = u16(wb, p + 2)
        if (len > 8224) bail("record_too_long")
        val body = p + 4
        if (body + len > wb.length) bail("truncated_record")
        typ match {
          case RecBof =>
            val ver = u16(wb, body)
            val dt = u16(wb, body + 2)
            // only the FIRST substream must be the workbook globals;
            // sheet/chart substreams follow at the same nesting level
            if (!sawGlobals) {
              if (ver != 0x0600) bail(f"biff_version_unsupported_0x$ver%04x")
              if (dt != 0x0005) bail("not_workbook_globals")
              biffVersion = 8
              sawGlobals = true
            }
            depth += 1
          case RecEof =>
            if (depth == 0) bail("eof_without_bof")
            depth -= 1
          case RecFilePass => bail("xls_encrypted")
          case RecBoundSheet =>
            // lbPlyPos(4) grbit(2) then ShortXLUnicodeString
            if (len < 8) bail("truncated_record")
            val cch = wb(body + 6) & 0xff
            val flags = wb(body + 7) & 0xff
            val nameBytes = if ((flags & 1) != 0) 2 * cch else cch
            if (8 + nameBytes > len) bail("truncated_record")
            val name =
              if ((flags & 1) != 0)
                new String(wb, body + 8, 2 * cch, "UTF-16LE")
              else {
                val sb = new java.lang.StringBuilder(cch)
                var k = 0
                while (k < cch) {
                  sb.append(((wb(body + 8 + k) & 0xff)).toChar); k += 1
                }
                sb.toString
              }
            sheetNames += name
          case RecSst =>
            val cur = new SstCursor(wb, body, len)
            cur.skip(4) // cstTotal
            val unique = cur.u32le()
            if (unique < 0 || unique > (1L << 22)) bail("sst_count_implausible")
            nStrings = unique
            var k = 0L
            while (k < unique) {
              val cch = cur.u16le()
              val flags = cur.u8()
              if ((flags & 0xF2) != 0) bail("sst_flags_reserved")
              val cRun = if ((flags & 8) != 0) cur.u16le() else 0
              val cbExt = if ((flags & 4) != 0) cur.u32le() else 0L
              if (cbExt < 0) bail("sst_truncated")
              sst += cur.chars(cch, flags)
              cur.skip(4L * cRun)
              cur.skip(cbExt)
              k += 1
            }
          case RecLabelSst =>
            if (len < 10) bail("truncated_record")
            nLabel += 1
            val isst = u32(wb, body + 6)
            if (isst >= nStrings) bail("sst_index_out_of_range")
          case RecNumber =>
            // rw(2) col(2) ixfe(2) num(8): anything shorter is a lie —
            // the direct indexing below must never run past the record
            if (len < 14) bail("truncated_record")
            nNumber += 1
            var bits = 0L
            var k = 0
            while (k < 8) {
              bits |= (wb(body + 6 + k) & 0xffL) << (8 * k); k += 1
            }
            numericSum += java.lang.Double.longBitsToDouble(bits)
          case RecRk =>
            if (len < 10) bail("truncated_record")
            nNumber += 1
            numericSum += rkValue(u32(wb, body + 6))
          case RecMulRk =>
            // rw(2) colFirst(2) [ixfe(2) rk(4)]* colLast(2)
            val nCells = (len - 6) / 6
            var k = 0
            while (k < nCells) {
              nNumber += 1
              numericSum += rkValue(u32(wb, body + 4 + 6 * k + 2))
              k += 1
            }
          case _ => () // formats, styles, dimensions: opaque
        }
        p = body + len
      }
      if (!sawGlobals) bail("missing_bof")
      if (depth != 0) bail("unbalanced_substreams")
      val strings = sst.result()
      Right(Extracted(biffVersion, sheetNames.result(), nStrings,
        strings.mkString("\n"), nLabel, nNumber, numericSum))
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  /** RK number decode: bit0 = ÷100, bit1 = "is int30" else the top 30
    * bits of an IEEE double. */
  private def rkValue(rk: Long): Double = {
    val base =
      if ((rk & 2) != 0) (rk.toInt >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if ((rk & 1) != 0) base / 100.0 else base
  }

  // ==================================================================
  // Fixture writer
  // ==================================================================

  private def rec(typ: Int, body: Array[Byte]): Array[Byte] = {
    require(body.length <= 8224)
    Array[Byte](typ.toByte, (typ >> 8).toByte,
      body.length.toByte, (body.length >> 8).toByte) ++ body
  }
  private def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
  private def le32(v: Long) = Array[Byte](v.toByte, (v >> 8).toByte,
    (v >> 16).toByte, (v >> 24).toByte)

  /** Write a BIFF8 workbook inside a real CFB: `sheets` names (each
    * with `labelCells(i)` LabelSst cells pointing at SST slots in
    * round-robin and the given Number cells), an SST holding
    * `strings` — the FIRST string split across a Continue record
    * mid-characters with an fHighByte flip when `splitSst` and the
    * string is long enough. */
  def write(sheets: Seq[String], strings: Seq[String],
      numbers: Seq[Double], labelsPerSheet: Int,
      splitSst: Boolean = true): Array[Byte] = {
    // ---- SST (+ optional Continue) -----------------------------------
    val sstHead = le32(strings.length.toLong * 2) ++ // cstTotal
      le32(strings.length.toLong)
    val sstParts = Seq.newBuilder[Array[Byte]] // (sst body, continues...)
    val first = new java.io.ByteArrayOutputStream()
    first.write(sstHead, 0, sstHead.length)
    var continued: Array[Byte] = null
    strings.zipWithIndex.foreach { case (s0, idx) =>
      val ascii = s0.forall(c => c < 0x100)
      val flags = if (ascii) 0 else 1
      val chars =
        if (ascii) s0.map(_.toByte).toArray
        else s0.getBytes("UTF-16LE")
      val head = le16(s0.length) :+ flags.toByte
      if (idx == 0 && splitSst && s0.length >= 8 && continued == null) {
        // split after 3 chars; the continuation re-declares the flag
        // FLIPPED where possible (ascii tail continues as UTF-16)
        val cut = 3
        val headBytes = if (ascii) cut else 2 * cut
        first.write(head, 0, head.length)
        first.write(chars, 0, headBytes)
        val tail = s0.substring(cut)
        continued = Array[Byte](1) ++ tail.getBytes("UTF-16LE")
      } else if (continued != null) {
        val b = head ++ chars
        continued = continued ++ b
      } else {
        first.write(head, 0, head.length)
        first.write(chars, 0, chars.length)
      }
    }
    sstParts += rec(RecSst, first.toByteArray)
    if (continued != null) sstParts += rec(RecContinue, continued)

    // ---- sheet substreams --------------------------------------------
    val sheetBlobs = sheets.zipWithIndex.map { case (_, si) =>
      val cells = new java.io.ByteArrayOutputStream()
      var k = 0
      while (k < labelsPerSheet) {
        val isst = (si * labelsPerSheet + k) % math.max(1, strings.length)
        val b = rec(RecLabelSst,
          le16(k) ++ le16(0) ++ le16(15) ++ le32(isst.toLong))
        cells.write(b, 0, b.length)
        k += 1
      }
      numbers.zipWithIndex.foreach { case (v, ni) =>
        val bits = java.lang.Double.doubleToLongBits(v)
        val b = rec(RecNumber, le16(ni) ++ le16(1) ++ le16(15) ++
          le32(bits & 0xFFFFFFFFL) ++ le32(bits >>> 32))
        cells.write(b, 0, b.length)
      }
      // one RK int cell per sheet: value = 42 + si (int30, no div)
      val rkb = rec(RecRk, le16(99) ++ le16(2) ++ le16(15) ++
        le32(((42L + si) << 2) | 2))
      cells.write(rkb, 0, rkb.length)
      rec(RecBof, le16(0x0600) ++ le16(0x0010) ++ le32(0) ++ le32(0) ++
        le32(0)) ++ cells.toByteArray ++ rec(RecEof, Array.emptyByteArray)
    }

    // ---- globals + assembly (BoundSheet lbPlyPos patched) ------------
    val bofG = rec(RecBof, le16(0x0600) ++ le16(0x0005) ++ le32(0) ++
      le32(0) ++ le32(0))
    val boundSheets = sheets.map { name =>
      val ascii = name.forall(_ < 0x100)
      val nameBytes =
        if (ascii) name.map(_.toByte).toArray else name.getBytes("UTF-16LE")
      rec(RecBoundSheet, le32(0) ++ le16(0) ++
        Array[Byte](name.length.toByte, if (ascii) 0 else 1) ++ nameBytes)
    }
    val sstBytes = sstParts.result().foldLeft(Array.emptyByteArray)(_ ++ _)
    val globals = bofG ++
      boundSheets.foldLeft(Array.emptyByteArray)(_ ++ _) ++
      sstBytes ++ rec(RecEof, Array.emptyByteArray)
    // patch lbPlyPos: sheet i starts after globals + preceding sheets
    var off = globals.length
    var cursor = bofG.length
    val patched = globals.clone()
    sheets.indices.foreach { i =>
      val pos = cursor + 4 // record body
      patched(pos) = off.toByte
      patched(pos + 1) = (off >> 8).toByte
      patched(pos + 2) = (off >> 16).toByte
      patched(pos + 3) = (off >> 24).toByte
      cursor += 4 + (u16(globals, cursor + 2))
      off += sheetBlobs(i).length
    }
    val workbook = patched ++
      sheetBlobs.foldLeft(Array.emptyByteArray)(_ ++ _)
    Cfb.write(Seq("Workbook" -> workbook,
      "SummaryInformation" -> Array.fill[Byte](48)(0x11)))
  }
}
