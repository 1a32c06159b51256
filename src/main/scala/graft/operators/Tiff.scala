package graft.operators

/** TIFF: 8-bit grayscale, strip-organized, both byte orders — the
  * scanned-document / scientific-imaging format a crawl pipeline meets
  * after PNG/JPEG/GIF/BMP. TIFF is the one image container whose
  * GEOMETRY lives in a tag dictionary rather than a fixed header:
  * width, height, and the strip layout are all IFD entries, and the
  * pixel data is scattered across strips addressed by two parallel tag
  * ARRAYS (offsets + byte counts) that may themselves live inline or
  * out-of-line. That indirection is the whole parsing surface — and
  * the whole attack surface, so every strip offset and byte count is
  * bounds-checked against the file before any read.
  *
  * Compressions (TIFF 6.0 §7/§9 + the Adobe deflate note), each strip
  * decompressed independently and required to yield EXACTLY its rows:
  *   - 1 none (byte count must equal rows × width exactly);
  *   - 5 LZW — the TIFF variant: codes packed MSB-FIRST (GIF's
  *     twin in [[Gif]] is LSB-first) with the "early change": the code
  *     width bumps one code EARLIER than the table arithmetic needs
  *     (at table size 2^w - 1), the historical off-by-one every
  *     decoder must reproduce bit-for-bit;
  *   - 8 Adobe deflate (zlib-wrapped, JDK Inflater);
  *   - 32773 PackBits (run-length, rows packed separately).
  * Predictor 2 (horizontal differencing, tag 0x13D) undone after
  * decompression; predictor 1 is identity.
  *
  * Contract (reject-don't-guess, like every codec here): 8 bits per
  * sample, one sample per pixel, photometric 1 (BlackIsZero),
  * ascending tags, strips that decode to exactly rows-per-strip ×
  * width (a short or long strip is corruption, not padding), dims
  * within the 64M-pixel allocation cap. Anything else — planar color,
  * tiles, JPEG-in-TIFF, fax codings — returns None.
  */
object Tiff {

  private final val TagWidth = 0x0100
  private final val TagHeight = 0x0101
  private final val TagBits = 0x0102
  private final val TagCompression = 0x0103
  private final val TagPhotometric = 0x0106
  private final val TagStripOffsets = 0x0111
  private final val TagSamplesPerPixel = 0x0115
  private final val TagRowsPerStrip = 0x0116
  private final val TagStripByteCounts = 0x0117
  private final val TagPredictor = 0x013D

  /** Encode a grayscale plane as strip-organized TIFF. `rowsPerStrip`
    * below `h` forces the multi-strip walk the decoder must get right;
    * the strip offset/count arrays go out-of-line whenever they outgrow
    * the 4-byte inline value field, exercising both placements.
    * `compression` ∈ {1, 5, 8, 32773}; `predictor` 2 applies
    * horizontal differencing per row before the compressor (only
    * meaningful with a compressor, per the spec's intent). */
  def encodeGray(w: Int, h: Int, px: Array[Byte], rowsPerStrip: Int,
      littleEndian: Boolean, compression: Int = 1,
      predictor: Int = 1): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h, s"need $w*$h pixels")
    require(rowsPerStrip >= 1, "rowsPerStrip >= 1")
    require(Set(1, 5, 8, 32773).contains(compression), "compression")
    require(predictor == 1 || predictor == 2, "predictor")
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    def stripRows(s: Int): Int =
      math.min(rowsPerStrip, h - s * rowsPerStrip)
    // per-strip payloads: predictor first, then the compressor
    val payloads: IndexedSeq[Array[Byte]] = (0 until nStrips).map { s =>
      val rows = stripRows(s)
      val raw = java.util.Arrays.copyOfRange(px,
        s * rowsPerStrip * w, s * rowsPerStrip * w + rows * w)
      if (predictor == 2) {
        var r = 0
        while (r < rows) {
          var x = w - 1
          while (x >= 1) {
            raw(r * w + x) = (raw(r * w + x) - raw(r * w + x - 1)).toByte
            x -= 1
          }
          r += 1
        }
      }
      compression match {
        case 1 => raw
        case 5 => lzwEncode(raw)
        case 8 => zlibDeflate(raw)
        case 32773 => packBitsEncode(raw, w)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Int): Unit =
      if (littleEndian) { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
      else { u16((v >>> 16) & 0xffff); u16(v & 0xffff) }
    // layout: header(8), IFD (2 + n*12 + 4), then [strip arrays], strips
    val ifdAt = 8
    val nEntries = if (predictor == 2) 10 else 9
    val afterIfd = ifdAt + 2 + nEntries * 12 + 4
    val arraysInline = nStrips == 1 // one LONG fits the value field
    val offArrayAt = afterIfd
    val cntArrayAt = afterIfd + (if (arraysInline) 0 else 4 * nStrips)
    val stripsAt =
      if (arraysInline) afterIfd else cntArrayAt + 4 * nStrips
    def stripOffset(s: Int): Int =
      stripsAt + (0 until s).map(payloads(_).length).sum
    out.write(if (littleEndian) 'I' else 'M')
    out.write(if (littleEndian) 'I' else 'M')
    u16(42); u32(ifdAt)
    u16(nEntries)
    def entry(tag: Int, tpe: Int, count: Int, value: Int): Unit = {
      u16(tag); u16(tpe); u32(count)
      if (tpe == 3 && count == 1) { u16(value); u16(0) } // SHORT inline
      else u32(value)
    }
    entry(TagWidth, 3, 1, w)
    entry(TagHeight, 3, 1, h)
    entry(TagBits, 3, 1, 8)
    entry(TagCompression, 3, 1, compression)
    entry(TagPhotometric, 3, 1, 1)
    entry(TagStripOffsets, 4, nStrips,
      if (arraysInline) stripOffset(0) else offArrayAt)
    entry(TagSamplesPerPixel, 3, 1, 1)
    entry(TagRowsPerStrip, 3, 1, rowsPerStrip)
    entry(TagStripByteCounts, 4, nStrips,
      if (arraysInline) payloads(0).length else cntArrayAt)
    if (predictor == 2) entry(TagPredictor, 3, 1, 2)
    u32(0) // no next IFD
    if (!arraysInline) {
      (0 until nStrips).foreach(s => u32(stripOffset(s)))
      (0 until nStrips).foreach(s => u32(payloads(s).length))
    }
    payloads.foreach(out.write)
    out.toByteArray
  }

  // ---- strip codecs ----

  private def zlibDeflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Inflate exactly `expected` bytes of zlib stream; reject short,
    * long, or corrupt data. */
  private def zlibInflate(p: Array[Byte], off: Int, len: Int,
      expected: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(p, off, len)
      val out = new Array[Byte](expected)
      var n = 0
      while (!inf.finished()) {
        val got = inf.inflate(out, n, expected - n)
        if (got == 0) {
          if (inf.needsInput() || inf.needsDictionary()) return None
        }
        n += got
        if (n == expected && !inf.finished()) {
          // the stream must END here — more data means a long strip
          if (inf.inflate(new Array[Byte](1)) > 0) return None
          if (!inf.finished()) return None
        }
      }
      if (n == expected) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** PackBits (TIFF 6.0 §9): rows are packed SEPARATELY per spec —
    * each row starts a fresh packet. */
  private def packBitsEncode(data: Array[Byte], rowBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var rowStart = 0
    while (rowStart < data.length) {
      val rowEnd = math.min(rowStart + rowBytes, data.length)
      var i = rowStart
      while (i < rowEnd) {
        // find run length at i
        var run = 1
        while (i + run < rowEnd && run < 128 && data(i + run) == data(i))
          run += 1
        if (run >= 2) {
          out.write(1 - run) // -(run-1)
          out.write(data(i))
          i += run
        } else {
          // literal stretch: until a run of >= 3 starts (2-byte runs
          // inside literals cost nothing to keep literal)
          var j = i + 1
          var lit = 1
          var break = false
          while (!break && j < rowEnd && lit < 128) {
            var r = 1
            while (j + r < rowEnd && r < 3 && data(j + r) == data(j)) r += 1
            if (r >= 3) break = true
            else { j += 1; lit += 1 }
          }
          out.write(lit - 1)
          out.write(data, i, lit)
          i += lit
        }
      }
      rowStart = rowEnd
    }
    out.toByteArray
  }

  /** Unpack exactly `expected` bytes; -128 noops tolerated, anything
    * else off-grammar (short input, overlong output) rejects. */
  private def packBitsDecode(p: Array[Byte], off: Int, len: Int,
      expected: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expected)
    var n = 0
    var i = off
    val end = off + len
    while (n < expected) {
      if (i >= end) return None
      val c = p(i); i += 1
      if (c == -128) () // noop
      else if (c >= 0) {
        val cnt = c + 1
        if (i + cnt > end || n + cnt > expected) return None
        System.arraycopy(p, i, out, n, cnt)
        i += cnt; n += cnt
      } else {
        val cnt = 1 - c
        if (i >= end || n + cnt > expected) return None
        java.util.Arrays.fill(out, n, n + cnt, p(i))
        i += 1; n += cnt
      }
    }
    // trailing bytes after the last packet: only -128 noops are padding
    while (i < end) { if (p(i) != -128) return None; i += 1 }
    Some(out)
  }

  private final val LzwClear = 256
  private final val LzwEoi = 257

  /** TIFF LZW encode: MSB-first bit packing, EARLY-CHANGE widths.
    * The code width follows the DECODER's view of the dictionary (the
    * [[Gif]] encoder's `dNext` pattern: the decoder grows its table
    * one entry per data code after the first and cannot know about
    * the encoder's in-flight entry) with the TIFF twist that the bump
    * fires one entry EARLIER than GIF — when the decoder's next free
    * code reaches 2^w - 1, not 2^w (TIFF 6.0 §13: "the code size
    * changes as soon as code 511/1023/2047 would be added"). Clear is
    * emitted when the encoder's own table hits 4094, libtiff's
    * CODE_MAX-1 behavior. */
  private[operators] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    var dNext = 258 // the DECODER's next free code, replicated
    var firstSinceClear = true
    def emit(code: Int, isData: Boolean): Unit = {
      if (dNext == (1 << width) - 1 && width < 12) width += 1
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
      if (isData) {
        if (!firstSinceClear && dNext < 4096) dNext += 1
        firstSinceClear = false
      }
    }
    // dictionary: map (prefixCode << 8 | byte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var dictNext = 258
    emit(LzwClear, isData = false)
    var i = 0
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      i = 1
      while (i < data.length) {
        val b = data(i) & 0xff
        val key = Integer.valueOf((cur << 8) | b)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur, isData = true)
          dict.put(key, Integer.valueOf(dictNext))
          dictNext += 1
          if (dictNext == 4094) { // libtiff clears at CODE_MAX-1
            emit(LzwClear, isData = false)
            dict = new java.util.HashMap()
            dictNext = 258
            dNext = 258
            width = 9
            firstSinceClear = true
          }
          cur = b
        }
        i += 1
      }
      emit(cur, isData = true)
    }
    emit(LzwEoi, isData = false)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** TIFF LZW decode to exactly `expected` bytes. */
  private[operators] def lzwDecode(p: Array[Byte], off: Int, len: Int,
      expected: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](expected)
    var n = 0
    // table as prefix/suffix arrays; entries < 256 are literals
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val elen = new Array[Int](4096)
    var j = 0
    while (j < 256) { prefix(j) = -1; suffix(j) = j.toByte; elen(j) = 1; j += 1 }
    var nextCode = 258
    var width = 9
    var bitBuf = 0L
    var bitCnt = 0
    var i = off
    val end = off + len
    // EARLY CHANGE, before every read: the width grows when the next
    // free code reaches 2^w - 1 — one entry earlier than the table
    // arithmetic needs, and one earlier than GIF's 2^w (TIFF 6.0 §13,
    // pinned against libtiff-written streams in TiffInteropSpec)
    def read(): Int = {
      if (nextCode == (1 << width) - 1 && width < 12) width += 1
      while (bitCnt < width) {
        if (i >= end) return -1
        bitBuf = (bitBuf << 8) | (p(i) & 0xff)
        bitCnt += 8
        i += 1
      }
      val v = ((bitBuf >>> (bitCnt - width)) & ((1 << width) - 1)).toInt
      bitCnt -= width
      v
    }
    def writeEntry(code: Int): Boolean = {
      val l = elen(code)
      if (n + l > expected) return false
      var k = n + l - 1
      var c = code
      while (c >= 0) { out(k) = suffix(c); k -= 1; c = prefix(c) }
      n += l
      true
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None // ran out of bits before EOI
      else if (code == LzwEoi) done = true
      else if (code == LzwClear) {
        nextCode = 258; width = 9; prev = -1
      } else if (prev == -1) {
        if (code > 255) return None // first code after clear: literal
        if (!writeEntry(code)) return None
        prev = code
      } else {
        if (code > nextCode || code == 256 || code == 257) return None
        if (code == nextCode) {
          // KwKwK: new entry = prev + first byte of prev
          if (nextCode >= 4096) return None
          prefix(nextCode) = prev
          var c = prev
          while (prefix(c) >= 0) c = prefix(c)
          suffix(nextCode) = suffix(c)
          elen(nextCode) = elen(prev) + 1
          nextCode += 1
          if (!writeEntry(code)) return None
        } else {
          if (!writeEntry(code)) return None
          if (nextCode >= 4096) return None
          // new entry = prev's sequence + FIRST byte of code's sequence
          prefix(nextCode) = prev
          var c = code
          while (prefix(c) >= 0) c = prefix(c)
          suffix(nextCode) = suffix(c)
          elen(nextCode) = elen(prev) + 1
          nextCode += 1
        }
        prev = code
      }
      if (done && n != expected) return None
      if (n == expected && !done) {
        // next symbol must be EOI (a strict short-strip check)
        val tail = read()
        if (tail != LzwEoi) return None
        done = true
      }
    }
    if (n == expected) Some(out) else None
  }

  /** Decode a contract-conforming TIFF to (w, h, row-major pixels). */
  def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p.length < 8) return None
    val b0 = p(0) & 0xff; val b1 = p(1) & 0xff
    val little =
      if (b0 == 'I' && b1 == 'I') true
      else if (b0 == 'M' && b1 == 'M') false
      else return None
    def u16(off: Long): Int = {
      if (off < 0 || off + 2 > p.length) return -1
      val a = p(off.toInt) & 0xff; val b = p(off.toInt + 1) & 0xff
      if (little) a | (b << 8) else (a << 8) | b
    }
    def u32(off: Long): Long = {
      if (off < 0 || off + 4 > p.length) return -1
      val lo = u16(if (little) off else off + 2).toLong
      val hi = u16(if (little) off + 2 else off).toLong
      lo | (hi << 16)
    }
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 0 || ifd + 2 > p.length) return None
    val count = u16(ifd)
    if (count <= 0 || ifd + 2 + 12L * count + 4 > p.length) return None
    var w = -1L; var h = -1L; var rowsPerStrip = -1L
    var bits = 8L; var compression = 1L; var photometric = 1L; var spp = 1L
    var predictor = 1L
    var offA = -1L; var offCount = -1; var offType = -1
    var cntA = -1L; var cntCount = -1; var cntType = -1
    var prevTag = -1
    var e = 0
    while (e < count) {
      val at = ifd + 2 + 12 * e
      val tag = u16(at)
      if (tag <= prevTag) return None // ascending per TIFF spec
      prevTag = tag
      val tpe = u16(at + 2)
      val n = u32(at + 4)
      // scalar SHORT/LONG value, inline by construction when n == 1
      def scalar(): Long =
        if (n != 1) -1
        else if (tpe == 3) u16(at + 8).toLong
        else if (tpe == 4) u32(at + 8)
        else -1
      tag match {
        case TagWidth => w = scalar()
        case TagHeight => h = scalar()
        case TagBits => bits = scalar()
        case TagCompression => compression = scalar()
        case TagPhotometric => photometric = scalar()
        case TagSamplesPerPixel => spp = scalar()
        case TagRowsPerStrip => rowsPerStrip = scalar()
        case TagPredictor => predictor = scalar()
        case TagStripOffsets =>
          // store the VALUE FIELD position; whether the array lives
          // inline (typeSize * count <= 4, e.g. two SHORTs) or
          // out-of-line is resolved per element below
          offType = tpe; offCount = n.toInt; offA = at + 8
        case TagStripByteCounts =>
          cntType = tpe; cntCount = n.toInt; cntA = at + 8
        case _ => () // unrecognized tags pass through
      }
      e += 1
    }
    if (w < 1 || h < 1 || w * h > (1L << 26)) return None
    if (bits != 8 || photometric != 1 || spp != 1) return None
    if (compression != 1 && compression != 5 && compression != 8 &&
      compression != 32773) return None
    if (predictor != 1 && predictor != 2) return None
    if (rowsPerStrip < 1 || offCount < 1 || cntCount != offCount) return None
    val nStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
    if (offCount != nStrips) return None
    // strip array element s. TIFF stores the array IN the 4-byte value
    // field whenever it fits (one LONG, one or two SHORTs — libtiff
    // really writes two-strip SHORT arrays inline); otherwise the
    // value field holds the array's offset.
    def arrayElem(valueFieldAt: Long, tpe: Int, nElems: Int, s: Int): Long = {
      val elemSize = if (tpe == 3) 2 else 4
      val base =
        if (elemSize * nElems <= 4) valueFieldAt else u32(valueFieldAt)
      if (tpe == 3) u16(base + 2L * s).toLong else u32(base + 4L * s)
    }
    if (offCount > 1 && (offType != 3 && offType != 4)) return None
    if (cntCount > 1 && (cntType != 3 && cntType != 4)) return None
    val out = new Array[Byte]((w * h).toInt)
    var s = 0
    while (s < nStrips) {
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip).toInt
      val off = arrayElem(offA, offType, offCount, s)
      val len = arrayElem(cntA, cntType, cntCount, s)
      val expected = rows * w.toInt
      if (off < 0 || len < 0 || off + len > p.length) return None
      val dst = (s * rowsPerStrip * w).toInt
      compression match {
        case 1 =>
          // byte count must EXACTLY cover this strip's rows
          if (len != expected.toLong) return None
          System.arraycopy(p, off.toInt, out, dst, expected)
        case c =>
          val decoded = (c: @unchecked) match {
            case 5L => lzwDecode(p, off.toInt, len.toInt, expected)
            case 8L => zlibInflate(p, off.toInt, len.toInt, expected)
            case 32773L => packBitsDecode(p, off.toInt, len.toInt, expected)
          }
          decoded match {
            case None => return None
            case Some(d) => System.arraycopy(d, 0, out, dst, expected)
          }
      }
      if (predictor == 2) {
        // undo horizontal differencing per ROW of this strip
        var r = 0
        while (r < rows) {
          var x = 1
          while (x < w) {
            out(dst + r * w.toInt + x) =
              (out(dst + r * w.toInt + x) + out(dst + r * w.toInt + x - 1)).toByte
            x += 1
          }
          r += 1
        }
      }
      s += 1
    }
    Some((w.toInt, h.toInt, out))
  }
}
