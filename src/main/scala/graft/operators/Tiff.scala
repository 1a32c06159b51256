package graft.operators

/** Baseline TIFF: uncompressed 8-bit grayscale, strip-organized, both
  * byte orders — the scanned-document / scientific-imaging format a
  * crawl pipeline meets after PNG/JPEG/GIF/BMP. TIFF is the one image
  * container whose GEOMETRY lives in a tag dictionary rather than a
  * fixed header: width, height, and the strip layout are all IFD
  * entries, and the pixel data is scattered across strips addressed by
  * two parallel tag ARRAYS (offsets + byte counts) that may themselves
  * live inline or out-of-line. That indirection is the whole parsing
  * surface — and the whole attack surface, so every strip offset and
  * byte count is bounds-checked against the file before any read.
  *
  * Contract (reject-don't-guess, like every codec here): compression 1
  * (none), 8 bits per sample, one sample per pixel, photometric 1
  * (BlackIsZero), ascending tags, strip byte counts that EXACTLY cover
  * rows-per-strip × width (a short or long strip is corruption, not
  * padding), dims within the 64M-pixel allocation cap. Anything else —
  * LZW/PackBits compression, planar color, tiles — returns None.
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

  /** Encode a grayscale plane as strip-organized TIFF. `rowsPerStrip`
    * below `h` forces the multi-strip walk the decoder must get right;
    * the strip offset/count arrays go out-of-line whenever they outgrow
    * the 4-byte inline value field, exercising both placements. */
  def encodeGray(w: Int, h: Int, px: Array[Byte], rowsPerStrip: Int,
      littleEndian: Boolean): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h, s"need $w*$h pixels")
    require(rowsPerStrip >= 1, "rowsPerStrip >= 1")
    val nStrips = (h + rowsPerStrip - 1) / rowsPerStrip
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (littleEndian) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Int): Unit =
      if (littleEndian) { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
      else { u16((v >>> 16) & 0xffff); u16(v & 0xffff) }
    // layout: header(8), IFD (2 + 9*12 + 4), then [strip arrays], strips
    val ifdAt = 8
    val nEntries = 9
    val afterIfd = ifdAt + 2 + nEntries * 12 + 4
    val arraysInline = nStrips == 1 // one LONG fits the value field
    val offArrayAt = afterIfd
    val cntArrayAt = afterIfd + (if (arraysInline) 0 else 4 * nStrips)
    val stripsAt =
      if (arraysInline) afterIfd else cntArrayAt + 4 * nStrips
    def stripRows(s: Int): Int =
      math.min(rowsPerStrip, h - s * rowsPerStrip)
    def stripOffset(s: Int): Int =
      stripsAt + (0 until s).map(stripRows(_) * w).sum
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
    entry(TagCompression, 3, 1, 1)
    entry(TagPhotometric, 3, 1, 1)
    entry(TagStripOffsets, 4, nStrips,
      if (arraysInline) stripOffset(0) else offArrayAt)
    entry(TagSamplesPerPixel, 3, 1, 1)
    entry(TagRowsPerStrip, 3, 1, rowsPerStrip)
    entry(TagStripByteCounts, 4, nStrips,
      if (arraysInline) stripRows(0) * w else cntArrayAt)
    u32(0) // no next IFD
    if (!arraysInline) {
      (0 until nStrips).foreach(s => u32(stripOffset(s)))
      (0 until nStrips).foreach(s => u32(stripRows(s) * w))
    }
    (0 until nStrips).foreach { s =>
      out.write(px, s * rowsPerStrip * w, stripRows(s) * w)
    }
    out.toByteArray
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
        case TagStripOffsets =>
          offType = tpe; offCount = n.toInt
          offA =
            if (n == 1) { if (tpe == 3) u16(at + 8).toLong else u32(at + 8) }
            else u32(at + 8)
        case TagStripByteCounts =>
          cntType = tpe; cntCount = n.toInt
          cntA =
            if (n == 1) { if (tpe == 3) u16(at + 8).toLong else u32(at + 8) }
            else u32(at + 8)
        case _ => () // unrecognized tags pass through
      }
      e += 1
    }
    if (w < 1 || h < 1 || w * h > (1L << 26)) return None
    if (bits != 8 || compression != 1 || photometric != 1 || spp != 1)
      return None
    if (rowsPerStrip < 1 || offCount < 1 || cntCount != offCount) return None
    val nStrips = ((h + rowsPerStrip - 1) / rowsPerStrip).toInt
    if (offCount != nStrips) return None
    // strip array element s (SHORT or LONG, inline single or out-of-line)
    def arrayElem(base: Long, tpe: Int, nElems: Int, s: Int,
        inlineVal: Long): Long = {
      if (nElems == 1) inlineVal
      else if (tpe == 3) u16(base + 2L * s).toLong
      else u32(base + 4L * s)
    }
    if (offCount > 1 && (offType != 3 && offType != 4)) return None
    if (cntCount > 1 && (cntType != 3 && cntType != 4)) return None
    val out = new Array[Byte]((w * h).toInt)
    var s = 0
    while (s < nStrips) {
      val rows = math.min(rowsPerStrip, h - s * rowsPerStrip).toInt
      val off = arrayElem(offA, offType, offCount, s, offA)
      val len = arrayElem(cntA, cntType, cntCount, s, cntA)
      // byte count must EXACTLY cover this strip's rows
      if (len != rows.toLong * w) return None
      if (off < 0 || off + len > p.length) return None
      System.arraycopy(p, off.toInt, out,
        (s * rowsPerStrip * w).toInt, len.toInt)
      s += 1
    }
    Some((w.toInt, h.toInt, out))
  }
}
