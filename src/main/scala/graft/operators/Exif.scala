package graft.operators

/** EXIF metadata extraction from JPEG APP1 segments — the metadata a
  * crawl pipeline reads WITHOUT paying a pixel decode: orientation (the
  * tag that decides whether a thumbnail pipeline must rotate), camera
  * make, and capture time. EXIF is a TIFF structure embedded in the
  * APP1 payload, in EITHER byte order (the "II"/"MM" mark is part of
  * the data, not a convention), so both endians are first-class here
  * and the fixture alternates them.
  *
  * Same reject-don't-guess contract as the codecs: a malformed TIFF —
  * wrong byte-order mark, bad magic, an IFD or value offset escaping
  * the segment, an ASCII value without its NUL terminator, an
  * orientation outside 1..8 — yields None, never a half-parsed row.
  * Offsets are TIFF-header-relative and every dereference is
  * bounds-checked against the SEGMENT, not the file: an APP1 length
  * that lies cannot make the reader walk into entropy-coded data.
  */
object Exif {

  final case class ExifMeta(orientation: Int, make: String, datetime: String)

  private val ExifHeader = Array[Byte]('E', 'x', 'i', 'f', 0, 0)

  private final val TagMake = 0x010f
  private final val TagOrientation = 0x0112
  private final val TagDateTime = 0x0132

  /** Build an APP1 Exif segment (marker + length included) holding IFD0
    * with Make/Orientation/DateTime, in the requested byte order. Tags
    * are written ascending (TIFF §2 requires it; the parser enforces
    * it), the SHORT value is left-justified inline, and ASCII values
    * live in the data area after the IFD with their NUL terminators. */
  def app1Exif(orientation: Int, make: String, datetime: String,
      littleEndian: Boolean): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"orientation $orientation")
    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val dtB = (datetime + "\u0000").getBytes("US-ASCII")
    // TIFF layout: header(8) + count(2) + 3 entries(36) + next(4) = 50,
    // then the data area
    val makeOff = 50
    val dtOff = makeOff + makeB.length
    val tiff = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit =
      if (littleEndian) { tiff.write(v & 0xff); tiff.write((v >> 8) & 0xff) }
      else { tiff.write((v >> 8) & 0xff); tiff.write(v & 0xff) }
    def u32(v: Int): Unit =
      if (littleEndian) { u16(v & 0xffff); u16((v >> 16) & 0xffff) }
      else { u16((v >> 16) & 0xffff); u16(v & 0xffff) }
    tiff.write(if (littleEndian) 'I' else 'M')
    tiff.write(if (littleEndian) 'I' else 'M')
    u16(42)
    u32(8) // IFD0 right after the header
    u16(3) // entry count
    // entries ascending by tag: Make (0x010F) < Orientation (0x0112) <
    // DateTime (0x0132)
    u16(TagMake); u16(2); u32(makeB.length); u32(makeOff)
    u16(TagOrientation); u16(3); u32(1)
    // SHORT inline: left-justified in the 4-byte value field
    u16(orientation); u16(0)
    u16(TagDateTime); u16(2); u32(dtB.length); u32(dtOff)
    u32(0) // no next IFD
    tiff.write(makeB)
    tiff.write(dtB)
    val body = ExifHeader ++ tiff.toByteArray
    val len = body.length + 2
    Array[Byte](0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++ body
  }

  /** Insert an APP1 segment right after SOI in an existing JPEG. */
  def withApp1(jpeg: Array[Byte], app1: Array[Byte]): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
    jpeg.take(2) ++ app1 ++ jpeg.drop(2)
  }

  /** Extract EXIF Make/Orientation/DateTime from a JPEG's APP1 segment.
    * None when there is no Exif APP1 before SOS or the TIFF inside it is
    * malformed in any way. */
  def exifFromJpeg(p: Array[Byte]): Option[ExifMeta] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8)
      return None
    var i = 2
    while (i + 4 <= p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      val m = p(i + 1) & 0xff
      if (m == 0xda || m == 0xd9) return None // SOS/EOI: no EXIF found
      val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > p.length) return None
      if (m == 0xe1 && len - 2 >= ExifHeader.length &&
        ExifHeader.indices.forall(k => p(i + 4 + k) == ExifHeader(k)))
        return parseTiff(p, i + 4 + ExifHeader.length,
          len - 2 - ExifHeader.length)
      i += 2 + len
    }
    None
  }

  /** EXIF from a raw TIFF block — the shape WebP's EXIF chunk carries
    * (with or without the JPEG-style "Exif\0\0" prefix; both occur in
    * the wild, so try the prefixed form first). */
  def exifFromTiff(p: Array[Byte]): Option[ExifMeta] =
    if (p.length >= ExifHeader.length &&
        ExifHeader.indices.forall(k => p(k) == ExifHeader(k)))
      parseTiff(p, ExifHeader.length, p.length - ExifHeader.length)
    else parseTiff(p, 0, p.length)

  /** Parse IFD0 of a TIFF block at p[base, base+size). */
  private def parseTiff(p: Array[Byte], base: Int, size: Int)
      : Option[ExifMeta] = {
    if (size < 8) return None
    val b0 = p(base) & 0xff; val b1 = p(base + 1) & 0xff
    val little =
      if (b0 == 'I' && b1 == 'I') true
      else if (b0 == 'M' && b1 == 'M') false
      else return None
    def u16(off: Int): Int = {
      val a = p(base + off) & 0xff; val b = p(base + off + 1) & 0xff
      if (little) a | (b << 8) else (a << 8) | b
    }
    def u32(off: Int): Long = {
      val lo = u16(if (little) off else off + 2).toLong
      val hi = u16(if (little) off + 2 else off).toLong
      lo | (hi << 16)
    }
    def in(off: Long, n: Long): Boolean = off >= 0 && off + n <= size
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (!in(ifd, 2)) return None
    val count = u16(ifd.toInt)
    if (!in(ifd, 2L + 12L * count + 4L)) return None
    var orientation = -1
    var make: String = null
    var datetime: String = null
    var prevTag = -1
    var e = 0
    while (e < count) {
      val off = ifd.toInt + 2 + 12 * e
      val tag = u16(off)
      if (tag <= prevTag) return None // TIFF requires ascending tags
      prevTag = tag
      val tpe = u16(off + 2)
      val n = u32(off + 4)
      def ascii(): Option[String] = {
        if (tpe != 2 || n < 1 || n > 4096) return None
        val vOff = if (n <= 4) off + 8L else u32(off + 8)
        if (!in(vOff, n)) return None
        // ASCII values are NUL-terminated by spec — reject a missing one
        if (p(base + (vOff + n - 1).toInt) != 0) return None
        Some(new String(p, base + vOff.toInt, n.toInt - 1, "US-ASCII"))
      }
      tag match {
        case TagOrientation =>
          if (tpe != 3 || n != 1) return None
          val v = u16(off + 8)
          if (v < 1 || v > 8) return None
          orientation = v
        case TagMake => make = ascii().getOrElse(return None)
        case TagDateTime => datetime = ascii().getOrElse(return None)
        case _ => () // unrecognized tags pass through (bounds still held)
      }
      e += 1
    }
    if (orientation < 0 || make == null || datetime == null) None
    else Some(ExifMeta(orientation, make, datetime))
  }
}
