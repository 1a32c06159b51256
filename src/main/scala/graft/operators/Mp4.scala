package graft.operators

/** ISO-BMFF (MP4) box walk — container metadata without media decode:
  * brand, movie timescale and exact duration, track census (video /
  * audio / other), presentation dimensions, and payload size, from the
  * box tree alone.
  *
  * The video column of a web crawl is dominated by MP4; the expensive
  * question ("is this a 10-second clip or a 3-hour stream, what are its
  * dimensions, does it even have a video track") is answered by the
  * `moov` metadata tree without touching a single coded sample — the
  * same cheap-metadata-first discipline as the MP3 frame walk
  * (`operators/Mp3.scala`) and the EXIF walk (`operators/Exif.scala`).
  * Grammar from the public ISO/IEC 14496-12 box structure:
  *
  *  - every box: 32-bit big-endian size (includes the 8-byte header) +
  *    4-char type; `size == 1` switches to a 64-bit largesize after the
  *    type (16-byte header); `size == 0` means "to end of file" and is
  *    only legal for the last top-level box;
  *  - `ftyp` (required first): major brand + minor version + compatible
  *    brands;
  *  - `moov`: `mvhd` (version 0: 32-bit times, box total 108; version
  *    1: 64-bit times, total 120) carrying timescale + duration, and
  *    one `trak` per track: `tkhd` (v0 total 92 / v1 total 104, width
  *    and height as 16.16 fixed point) + `mdia` → `mdhd` + `hdlr`
  *    whose handler type (`vide`/`soun`/…) classifies the track;
  *  - `mdat` payload skipped (size recorded); `free`/unknown boxes
  *    skipped.
  *
  * Reject-don't-guess (the `operators/Warc.scala` contract): any box
  * overrunning its parent, a truncated header, a reserved version, a
  * missing/duplicated `mvhd`, or a `trak` without `tkhd`+`hdlr`
  * quarantines the record (None) rather than resyncing. Per-record,
  * embarrassingly parallel over a DataFrame of blobs; no state, no
  * driver involvement.
  */
object Mp4 {

  final case class Info(
      brand: String,
      timescale: Long,
      durationMs: Long,
      nTracks: Int,
      nVideo: Int,
      nAudio: Int,
      width: Int,
      height: Int,
      mdatBytes: Long,
      totalBytes: Long)

  // ---- builders (fixture/encoder twin of `info`, used by specs and
  // the oracle query so the walk is replayed against constructed ground
  // truth; sizes are fixed by construction so the oracle can reproduce
  // total_bytes arithmetically) ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)

  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: $s")
    s.getBytes("US-ASCII")
  }

  /** A box with 32-bit size. */
  def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
    be32(8L + body.length) ++ fourcc(typ) ++ body
  }

  /** ftyp: total 24 bytes with two compatible brands. */
  def ftyp(major: String, minor: Long, compat: Seq[String]): Array[Byte] =
    box("ftyp", fourcc(major), be32(minor),
      compat.map(fourcc).foldLeft(Array.emptyByteArray)(_ ++ _))

  /** mvhd: version 0 → 108 bytes total, version 1 → 120. */
  def mvhd(version: Int, timescale: Long, duration: Long): Array[Byte] = {
    require(version == 0 || version == 1, s"bad mvhd version $version")
    val times =
      if (version == 0) be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration)
      else be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration)
    box("mvhd",
      Array(version.toByte, 0, 0, 0), times,
      be32(0x00010000L), // rate 1.0
      Array[Byte](1, 0), // volume 1.0
      new Array[Byte](2 + 8), // reserved
      matrix,
      new Array[Byte](24), // pre_defined
      be32(2)) // next_track_ID
  }

  private val matrix: Array[Byte] =
    be32(0x00010000L) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000L) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000L)

  /** tkhd: v0 → 92 bytes total, v1 → 104; width/height in 16.16. */
  def tkhd(version: Int, trackId: Long, widthPx: Int, heightPx: Int): Array[Byte] = {
    require(version == 0 || version == 1, s"bad tkhd version $version")
    val head =
      if (version == 0) be32(0) ++ be32(0) ++ be32(trackId) ++ be32(0) ++ be32(0)
      else be64(0) ++ be64(0) ++ be32(trackId) ++ be32(0) ++ be64(0)
    box("tkhd",
      Array(version.toByte, 0, 0, 7), head,
      new Array[Byte](8), // reserved
      new Array[Byte](2 + 2 + 2 + 2), // layer, alternate_group, volume, reserved
      matrix,
      be32(widthPx.toLong << 16), be32(heightPx.toLong << 16))
  }

  /** mdhd v0: 32 bytes total; language packed as three 5-bit chars. */
  def mdhd(timescale: Long, duration: Long, lang: String = "und"): Array[Byte] = {
    val l = lang.map(c => c - 0x60).foldLeft(0)((a, c) => (a << 5) | c)
    box("mdhd",
      Array[Byte](0, 0, 0, 0), be32(0), be32(0), be32(timescale), be32(duration),
      Array(((l >> 8) & 0xFF).toByte, (l & 0xFF).toByte), new Array[Byte](2))
  }

  /** hdlr with an empty NUL-terminated name: 33 bytes total. */
  def hdlr(handler: String): Array[Byte] =
    box("hdlr", Array[Byte](0, 0, 0, 0), be32(0), fourcc(handler),
      new Array[Byte](12), Array[Byte](0))

  /** One track: 173 bytes total with v0 tkhd (185 with v1). */
  def trak(trackId: Long, handler: String, widthPx: Int, heightPx: Int,
      mediaTimescale: Long, mediaDuration: Long,
      tkhdVersion: Int = 0): Array[Byte] =
    box("trak",
      tkhd(tkhdVersion, trackId, widthPx, heightPx),
      box("mdia", mdhd(mediaTimescale, mediaDuration), hdlr(handler)))

  /** free box: 8 + bodyLen bytes. */
  def free(bodyLen: Int): Array[Byte] = box("free", new Array[Byte](bodyLen))

  /** mdat with deterministic payload; largesize = 16-byte header. */
  def mdat(payloadLen: Int, largesize: Boolean, seed: Long): Array[Byte] = {
    val body = new Array[Byte](payloadLen)
    var i = 0
    while (i < payloadLen) { body(i) = ((seed * 37 + i * 11) % 249).toByte; i += 1 }
    if (largesize) be32(1) ++ fourcc("mdat") ++ be64(16L + payloadLen) ++ body
    else be32(8L + payloadLen) ++ fourcc("mdat") ++ body
  }

  // ---- walker ----

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
      ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)

  private def u64(b: Array[Byte], p: Int): Long = (u32(b, p) << 32) | u32(b, p + 4)

  private def typ(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** (bodyStart, boxEnd) of the box at `p` within [p, limit), or null
    * to quarantine. `size == 0` (to end) only when `topLevel`. */
  private def header(b: Array[Byte], p: Int, limit: Int,
      topLevel: Boolean): Array[Long] = {
    if (limit - p < 8) return null
    val size = u32(b, p)
    if (size == 0) {
      if (!topLevel) null else Array(p + 8L, limit.toLong)
    } else if (size == 1) {
      if (limit - p < 16) return null
      val ls = u64(b, p + 8)
      if (ls < 16 || p + ls > limit) null else Array(p + 16L, p + ls)
    } else if (size < 8 || p + size > limit) null
    else Array(p + 8L, p + size)
  }

  /** Walk the stream; None quarantines the record. */
  def info(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 8) return None
    var pos = 0
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var nTracks = 0
    var nVideo = 0
    var nAudio = 0
    var width = 0
    var height = 0
    var mdatBytes = 0L
    var sawMoov = false

    while (pos < bytes.length) {
      val h = header(bytes, pos, bytes.length, topLevel = true)
      if (h == null) return None
      val body = h(0).toInt; val end = h(1).toInt
      val t = typ(bytes, pos + 4)
      if (pos == 0 && t != "ftyp") return None // our subset: ftyp leads
      t match {
        case "ftyp" =>
          if (brand != null || end - body < 8) return None
          brand = typ(bytes, body)
        case "moov" =>
          if (sawMoov) return None
          sawMoov = true
          var p = body
          while (p < end) {
            val ch = header(bytes, p, end, topLevel = false)
            if (ch == null) return None
            val cb = ch(0).toInt; val ce = ch(1).toInt
            typ(bytes, p + 4) match {
              case "mvhd" =>
                if (timescale != -1 || ce - cb < 4) return None
                bytes(cb) match {
                  case 0 =>
                    if (ce - cb < 20) return None
                    timescale = u32(bytes, cb + 12); duration = u32(bytes, cb + 16)
                  case 1 =>
                    if (ce - cb < 32) return None
                    timescale = u32(bytes, cb + 20); duration = u64(bytes, cb + 24)
                  case _ => return None
                }
                if (timescale <= 0) return None
              case "trak" =>
                var q = cb
                var w = -1; var hgt = -1; var handler: String = null
                while (q < ce) {
                  val th = header(bytes, q, ce, topLevel = false)
                  if (th == null) return None
                  val tb = th(0).toInt; val te = th(1).toInt
                  typ(bytes, q + 4) match {
                    case "tkhd" =>
                      if (te - tb < 4) return None
                      val off = bytes(tb) match {
                        case 0 => 76 // v0: w at body+76, h at +80
                        case 1 => 88
                        case _ => return None
                      }
                      if (te - tb < off + 8) return None
                      w = (u32(bytes, tb + off) >> 16).toInt
                      hgt = (u32(bytes, tb + off + 4) >> 16).toInt
                    case "mdia" =>
                      var m = tb
                      while (m < te) {
                        val mh = header(bytes, m, te, topLevel = false)
                        if (mh == null) return None
                        if (typ(bytes, m + 4) == "hdlr") {
                          if (mh(1) - mh(0) < 12) return None
                          handler = typ(bytes, mh(0).toInt + 8)
                        }
                        m = mh(1).toInt
                      }
                    case _ => ()
                  }
                  q = te
                }
                if (w < 0 || handler == null) return None
                nTracks += 1
                if (handler == "vide") {
                  nVideo += 1
                  if (width == 0) { width = w; height = hgt }
                } else if (handler == "soun") nAudio += 1
              case _ => ()
            }
            p = ce
          }
          if (timescale == -1) return None // moov without mvhd
        case "mdat" => mdatBytes += end - body
        case _ => () // free / skip / unknown top-level boxes
      }
      pos = end
    }
    if (brand == null || !sawMoov) None
    else Some(Info(brand, timescale, duration * 1000L / timescale,
      nTracks, nVideo, nAudio, width, height, mdatBytes, bytes.length.toLong))
  }
}
