package graft.operators

/** HEIF/AVIF container census — metadata without pixel decode, the
  * q247 honest-scoping pattern: modern crawls carry `.heic`/`.avif`,
  * and the triage a 100 TB pipeline needs (brand, dimensions, item
  * inventory, payload size) lives entirely in the ISO-BMFF `meta`
  * tree (ISO/IEC 23008-12 over 14496-12) — no HEVC/AV1 entropy
  * decode required. Pixel decode is OUT OF SCOPE and rejects by NAME
  * (`hevc_pixels_unsupported` / `av1_pixels_unsupported`): shipping a
  * guessed partial video codec would be worse than routing those
  * shards to a decoder pass.
  *
  * Boxes walked (public 14496-12/23008-12 grammar): `ftyp` (brand +
  * compatibles), `meta` (a FULL box, unlike `moov`) → `hdlr` (must
  * declare `pict`), `pitm` (primary item), `iinf`/`infe` v2+ (item
  * id/type census), `iprp`→`ipco` (property list; `ispe` carries the
  * spatial extent) + `ipma` (item→property associations — the primary
  * item's dimensions are the `ispe` ASSOCIATED with it, not "the
  * first ispe in the file"), `iloc` (extent bounds validated against
  * the blob), `mdat` (size recorded). Reject-don't-guess: any box
  * overrunning its parent, a missing required box, an association to
  * a property index out of range, or an extent escaping the file
  * quarantines with a named reason.
  *
  * The census is validated against the REAL parsers on-system:
  * tools/verify_heif_census.py reads the same constructed containers
  * through libheif (and libavif for the avif brand) and cross-checks
  * dimensions, item counts, and primary-item selection.
  */
object Heif {

  final case class Info(
      brand: String,
      nCompatible: Int,
      primaryItemId: Int,
      nItems: Int,
      primaryType: String, // av01 / hvc1 / ...
      primaryWidth: Int,
      primaryHeight: Int,
      nExifItems: Int,
      nProperties: Int,
      mdatBytes: Long,
      pixelFate: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private def u8(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p >= b.length) bail("truncated_box")
    b(p) & 0xff
  }
  private def u16(b: Array[Byte], p: Int): Int = {
    if (p + 2 > b.length) bail("truncated_box")
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
  }
  private def u32(b: Array[Byte], p: Int): Long = {
    if (p + 4 > b.length) bail("truncated_box")
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)
  }
  private def typ(b: Array[Byte], p: Int): String = {
    if (p + 4 > b.length) bail("truncated_box")
    new String(b, p, 4, "ISO-8859-1")
  }

  /** (bodyStart, boxEnd) with bounds enforced against the parent. */
  private def boxHeader(b: Array[Byte], p: Int, limit: Int): (Int, Int) = {
    if (limit - p < 8) bail("truncated_box")
    val size = u32(b, p)
    if (size == 0) (p + 8, limit) // to-end, tolerated at any level here
    else if (size == 1) bail("largesize_unsupported_in_meta")
    else if (size < 8 || p + size > limit) bail("box_overruns_parent")
    else (p + 8, (p + size).toInt)
  }

  /** Census one blob. */
  def census(bytes: Array[Byte]): Either[String, Info] =
    try {
      if (bytes == null || bytes.length < 16) bail("truncated_box")
      var pos = 0
      var brand: String = null
      var nCompatible = 0
      var metaSeen = false
      var mdatBytes = 0L
      var primaryItemId = -1
      val itemTypes = scala.collection.mutable.LinkedHashMap.empty[Int, String]
      // property index (1-based) -> (w, h) for ispe, or null for others
      val props = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
      val assoc = scala.collection.mutable.HashMap.empty[Int, Seq[Int]]
      var ilocOk = false

      while (pos < bytes.length) {
        val (body, end) = boxHeader(bytes, pos, bytes.length)
        val t = typ(bytes, pos + 4)
        if (pos == 0 && t != "ftyp") bail("missing_ftyp")
        t match {
          case "ftyp" =>
            if (brand != null) bail("duplicate_ftyp")
            if (end - body < 8) bail("truncated_box")
            brand = typ(bytes, body)
            nCompatible = (end - body - 8) / 4
          case "mdat" => mdatBytes += end - body
          case "meta" =>
            if (metaSeen) bail("duplicate_meta")
            metaSeen = true
            if (end - body < 4) bail("truncated_box")
            if (u8(bytes, body) != 0) bail("bad_meta_version")
            var p = body + 4 // fullbox: version + flags
            var hdlrPict = false
            while (p < end) {
              val (cb, ce) = boxHeader(bytes, p, end)
              typ(bytes, p + 4) match {
                case "hdlr" =>
                  if (ce - cb < 12) bail("truncated_box")
                  hdlrPict = typ(bytes, cb + 8) == "pict"
                case "pitm" =>
                  val v = u8(bytes, cb)
                  primaryItemId =
                    if (v == 0) u16(bytes, cb + 4)
                    else u32(bytes, cb + 4).toInt
                case "iinf" =>
                  val v = u8(bytes, cb)
                  var q = cb + 4
                  val n = if (v == 0) { q += 2; u16(bytes, cb + 4) }
                    else { q += 4; u32(bytes, cb + 4).toInt }
                  var k = 0
                  while (k < n) {
                    val (ib, ie) = boxHeader(bytes, q, ce)
                    if (typ(bytes, q + 4) != "infe") bail("bad_iinf_entry")
                    val iv = u8(bytes, ib)
                    if (iv < 2) bail("infe_version_unsupported")
                    val itemId =
                      if (iv == 2) u16(bytes, ib + 4)
                      else u32(bytes, ib + 4).toInt
                    val typeOff = if (iv == 2) ib + 8 else ib + 10
                    itemTypes(itemId) = typ(bytes, typeOff)
                    q = ie
                    k += 1
                  }
                case "iprp" =>
                  var q = cb
                  while (q < ce) {
                    val (pb, pe) = boxHeader(bytes, q, ce)
                    typ(bytes, q + 4) match {
                      case "ipco" =>
                        var r = pb
                        while (r < pe) {
                          val (xb, xe) = boxHeader(bytes, r, pe)
                          val pt = typ(bytes, r + 4)
                          if (pt == "ispe") {
                            // fullbox + width + height
                            props += ((pt, u32(bytes, xb + 4).toInt,
                              u32(bytes, xb + 8).toInt))
                          } else props += ((pt, 0, 0))
                          r = xe
                        }
                      case "ipma" =>
                        val v = u8(bytes, pb)
                        val flags = u32(bytes, pb).toInt & 0xffffff
                        val wideIdx = (flags & 1) != 0
                        var r = pb + 4
                        val n = u32(bytes, r).toInt; r += 4
                        var k = 0
                        while (k < n) {
                          // an oversized entry count must not walk past
                          // the ipma body into sibling boxes' bytes
                          if (r >= pe) bail("truncated_box")
                          val itemId =
                            if (v == 0) { val x = u16(bytes, r); r += 2; x }
                            else { val x = u32(bytes, r).toInt; r += 4; x }
                          val cnt = { val x = u8(bytes, r); r += 1; x }
                          val idxs = (0 until cnt).map { _ =>
                            if (wideIdx) {
                              val x = u16(bytes, r) & 0x7fff; r += 2; x
                            } else { val x = u8(bytes, r) & 0x7f; r += 1; x }
                          }
                          assoc(itemId) = idxs
                          k += 1
                        }
                      case _ => ()
                    }
                    q = pe
                  }
                case "iloc" =>
                  val v = u8(bytes, cb)
                  if (v > 2) bail("iloc_version_unsupported")
                  var q = cb + 4
                  val sizes = u16(bytes, q); q += 2
                  val offSize = (sizes >> 12) & 0xf
                  val lenSize = (sizes >> 8) & 0xf
                  val baseSize = (sizes >> 4) & 0xf
                  val idxSize = if (v == 1 || v == 2) sizes & 0xf else 0
                  def field(sz: Int): Long = sz match {
                    case 0 => 0L
                    case 4 => val x = u32(bytes, q); q += 4; x
                    case 8 => val hi = u32(bytes, q); val lo = u32(bytes, q + 4); q += 8; (hi << 32) | lo
                    case _ => bail("bad_iloc_field_size")
                  }
                  val n =
                    if (v < 2) { val x = u16(bytes, q); q += 2; x }
                    else { val x = u32(bytes, q).toInt; q += 4; x }
                  var k = 0
                  while (k < n) {
                    if (v < 2) { u16(bytes, q); q += 2 } // item id
                    else { u32(bytes, q); q += 4 }
                    if (v == 1 || v == 2) { u16(bytes, q); q += 2 } // cons.method
                    u16(bytes, q); q += 2 // data reference index
                    val base = field(baseSize)
                    val nExt = u16(bytes, q); q += 2
                    var e = 0
                    while (e < nExt) {
                      if (idxSize > 0) field(idxSize)
                      val off = field(offSize)
                      val len = field(lenSize)
                      if (base + off + len > bytes.length)
                        bail("extent_escapes_file")
                      e += 1
                    }
                    k += 1
                  }
                  ilocOk = true
                case _ => ()
              }
              p = ce
            }
            if (!hdlrPict) bail("handler_not_pict")
          case _ => () // free, unknown: skip
        }
        pos = end
      }
      if (brand == null) bail("missing_ftyp")
      if (!metaSeen) bail("missing_meta")
      if (primaryItemId < 0) bail("missing_pitm")
      if (!ilocOk) bail("missing_iloc")
      val primaryType = itemTypes.getOrElse(primaryItemId, bail("primary_item_undeclared"))
      // primary dims: the ispe ASSOCIATED with the primary item
      val idxs = assoc.getOrElse(primaryItemId, Seq.empty)
      var pw = -1; var ph = -1
      idxs.foreach { ix =>
        if (ix < 1 || ix > props.length) bail("association_out_of_range")
        val (pt, w, h) = props(ix - 1)
        if (pt == "ispe" && pw < 0) { pw = w; ph = h }
      }
      if (pw < 0) bail("primary_missing_ispe")
      val pixelFate = primaryType match {
        case "av01" => "av1_pixels_unsupported"
        case "hvc1" | "hev1" => "hevc_pixels_unsupported"
        case other => s"no_decoder_for_$other"
      }
      Right(Info(brand, nCompatible, primaryItemId, itemTypes.size,
        primaryType, pw, ph,
        itemTypes.valuesIterator.count(_ == "Exif"),
        props.length, mdatBytes, pixelFate))
    } catch { case e: Bail => Left(e.reason) }

  // ---- fixture builder: a minimal valid single-image container ----

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
  private def box(t: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.flatten.toArray
    be32(8L + body.length) ++ fourcc(t) ++ body
  }
  private def fullbox(t: String, version: Int, flags: Int,
      parts: Array[Byte]*): Array[Byte] =
    box(t, Array(((version & 0xff).toByte)) +:
      Array(((flags >> 16) & 0xff).toByte, ((flags >> 8) & 0xff).toByte,
        (flags & 0xff).toByte) +: parts: _*)

  /** Encode a single-image HEIF/AVIF container: primary coded item
    * (type `av01` for brand avif, `hvc1` for heic) with an `ispe` and
    * an opaque codec-config property, an optional Exif item, and the
    * coded payload as seed-derived `mdat` bytes. Valid per the REAL
    * parsers (verified by tools/verify_heif_census.py through
    * libheif/libavif). */
  def encode(avif: Boolean, w: Int, h: Int, payloadLen: Int, seed: Long,
      withExif: Boolean = false): Array[Byte] = {
    val itemType = if (avif) "av01" else "hvc1"
    val ftyp =
      if (avif) box("ftyp", fourcc("avif"), be32(0), fourcc("avif"), fourcc("mif1"))
      else box("ftyp", fourcc("heic"), be32(0), fourcc("heic"), fourcc("mif1"))
    val exifPayload: Array[Byte] =
      if (withExif) fourcc("MM *") ++ be32(8) else Array.emptyByteArray
    val payload = Array.tabulate[Byte](payloadLen)(i =>
      ((seed + 31L * i) % 256).toByte)
    // meta children (iloc offsets patched after layout is known)
    def metaOf(itemOffset: Long, exifOffset: Long): Array[Byte] = {
      val hdlr = fullbox("hdlr", 0, 0, be32(0), fourcc("pict"),
        be32(0), be32(0), be32(0), Array[Byte](0))
      val pitm = fullbox("pitm", 0, 0, be16(1))
      val infe1 = fullbox("infe", 2, 0, be16(1), be16(0), fourcc(itemType),
        Array[Byte](0))
      val infe2 = fullbox("infe", 2, 0, be16(2), be16(0), fourcc("Exif"),
        Array[Byte](0))
      val iinf =
        if (withExif) fullbox("iinf", 0, 0, be16(2), infe1, infe2)
        else fullbox("iinf", 0, 0, be16(1), infe1)
      val ispe = fullbox("ispe", 0, 0, be32(w), be32(h))
      val cfg =
        if (avif) box("av1C", Array[Byte](0x81.toByte, 0, 0, 0))
        else box("hvcC", Array[Byte](
          // a STRUCTURALLY valid HEVCDecoderConfigurationRecord (the
          // reference parser deep-parses it at read time): version 1,
          // Main profile, level 3.0, 4:2:0 8-bit, lengthSize 4,
          // numOfArrays 0 — no coded parameter sets, consistent with
          // the pixel layer being out of scope
          1, 0x01, 0x60, 0, 0, 0, 0x90.toByte, 0, 0, 0, 0, 0, 0x5A,
          0xF0.toByte, 0, 0xFC.toByte, 0xFD.toByte, 0xF8.toByte,
          0xF8.toByte, 0, 0, 0x03, 0))
      val pixi = fullbox("pixi", 0, 0, Array[Byte](3, 8, 8, 8))
      val ipco = box("ipco", ispe, cfg, pixi)
      val ipma = fullbox("ipma", 0, 0, be32(1), be16(1),
        Array[Byte](3, 1, 2, 3)) // item 1 -> props 1,2,3 (non-essential)
      val iprp = box("iprp", ipco, ipma)
      val ilocItems =
        if (withExif)
          be16(2) ++
            (be16(1) ++ be16(0) ++ be16(1) ++ be32(itemOffset) ++ be32(payload.length)) ++
            (be16(2) ++ be16(0) ++ be16(1) ++ be32(exifOffset) ++ be32(exifPayload.length))
        else
          be16(1) ++
            (be16(1) ++ be16(0) ++ be16(1) ++ be32(itemOffset) ++ be32(payload.length))
      // v0, offset_size=4 length_size=4 base_offset_size=0
      val iloc = fullbox("iloc", 0, 0, be16(0x4400), ilocItems)
      fullbox("meta", 0, 0, hdlr, pitm, iinf, iprp, iloc)
    }
    val metaLen = metaOf(0, 0).length // offsets are fixed-width: stable
    val mdatBodyAt = ftyp.length + metaLen + 8
    val meta = metaOf(mdatBodyAt.toLong,
      (mdatBodyAt + payload.length).toLong)
    ftyp ++ meta ++ box("mdat", payload, exifPayload)
  }
}
