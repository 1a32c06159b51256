package graft.operators

/** WebP lossless (VP8L) — after progressive JPEG, the biggest remaining
  * image seam in a real crawl (WebP is ~10% of web images and growing;
  * the lossless form carries UI screenshots, charts, and stickers).
  * Implements the public VP8L bitstream spec
  * (https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification)
  * COMPLETELY on the decode side: RIFF container, LSB-first bit reader,
  * canonical prefix codes built through the full code-length-code
  * machinery (3-bit CLC lengths in the fixed order, 16/17/18 repeat
  * ops, the max-symbol shortcut), the five-code entropy group
  * (green+length+cache, red, blue, alpha, distance), LZ77 backward
  * references with the prefix-coded length/distance scheme and the
  * 120-entry two-dimensional distance neighborhood, the color cache
  * (0x1e35a7bd multiplicative hash), meta prefix codes (a recursive
  * entropy image selecting per-block code groups), and ALL FOUR
  * transforms — predictor (14 modes over a subresolution mode image),
  * cross-color (per-block signed-fixed-point channel mixing),
  * subtract-green, and color indexing (delta-coded palette with
  * sub-byte pixel bundling).
  *
  * Reject-don't-guess: grammar violations (bad signature, truncated
  * entropy data, invalid prefix code, cache index without a cache,
  * backreference past the start, palette index past the palette)
  * quarantine with named reasons; the one combination this decoder
  * declines — color indexing together with other transforms — rejects
  * by name (real encoders never emit it; the palette path already
  * changes the effective geometry every other stage depends on).
  *
  * The encoder exists for fixtures and the roundtrip gate: lossless
  * means decode(encode(px)) must equal px BIT-FOR-BIT for arbitrary
  * content under every feature combination — literals, LZ77, color
  * cache, subtract-green, per-block predictors, cross-color, palette
  * bundling, and two-group meta prefix codes — pinned in Vp8lSpec with
  * truncation and bit-flip sweeps. Where the spec leaves arithmetic
  * corners to the reference implementation (Select's tie rule,
  * ClampAddSubtractHalf's rounding, the rightmost column's top-right
  * neighbor), both sides here follow libwebp's documented behavior, and
  * the roundtrip gate makes any internal disagreement loud.
  */
object Vp8l {

  // ---- LSB-first bit IO (VP8L convention) ----

  private[operators] final class BitReader(b: Array[Byte]) {
    private var bitPos = 0
    var truncated = false
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIx = bitPos >> 3
        if (byteIx >= b.length) { truncated = true; return v }
        v |= (((b(byteIx) >> (bitPos & 7)) & 1) << i)
        bitPos += 1
        i += 1
      }
      v
    }
  }

  private[operators] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        acc |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf.write(acc); acc = 0; nBits = 0 }
        i += 1
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { buf.write(acc); acc = 0; nBits = 0 }
      buf.toByteArray
    }
  }

  // ---- canonical prefix codes (DEFLATE convention) ----

  private def canonicalCodes(lengths: Array[Int]): Array[(Int, Int)] = {
    val maxLen = lengths.max
    val out = new Array[(Int, Int)](lengths.length)
    var code = 0
    var len = 1
    while (len <= maxLen) {
      var s = 0
      while (s < lengths.length) {
        if (lengths(s) == len) { out(s) = (code, len); code += 1 }
        s += 1
      }
      code <<= 1
      len += 1
    }
    out
  }

  /** Bit-by-bit decoder over (len, code) -> symbol. A single-symbol
    * "code" (the degenerate case VP8L allows) consumes zero bits. */
  private[operators] final class PrefixCode(lengths: Array[Int]) {
    private val used = lengths.zipWithIndex.filter(_._1 > 0)
    private val single: Int = if (used.length == 1) used.head._2 else -1
    private val lookup: Map[(Int, Int), Int] =
      if (single >= 0) Map.empty
      else {
        val codes = canonicalCodes(lengths)
        used.map { case (_, s) => (codes(s)._2, codes(s)._1) -> s }.toMap
      }
    val isEmpty: Boolean = used.isEmpty
    /** Kraft-exact for multi-symbol codes (sum 2^-len == 1); an over- or
      * under-subscribed length set is not a prefix code — libwebp
      * rejects both, and silently dropping colliding (len,code) entries
      * would decode hostile streams to deterministic garbage instead of
      * quarantining. Single-symbol codes are the spec's sanctioned
      * degenerate case (zero-bit), exempt like libwebp's. */
    val isComplete: Boolean =
      single >= 0 || used.isEmpty ||
        used.map { case (len, _) => 1L << (15 - len) }.sum == (1L << 15)
    def decode(br: BitReader): Int = {
      if (single >= 0) return single
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bits(1)
        len += 1
        if (br.truncated) return -1
        val s = lookup.getOrElse((len, code), -2)
        if (s != -2) return s
      }
      -1
    }
  }

  // ---- shared length/distance prefix-value scheme ----

  private def prefixDecode(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val eb = (code - 2) >> 1
      val off = (2 + (code & 1)) << eb
      off + br.bits(eb) + 1
    }

  /** Inverse of [[prefixDecode]]: value -> (code, extraBits, nExtraBits).
    * Walks the 40-code table — runs on tiny fixture alphabets only. */
  private def prefixEncode(v0: Int): (Int, Int, Int) = {
    val v = v0 - 1
    if (v < 4) (v, 0, 0)
    else {
      var code = 4
      while (code < 40) {
        val e = (code - 2) >> 1
        val off = (2 + (code & 1)) << e
        if (v0 >= off + 1 && v0 <= off + (1 << e)) return (code, v0 - off - 1, e)
        code += 1
      }
      throw new IllegalArgumentException(s"value $v0 out of prefix range")
    }
  }

  /** The spec's 120-entry close-neighborhood (dx, dy) distance map. */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  private def cacheKey(argb: Int, bits: Int): Int =
    ((0x1e35a7bd * argb) >>> (32 - bits))

  // ---- RIFF container ----

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  def wrapRiff(vp8l: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val chunk = vp8l.length
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + 8 + chunk + (chunk & 1)))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    out.write(le32(chunk))
    out.write(vp8l)
    if ((chunk & 1) == 1) out.write(0) // RIFF even-size padding
    out.toByteArray
  }

  /** The VP8L chunk payload, or None when the container grammar is off
    * (bad fourccs, sizes past the blob, lossy VP8 stream). */
  def unwrapRiff(b: Array[Byte]): Option[Array[Byte]] = {
    def fourcc(o: Int) = new String(b, o, 4, "US-ASCII")
    def u32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (b.length < 20 || fourcc(0) != "RIFF" || fourcc(8) != "WEBP") return None
    if (fourcc(12) != "VP8L") return None // lossy/extended: out of scope here
    val n = u32(16)
    if (n < 0 || 20 + n > b.length) return None
    Some(java.util.Arrays.copyOfRange(b, 20, 20 + n))
  }

  // ---- decode ----

  final case class Rejected(reason: String)
  private final class Bail(val reason: String) extends RuntimeException(reason)
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val GreenBase = 256 + 24

  /** One entropy-coded image (the shared grammar for the main image,
    * transform data, palettes, and the meta-prefix entropy image):
    * color cache, optional meta prefix codes, prefix-code groups,
    * literals / LZ77 / cache hits. Throws Bail on violation.
    *
    * The meta-prefix FLAG BIT exists only in the top-level ARGB image
    * (`spatially-coded-image = color-cache-info meta-prefix data`);
    * sub-images — transform data, palettes, the entropy image itself —
    * are `entropy-coded-image = color-cache-info data` with NO meta bit
    * at all (libwebp's ReadHuffmanCodes short-circuits on
    * allow_recursion before reading it). Reading it unconditionally
    * would desync every transform-bearing stream by one bit. */
  private def decodeEntropyImage(br: BitReader, w: Int, h: Int,
      allowMeta: Boolean): Array[Int] = {
    val cacheBits = if (br.bits(1) == 1) br.bits(4) else 0
    if (cacheBits > 11) bail("bad_cache_bits")
    if (br.truncated) bail("truncated_header")

    // meta prefix codes: an entropy image whose (red<<8)|green selects
    // the code group per 2^bits-sized block
    var metaBits = 0
    var metaImage: Array[Int] = null
    var metaW = 0
    var numGroups = 1
    if (allowMeta && br.bits(1) == 1) {
      metaBits = br.bits(3) + 2
      if (br.truncated) bail("truncated_header")
      metaW = (w + (1 << metaBits) - 1) >> metaBits
      val metaH = (h + (1 << metaBits) - 1) >> metaBits
      metaImage = decodeEntropyImage(br, metaW, metaH, allowMeta = false)
      metaImage = metaImage.map(p => ((p >> 8) & 0xffff)) // (red<<8)|green
      numGroups = metaImage.max + 1
      if (numGroups > 1024) bail("oversized_meta")
    }

    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val alphabets = Array(GreenBase + cacheSize, 256, 256, 256, 40)
    val groups = Array.fill(numGroups) {
      alphabets.map(a => readPrefixCode(br, a))
    }
    if (br.truncated) bail("truncated_codes")

    val n = w * h
    val px = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def insert(argb: Int): Unit =
      if (cache != null) cache(cacheKey(argb, cacheBits)) = argb
    def groupAt(i: Int): Array[PrefixCode] =
      if (metaImage == null) groups(0)
      else {
        val x = i % w; val y = i / w
        groups(metaImage((y >> metaBits) * metaW + (x >> metaBits)))
      }
    var i = 0
    while (i < n) {
      val codes = groupAt(i)
      val g = codes(0).decode(br)
      if (g < 0 || br.truncated) bail("truncated_data")
      if (g < 256) {
        val r = codes(1).decode(br)
        val b2 = codes(2).decode(br)
        val a = codes(3).decode(br)
        if (r < 0 || b2 < 0 || a < 0 || br.truncated) bail("truncated_data")
        val argb = (a << 24) | (r << 16) | (g << 8) | b2
        px(i) = argb
        insert(argb)
        i += 1
      } else if (g < GreenBase) {
        val length = prefixDecode(g - 256, br)
        val distSym = codes(4).decode(br)
        if (distSym < 0 || br.truncated) bail("truncated_data")
        val distCode = prefixDecode(distSym, br)
        if (br.truncated) bail("truncated_data")
        val dist =
          if (distCode > 120) distCode - 120
          else {
            val (dx, dy) = DistanceMap(distCode - 1)
            math.max(1, dy * w + dx)
          }
        if (dist > i || i + length > n) bail("bad_backref")
        var k = 0
        while (k < length) {
          val v = px(i - dist)
          px(i) = v
          insert(v)
          i += 1
          k += 1
        }
      } else {
        if (cache == null) bail("cache_without_cache")
        val idx = g - GreenBase
        if (idx >= cacheSize) bail("bad_cache_index")
        px(i) = cache(idx)
        i += 1
      }
    }
    px
  }

  // ---- predictor transform (14 modes, libwebp arithmetic corners) ----

  private def avg2(a: Int, b: Int): Int = {
    val alpha = (((a >>> 24) + (b >>> 24)) >> 1) & 0xff
    val r = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) & 0xff
    val g = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) & 0xff
    val bl = (((a & 0xff) + (b & 0xff)) >> 1) & 0xff
    (alpha << 24) | (r << 16) | (g << 8) | bl
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(v: Int, s: Int) = (v >>> s) & 0xff
    var pL = 0; var pT = 0
    var s = 0
    while (s < 32) {
      val p = ch(l, s) + ch(t, s) - ch(tl, s)
      pL += math.abs(p - ch(l, s))
      pT += math.abs(p - ch(t, s))
      s += 8
    }
    if (pL < pT) l else t
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(s: Int) =
      clamp255(((l >>> s) & 0xff) + ((t >>> s) & 0xff) - ((tl >>> s) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    val ave = avg2(l, t)
    def ch(s: Int) = {
      val a = (ave >>> s) & 0xff
      val b = (tl >>> s) & 0xff
      clamp255(a + (a - b) / 2) // toward-zero division, per libwebp
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  /** The prediction for pixel (x, y) given the already-final pixels
    * `px` and the block's mode. Edge rules: (0,0) predicts opaque
    * black, row 0 predicts Left, column 0 predicts Top; the rightmost
    * column's top-right neighbor is the current row's FIRST pixel
    * (libwebp's linear-buffer behavior). */
  private def predict(px: Array[Int], w: Int, x: Int, y: Int, mode: Int): Int = {
    if (x == 0 && y == 0) return 0xff000000
    val i = y * w + x
    if (y == 0) return px(i - 1)
    if (x == 0) return px(i - w)
    val l = px(i - 1)
    val t = px(i - w)
    val tl = px(i - w - 1)
    val tr = if (x + 1 < w) px(i - w + 1) else px(y * w)
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(l, t, tl)
      case _ => bail("bad_predictor_mode")
    }
  }

  private def addPixels(a: Int, b: Int): Int = {
    val alpha = ((a >>> 24) + (b >>> 24)) & 0xff
    val r = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
    val g = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
    val bl = ((a & 0xff) + (b & 0xff)) & 0xff
    (alpha << 24) | (r << 16) | (g << 8) | bl
  }

  private def subPixels(a: Int, b: Int): Int = {
    val alpha = ((a >>> 24) - (b >>> 24)) & 0xff
    val r = (((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff
    val g = (((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff
    val bl = ((a & 0xff) - (b & 0xff)) & 0xff
    (alpha << 24) | (r << 16) | (g << 8) | bl
  }

  // ---- cross-color transform ----

  /** (int8)t * (int8)c >> 5, per libwebp. */
  private def ctDelta(t: Int, c: Int): Int = (t.toByte.toInt * c.toByte.toInt) >> 5

  private def inverseColorTransform(px: Int, cte: Int): Int = {
    val g2r = cte & 0xff
    val g2b = (cte >> 8) & 0xff
    val r2b = (cte >> 16) & 0xff
    val g = (px >> 8) & 0xff
    var r = (px >> 16) & 0xff
    var b = px & 0xff
    r = (r + ctDelta(g2r, g)) & 0xff
    b = (b + ctDelta(g2b, g)) & 0xff
    b = (b + ctDelta(r2b, r)) & 0xff
    (px & 0xff000000) | (r << 16) | ((px >> 8 & 0xff) << 8) | b
  }

  private def forwardColorTransform(px: Int, cte: Int): Int = {
    val g2r = cte & 0xff
    val g2b = (cte >> 8) & 0xff
    val r2b = (cte >> 16) & 0xff
    val g = (px >> 8) & 0xff
    val r = (px >> 16) & 0xff
    val b = px & 0xff
    val nr = (r - ctDelta(g2r, g)) & 0xff
    // the decoder's third step adds ctDelta(r2b, reconstructed r) — the
    // reconstructed r IS the original r, so subtract against it here
    val nb = (b - ctDelta(g2b, g) - ctDelta(r2b, r)) & 0xff
    (px & 0xff000000) | (nr << 16) | (g << 8) | nb
  }

  private sealed trait Transform
  private final case class Predictor(bits: Int, image: Array[Int]) extends Transform
  private final case class CrossColor(bits: Int, image: Array[Int]) extends Transform
  private case object SubtractGreen extends Transform
  private final case class Palette(colors: Array[Int]) extends Transform

  private def paletteWidthBits(size: Int): Int =
    if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0

  /** Decode a VP8L blob (RIFF-wrapped) to (w, h, ARGB pixels). */
  def decode(blob: Array[Byte]): Either[Rejected, (Int, Int, Array[Int])] =
    try {
      val payload = unwrapRiff(blob).getOrElse(return Left(Rejected("bad_container")))
      if (payload.isEmpty || (payload(0) & 0xff) != 0x2f)
        return Left(Rejected("bad_signature"))
      val br = new BitReader(java.util.Arrays.copyOfRange(payload, 1, payload.length))
      val w = br.bits(14) + 1
      val h = br.bits(14) + 1
      br.bits(1) // alpha hint
      if (br.bits(3) != 0) return Left(Rejected("bad_version"))
      if (br.truncated) return Left(Rejected("truncated_header"))
      if (w.toLong * h > (1L << 24)) return Left(Rejected("oversized"))
      Right((w, h, decodeBody(br, w, h)))
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  /** Decode a HEADERLESS lossless stream at known dimensions — the form
    * an ALPH chunk carries (container spec: the VP8L bitstream without
    * RIFF framing, signature, or the size fields; the image's GREEN
    * channel is the alpha plane). Starts directly at the transform
    * loop, exactly like the top-level image. */
  def decodeRawStream(payload: Array[Byte], w: Int,
      h: Int): Either[Rejected, Array[Int]] =
    try {
      if (w < 1 || h < 1 || w.toLong * h > (1L << 24))
        return Left(Rejected("oversized"))
      Right(decodeBody(new BitReader(payload), w, h))
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  /** Transform loop + entropy-coded image + inverse transforms (the
    * part after the 5-byte header). Throws Bail on violation. */
  private def decodeBody(br: BitReader, w: Int, h: Int): Array[Int] = {
      // transforms, in stream order; applied inverse in REVERSE order
      var transforms = List.empty[Transform]
      var effW = w // color indexing bundles sub-byte pixels: width shrinks
      var seen = Set.empty[Int]
      while (br.bits(1) == 1) {
        if (br.truncated) bail("truncated_header")
        val t = br.bits(2)
        if (seen(t)) bail("duplicate_transform")
        seen += t
        t match {
          case 0 =>
            val bits = br.bits(3) + 2
            val tw = (effW + (1 << bits) - 1) >> bits
            val th = (h + (1 << bits) - 1) >> bits
            transforms ::= Predictor(bits,
              decodeEntropyImage(br, tw, th, allowMeta = false))
          case 1 =>
            val bits = br.bits(3) + 2
            val tw = (effW + (1 << bits) - 1) >> bits
            val th = (h + (1 << bits) - 1) >> bits
            transforms ::= CrossColor(bits,
              decodeEntropyImage(br, tw, th, allowMeta = false))
          case 2 => transforms ::= SubtractGreen
          case _ =>
            val size = br.bits(8) + 1
            if (br.truncated) bail("truncated_header")
            val deltas = decodeEntropyImage(br, size, 1, allowMeta = false)
            val colors = new Array[Int](size)
            var prev = 0
            var k = 0
            while (k < size) {
              prev = addPixels(prev, deltas(k)); colors(k) = prev; k += 1
            }
            transforms ::= Palette(colors)
            effW = (w + (1 << paletteWidthBits(size)) - 1) >> paletteWidthBits(size)
        }
      }
      if (br.truncated) bail("truncated_header")
      if (transforms.exists(_.isInstanceOf[Palette]) && transforms.length > 1)
        bail("unsupported_palette_combination")

      var px = decodeEntropyImage(br, effW, h, allowMeta = true)
      var curW = effW
      // inverse transforms in reverse-of-read = LIST order (prepended)
      transforms.foreach {
        case SubtractGreen =>
          var k = 0
          while (k < px.length) {
            val v = px(k)
            val g = (v >> 8) & 0xff
            val r = (((v >> 16) & 0xff) + g) & 0xff
            val b2 = ((v & 0xff) + g) & 0xff
            px(k) = (v & 0xff000000) | (r << 16) | (g << 8) | b2
            k += 1
          }
        case Predictor(bits, image) =>
          val tw = (curW + (1 << bits) - 1) >> bits
          var y = 0
          while (y < h) {
            var x = 0
            while (x < curW) {
              val mode = (image((y >> bits) * tw + (x >> bits)) >> 8) & 0xff
              if (mode > 13) bail("bad_predictor_mode")
              val i = y * curW + x
              px(i) = addPixels(px(i), predict(px, curW, x, y, mode))
              x += 1
            }
            y += 1
          }
        case CrossColor(bits, image) =>
          val tw = (curW + (1 << bits) - 1) >> bits
          var y = 0
          while (y < h) {
            var x = 0
            while (x < curW) {
              val cte = image((y >> bits) * tw + (x >> bits))
              val i = y * curW + x
              px(i) = inverseColorTransform(px(i), cte)
              x += 1
            }
            y += 1
          }
        case Palette(colors) =>
          val wb = paletteWidthBits(colors.length)
          val bpp = 8 >> wb
          val perByte = 1 << wb
          val mask = (1 << bpp) - 1
          val out = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val packed = (px(y * curW + x / perByte) >> 8) & 0xff
              val idx = (packed >> (bpp * (x % perByte))) & mask
              if (idx >= colors.length) bail("bad_palette_index")
              out(y * w + x) = colors(idx)
              x += 1
            }
            y += 1
          }
          px = out
          curW = w
      }
      px
  }

  private val ClcOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code: the simple form (1-2 literal symbols) or the full
    * code-length-code machinery. Throws Bail on violation. */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bits(1) == 1) { // simple
      val numSymbols = br.bits(1) + 1
      val first8 = br.bits(1)
      val s0 = br.bits(if (first8 == 1) 8 else 1)
      if (s0 >= alphabetSize) bail("bad_prefix_code")
      lengths(s0) = 1
      if (numSymbols == 2) {
        val s1 = br.bits(8)
        if (s1 >= alphabetSize || s1 == s0) bail("bad_prefix_code")
        lengths(s1) = 1
      }
      if (br.truncated) bail("truncated_codes")
      new PrefixCode(lengths)
    } else {
      val numClc = 4 + br.bits(4)
      val clcLengths = new Array[Int](19)
      var i = 0
      while (i < numClc) { clcLengths(ClcOrder(i)) = br.bits(3); i += 1 }
      if (br.truncated || clcLengths.forall(_ == 0)) bail("bad_prefix_code")
      val clc = new PrefixCode(clcLengths)
      if (!clc.isComplete) bail("bad_prefix_code")
      var maxSymbol =
        if (br.bits(1) == 1) {
          val lengthNBits = 2 + 2 * br.bits(3)
          val ms = 2 + br.bits(lengthNBits)
          if (ms > alphabetSize) bail("bad_prefix_code") // libwebp: max_symbol > num_symbols is an error
          ms
        } else alphabetSize
      var symbol = 0
      var prevLen = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clc.decode(br)
        if (cl < 0 || br.truncated) bail("bad_prefix_code")
        if (cl < 16) {
          lengths(symbol) = cl
          symbol += 1
          if (cl != 0) prevLen = cl
        } else {
          val (repeatLen, extra, base) = cl match {
            case 16 => (prevLen, 2, 3)
            case 17 => (0, 3, 3)
            case _ => (0, 7, 11)
          }
          var rep = base + br.bits(extra)
          if (br.truncated || symbol + rep > alphabetSize) bail("bad_prefix_code")
          while (rep > 0) { lengths(symbol) = repeatLen; symbol += 1; rep -= 1 }
        }
      }
      if (lengths.forall(_ == 0)) bail("bad_prefix_code")
      val pc = new PrefixCode(lengths)
      if (!pc.isComplete) bail("bad_prefix_code")
      pc
    }
  }

  // ---- encode (fixtures + roundtrip gate) ----

  /** Huffman code lengths for the given counts, depth-limited to
    * `limit` (15 for the five main codes, 7 for the code-length code —
    * its lengths travel in 3-bit fields). When plain Huffman overflows
    * the limit, fall back to the balanced COMPLETE code over the used
    * symbols (n1 = 2^k - n symbols at length k-1, the rest at k, most
    * frequent first — Kraft-exact, slightly suboptimal, always legal). */
  private def huffmanLengths(counts: Array[Int], limit: Int = 15): Array[Int] = {
    val used = counts.zipWithIndex.filter(_._1 > 0)
    val lengths = new Array[Int](counts.length)
    if (used.length <= 1) { used.foreach { case (_, s) => lengths(s) = 1 }; return lengths }
    final case class Node(count: Long, syms: List[Int])
    val pq = scala.collection.mutable.PriorityQueue.empty[Node](
      Ordering.by[Node, (Long, Int)](n => (n.count, n.syms.min)).reverse)
    used.foreach { case (c, s) => pq.enqueue(Node(c.toLong, List(s))) }
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      (a.syms ++ b.syms).foreach(s => lengths(s) += 1)
      pq.enqueue(Node(a.count + b.count, a.syms ++ b.syms))
    }
    if (lengths.max > limit) {
      java.util.Arrays.fill(lengths, 0)
      val n = used.length
      val k = 32 - Integer.numberOfLeadingZeros(n - 1) // ceil(log2 n)
      require(n <= (1 << limit), "alphabet larger than the depth limit allows")
      val nShort = (1 << k) - n // symbols at length k-1
      val byFreq = used.sortBy { case (c, s) => (-c, s) }
      byFreq.zipWithIndex.foreach { case ((_, s), ix) =>
        lengths(s) = if (ix < nShort) k - 1 else k
      }
    }
    lengths
  }

  /** Emit one prefix code's description (simple or full CLC form). */
  private def writePrefixCode(bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.zipWithIndex.filter(_._1 > 0)
    if (used.length <= 2 && used.forall(_._2 < 256) &&
        (used.length < 2 || used.forall(_._1 == 1))) {
      bw.bits(1, 1) // simple
      bw.bits(used.length - 1, 1)
      val s0 = used.head._2
      if (s0 <= 1 && used.length == 1) { bw.bits(0, 1); bw.bits(s0, 1) }
      else { bw.bits(1, 1); bw.bits(s0, 8) }
      if (used.length == 2) bw.bits(used(1)._2, 8)
      return
    }
    bw.bits(0, 1) // full form
    val ops = scala.collection.mutable.ArrayBuffer[(Int, Int, Int)]() // (sym, extra, nbits)
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) == 0) {
        // zero runs compress via 17/18; TRAILING zeros too — without the
        // max-symbol shortcut the decoder keeps reading code-length
        // symbols until the whole alphabet is filled, so "the rest are
        // zero" must be said explicitly
        var run = 0
        while (i + run < lengths.length && lengths(i + run) == 0) run += 1
        var left = run
        while (left >= 11) {
          val take = math.min(138, left)
          ops += ((18, take - 11, 7)); left -= take
        }
        if (left >= 3) { ops += ((17, left - 3, 3)); left = 0 }
        while (left > 0) { ops += ((0, 0, 0)); left -= 1 }
        i += run
      } else { ops += ((lengths(i), 0, 0)); i += 1 }
    }
    val clcCounts = new Array[Int](19)
    ops.foreach { case (s, _, _) => clcCounts(s) += 1 }
    val clcLengths = huffmanLengths(clcCounts, limit = 7)
    var numClc = 19
    while (numClc > 4 && clcLengths(ClcOrder(numClc - 1)) == 0) numClc -= 1
    bw.bits(numClc - 4, 4)
    (0 until numClc).foreach(k => bw.bits(clcLengths(ClcOrder(k)), 3))
    bw.bits(0, 1) // no max-symbol shortcut
    val clcCodes = canonicalCodes(clcLengths)
    def putClc(sym: Int): Unit = {
      val (code, len) = clcCodes(sym)
      var j = len - 1
      while (j >= 0) { bw.bits((code >> j) & 1, 1); j -= 1 }
    }
    ops.foreach { case (s, extra, nbits) =>
      putClc(s)
      if (nbits > 0) bw.bits(extra, nbits)
    }
  }

  private final class SymbolWriter(bw: BitWriter, lengths: Array[Int]) {
    private val codes = canonicalCodes(lengths)
    private val single = lengths.count(_ > 0) == 1
    def put(sym: Int): Unit = {
      if (single) return // zero-bit degenerate code
      val (code, len) = codes(sym)
      var j = len - 1
      while (j >= 0) { bw.bits((code >> j) & 1, 1); j -= 1 }
    }
  }

  private sealed trait Tok
  private final case class Lit(argb: Int) extends Tok
  private final case class Ref(length: Int, dist: Int) extends Tok
  private final case class Hit(index: Int) extends Tok

  /** Tokenize + entropy-code one image (shared by the main image and
    * every sub-image the encoder writes). `metaSplitBits` > 0 writes a
    * two-group meta prefix split at the image's vertical midline
    * (block-aligned). Only the TOP-LEVEL image carries a meta-prefix
    * flag bit at all (spec: sub-images are `color-cache-info data`), so
    * `topLevel = false` emits no meta bit — mirroring the decoder. */
  private def writeEntropyImage(bw: BitWriter, w: Int, h: Int,
      px: Array[Int], cacheBits: Int, lz77: Boolean,
      metaSplitBits: Int = 0, topLevel: Boolean = false): Unit = {
    require(topLevel || metaSplitBits == 0,
      "meta prefix codes exist only in the top-level image")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val cacheValid = if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    val n = px.length

    val toks = scala.collection.mutable.ArrayBuffer[(Int, Tok)]() // (pos, tok)
    def insert(v: Int): Unit = if (cache != null) {
      val k = cacheKey(v, cacheBits); cache(k) = v; cacheValid(k) = true
    }
    var i = 0
    while (i < n) {
      var takenRef = false
      if (lz77 && i > 0) {
        val cands = if (i >= w) Seq(1, w) else Seq(1)
        val best = cands.map { d =>
          var len = 0
          while (i + len < n && len < 4096 && px(i + len) == px(i + len - d)) len += 1
          (len, d)
        }.maxBy(_._1)
        if (best._1 >= 3) {
          val (len, d) = best
          toks += ((i, Ref(len, d)))
          var k = 0
          while (k < len) { insert(px(i + k)); k += 1 }
          i += len
          takenRef = true
        }
      }
      if (!takenRef) {
        val v = px(i)
        val k = if (cache != null) cacheKey(v, cacheBits) else -1
        if (cache != null && cacheValid(k) && cache(k) == v) toks += ((i, Hit(k)))
        else { toks += ((i, Lit(v))); insert(v) }
        i += 1
      }
    }

    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) } else bw.bits(0, 1)

    // meta prefix: two groups split at the vertical midline (block-
    // aligned). When the image is too short for two block rows the
    // split degenerates to ONE group — the decoder derives the group
    // count from the meta image's max index, so the encoder must count
    // the same way or its second code group would desync the stream.
    val metaH =
      if (metaSplitBits > 0) (h + (1 << metaSplitBits) - 1) >> metaSplitBits else 0
    val metaHalf = (metaH + 1) / 2
    val numGroups = if (metaSplitBits > 0 && metaHalf < metaH) 2 else 1
    def groupOf(pos: Int): Int =
      if (numGroups == 1) 0
      else if (((pos / w) >> metaSplitBits) < metaHalf) 0 else 1
    if (metaSplitBits > 0) {
      bw.bits(1, 1)
      bw.bits(metaSplitBits - 2, 3)
      val mw = (w + (1 << metaSplitBits) - 1) >> metaSplitBits
      val metaPx = Array.tabulate(mw * metaH) { k =>
        val by = k / mw
        val g = if (numGroups == 1 || by < metaHalf) 0 else 1
        0xff000000 | (g << 8) // (red<<8)|green = g
      }
      writeEntropyImage(bw, mw, metaH, metaPx, cacheBits = 0, lz77 = false)
    } else if (topLevel) bw.bits(0, 1)

    // per-group histograms
    val greens = Array.fill(numGroups)(new Array[Int](GreenBase + cacheSize))
    val reds = Array.fill(numGroups)(new Array[Int](256))
    val blues = Array.fill(numGroups)(new Array[Int](256))
    val alphas = Array.fill(numGroups)(new Array[Int](256))
    val dists = Array.fill(numGroups)(new Array[Int](40))
    toks.foreach { case (pos, t) =>
      val gI = groupOf(pos)
      t match {
        case Lit(v) =>
          greens(gI)((v >> 8) & 0xff) += 1
          reds(gI)((v >> 16) & 0xff) += 1
          blues(gI)(v & 0xff) += 1
          alphas(gI)((v >>> 24) & 0xff) += 1
        case Ref(len, d) =>
          greens(gI)(256 + prefixEncode(len)._1) += 1
          dists(gI)(prefixEncode(d + 120)._1) += 1
        case Hit(ix) => greens(gI)(GreenBase + ix) += 1
      }
    }
    val writers = (0 until numGroups).map { gI =>
      Seq(greens(gI), reds(gI), blues(gI), alphas(gI), dists(gI)).map { c =>
        if (c.forall(_ == 0)) c(0) = 1 // zero-symbol codes are unrepresentable
        val lengths = huffmanLengths(c)
        writePrefixCode(bw, lengths)
        new SymbolWriter(bw, lengths)
      }
    }
    toks.foreach { case (pos, t) =>
      val ws = writers(groupOf(pos))
      t match {
        case Lit(v) =>
          ws(0).put((v >> 8) & 0xff)
          ws(1).put((v >> 16) & 0xff)
          ws(2).put(v & 0xff)
          ws(3).put((v >>> 24) & 0xff)
        case Ref(len, d) =>
          val (lc, le, ln) = prefixEncode(len)
          ws(0).put(256 + lc); bw.bits(le, ln)
          val (dc, de, dn) = prefixEncode(d + 120)
          ws(4).put(dc); bw.bits(de, dn)
        case Hit(ix) => ws(0).put(GreenBase + ix)
      }
    }
  }

  /** Encode ARGB pixels as VP8L (RIFF-wrapped).
    *  - `cacheBits` 0 disables the color cache;
    *  - `lz77` enables greedy run detection (distance 1 and width);
    *  - `subtractGreen` applies that transform;
    *  - `predictorBits` > 0 applies the predictor transform with the
    *    given block size bits (2..5), mode per block = block index % 14;
    *  - `colorBits` > 0 applies the cross-color transform with
    *    id-derived per-block coefficients;
    *  - `palette` = true encodes via color indexing (distinct colors
    *    must number ≤ 256; bundling applies below 17);
    *  - `metaSplitBits` > 0 writes a two-group meta prefix code split at
    *    the vertical midline. Palette composes with nothing else, like
    *    the decoder. */
  def encode(w: Int, h: Int, argbIn: Array[Int], cacheBits: Int = 0,
      lz77: Boolean = true, subtractGreen: Boolean = false,
      predictorBits: Int = 0, colorBits: Int = 0,
      palette: Boolean = false, metaSplitBits: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && argbIn.length == w * h)
    require(cacheBits >= 0 && cacheBits <= 11)
    require(!palette || (!subtractGreen && predictorBits == 0 && colorBits == 0),
      "palette composes with nothing else (decoder contract)")
    val bw = new BitWriter
    bw.bits(w - 1, 14); bw.bits(h - 1, 14)
    bw.bits(0, 1) // alpha hint
    bw.bits(0, 3) // version

    var px = argbIn
    var effW = w

    if (palette) {
      val colors = px.distinct
      require(colors.length <= 256, "palette fixtures need <= 256 colors")
      val index = colors.zipWithIndex.toMap
      bw.bits(1, 1); bw.bits(3, 2) // transform: color indexing
      bw.bits(colors.length - 1, 8)
      // palette entries are delta-coded pixels in their own entropy image
      val deltas = colors.zipWithIndex.map { case (c, k) =>
        if (k == 0) c else subPixels(c, colors(k - 1))
      }
      writeEntropyImage(bw, colors.length, 1, deltas, cacheBits = 0, lz77 = false)
      val wb = paletteWidthBits(colors.length)
      val bpp = 8 >> wb
      val perByte = 1 << wb
      effW = (w + perByte - 1) / perByte
      val packed = new Array[Int](effW * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val slot = y * effW + x / perByte
          val g = ((packed(slot) >> 8) & 0xff) |
            (index(px(y * w + x)) << (bpp * (x % perByte)))
          packed(slot) = 0xff000000 | (g << 8)
          x += 1
        }
        y += 1
      }
      px = packed
    } else {
      // Transform composition: headers are read in stream order and the
      // decoder applies INVERSES in reverse-of-read, so for the read
      // order [predictor, color, subtract-green] it computes
      // P⁻¹(C⁻¹(SG⁻¹(coded))) — the encoder must therefore produce
      // coded = SG(C(P(original))), i.e. apply forward transforms in
      // the SAME order it writes their headers. The roundtrip gate
      // pins this across all combinations.
      val emit = scala.collection.mutable.ArrayBuffer[Int]()
      if (predictorBits > 0) emit += 0
      if (colorBits > 0) emit += 1
      if (subtractGreen) emit += 2
      emit.foreach {
        case 2 =>
          bw.bits(1, 1); bw.bits(2, 2) // transform: subtract green
          px = px.map { v =>
            val g = (v >> 8) & 0xff
            val r = (((v >> 16) & 0xff) - g) & 0xff
            val b2 = ((v & 0xff) - g) & 0xff
            (v & 0xff000000) | (r << 16) | (g << 8) | b2
          }
        case 0 =>
          val bits = predictorBits
          val tw = (effW + (1 << bits) - 1) >> bits
          val th = (h + (1 << bits) - 1) >> bits
          val modes = Array.tabulate(tw * th)(k => k % 14)
          val out = new Array[Int](px.length)
          // residuals must be computed against the RECONSTRUCTED
          // neighborhood, which for a lossless forward pass is the
          // original pixels themselves
          var y = 0
          while (y < h) {
            var x = 0
            while (x < effW) {
              val mode = modes((y >> bits) * tw + (x >> bits))
              val i = y * effW + x
              out(i) = subPixels(px(i), predict(px, effW, x, y, mode))
              x += 1
            }
            y += 1
          }
          bw.bits(1, 1); bw.bits(0, 2)
          bw.bits(bits - 2, 3)
          val modeImg = modes.map(m => 0xff000000 | (m << 8))
          writeEntropyImage(bw, tw, th, modeImg, cacheBits = 0, lz77 = false)
          px = out
        case 1 =>
          val bits = colorBits
          val tw = (effW + (1 << bits) - 1) >> bits
          val th = (h + (1 << bits) - 1) >> bits
          // id-derived small signed coefficients per block
          val ctes = Array.tabulate(tw * th) { k =>
            val g2r = (k * 7 + 3) % 64
            val g2b = (k * 11 + 5) % 64
            val r2b = (k * 13 + 1) % 64
            0xff000000 | (r2b << 16) | (g2b << 8) | g2r
          }
          val out = new Array[Int](px.length)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < effW) {
              val cte = ctes((y >> bits) * tw + (x >> bits))
              out(y * effW + x) = forwardColorTransform(px(y * effW + x), cte)
              x += 1
            }
            y += 1
          }
          bw.bits(1, 1); bw.bits(1, 2)
          bw.bits(bits - 2, 3)
          writeEntropyImage(bw, tw, th, ctes, cacheBits = 0, lz77 = false)
          px = out
      }
    }
    bw.bits(0, 1) // no more transforms
    writeEntropyImage(bw, effW, h, px, cacheBits, lz77, metaSplitBits,
      topLevel = true)
    wrapRiff(Array[Byte](0x2f) ++ bw.finish())
  }
}
