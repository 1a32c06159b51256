package graft.operators

/** WebP lossy (VP8) key-frame decoder — the majority format of
  * real-crawl `.webp` (RFC 6386; WebP wraps a VP8 key frame per
  * https://developers.google.com/speed/webp/docs/riff_container).
  * Implements the public bitstream COMPLETELY for intra frames:
  *
  *  - the boolean arithmetic decoder (§7) and its encoder twin;
  *  - frame tag + start code + dimensions, first-partition header (§9):
  *    segmentation (map + per-segment quant/filter data), loop-filter
  *    parameters with ref/mode deltas, token-partition count, the five
  *    quantizer indices, coefficient-probability updates, skip flag;
  *  - per-macroblock intra mode decoding: keyframe Y modes, B_PRED
  *    sub-modes with above/left context trees, chroma modes (§11);
  *  - residual token decoding (§13): the DCT token tree over
  *    [plane][band][context] probabilities, extra-bit categories,
  *    zigzag, per-segment dequantization with the Y2/UV scaling rules;
  *  - reconstruction (§14): inverse WHT for Y2, the exact integer 4x4
  *    IDCT, and every intra predictor — 16x16 DC/V/H/TM with their
  *    edge special cases, all ten 4x4 B_PRED modes, 8x8 chroma;
  *  - the loop filter (§15), both simple and normal, with the
  *    per-macroblock filter-level derivation (segments + deltas) and
  *    the MB-edge / subblock-edge, horizontal / vertical variants.
  *
  * Interlaced VP8X containers, alpha chunks, and non-key frames reject
  * by name (a crawl decodes stills; animation/alpha are the disclosed
  * remainder).
  *
  * Exactness strategy (the q105 pattern): the fixture encoder emits
  * DC-only residuals at quantizer index 0 (dc step 4, y2-dc step 8),
  * where dequant + IWHT + IDCT are exact integer identities — so the
  * decoder must reproduce the target image BIT-FOR-BIT, and the oracle
  * replays every pixel from the id formula. The prediction modes used
  * by fixtures (DC/V/H/TM at both the 16x16 and 4x4 levels) produce
  * constant predictions over constant-per-block neighborhoods, which
  * is what makes the closed form possible. Beyond the fixture paths,
  * the WHOLE decoder — probability updates, segmentation as a real
  * encoder emits it, every intra mode, the loop filter — is pinned
  * BIT-FOR-BIT against the reference implementation: Vp8InteropSpec
  * decodes checked-in files produced by the system libwebp and
  * compares against libwebp's own YUV output
  * (tools/make_webp_fixtures.py).
  */
object Vp8 {

  final case class Rejected(reason: String)
  private final class Bail(val reason: String) extends RuntimeException(reason)
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // ---- boolean coder (RFC 6386 §7) ----

  private[operators] final class BoolDecoder(b: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var range = 255
    private var value = 0
    private var bitCount = 0 // bits still valid in value's low byte window
    private var past = 0
    /** Bytes requested beyond the partition end. The encoder's flush
      * legitimately leaves the last few bits covered by virtual zeros,
      * so small overreads are normal; large ones mean truncation. */
    def pastEnd: Int = past
    // init: load two bytes
    value = nextByte() << 8 | nextByte()
    private def nextByte(): Int =
      if (pos < until) { val v = b(pos) & 0xff; pos += 1; v }
      else { past += 1; 0 }
    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) { bitCount = 0; value |= nextByte() }
      }
      ret
    }
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }
    /** Sign-magnitude literal: n magnitude bits then a sign bit. */
    def signedLiteral(n: Int): Int = {
      val mag = literal(n)
      if (bool(128) == 1) -mag else mag
    }
    /** Walk a token tree: negative entries are leaves (~symbol). */
    def tree(t: Array[Int], probs: Array[Int], start: Int = 0): Int = {
      var i = start
      while (true) {
        i = t(i + bool(probs(i >> 1)))
        if (i <= 0) return -i
      }
      0
    }
  }

  private[operators] final class BoolEncoder {
    private val out = new java.io.ByteArrayOutputStream()
    private var range = 255
    private var bottom = 0L
    private var bitCount = 24
    private def addOne(): Unit = {
      // carry propagation into already-emitted bytes
      val bytes = out.toByteArray
      var i = bytes.length - 1
      var carry = true
      while (carry && i >= 0) {
        if ((bytes(i) & 0xff) == 0xff) { bytes(i) = 0; i -= 1 }
        else { bytes(i) = (bytes(i) + 1).toByte; carry = false }
      }
      out.reset(); out.write(bytes, 0, bytes.length)
    }
    def bool(prob: Int, v: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (v == 1) { bottom += split; range -= split }
      else range = split
      while (range < 128) {
        if ((bottom & (1L << 31)) != 0) addOne()
        bottom = (bottom << 1) & 0xffffffffL
        range <<= 1
        bitCount -= 1
        if (bitCount == 0) {
          out.write(((bottom >> 24) & 0xff).toInt)
          bottom &= 0xffffff
          bitCount = 8
        }
      }
    }
    def literal(n: Int, v: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool(128, (v >> i) & 1); i -= 1 }
    }
    def signedLiteral(n: Int, v: Int): Unit = {
      literal(n, math.abs(v))
      bool(128, if (v < 0) 1 else 0)
    }
    def tree(t: Array[Int], probs: Array[Int], symbol: Int,
        start: Int = 0): Unit = {
      // walk to the leaf, recording branch bits; `i` is always a NODE
      // index (entries <= 0 are leaves, > 0 are child node indexes —
      // index 0 doubles as the root node, so leaf-ness is decided on
      // the CHILD value, mirroring the decoder's transition test)
      val bits = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      def walk(i: Int): Boolean = {
        var side = 0
        while (side < 2) {
          bits += ((i >> 1, side))
          val next = t(i + side)
          val hit = if (next <= 0) -next == symbol else walk(next)
          if (hit) return true
          bits.remove(bits.length - 1)
          side += 1
        }
        false
      }
      if (!walk(start)) throw new IllegalArgumentException(s"symbol $symbol not in tree")
      bits.foreach { case (p, bit) => bool(probs(p), bit) }
    }
    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { // flush
        if ((bottom & (1L << 31)) != 0) addOne()
        bottom = (bottom << 1) & 0xffffffffL
        bitCount -= 1
        if (bitCount == 0) {
          out.write(((bottom >> 24) & 0xff).toInt)
          bottom &= 0xffffff
          bitCount = 8
        }
        i += 1
      }
      out.toByteArray
    }
  }

  // ---- trees and default probabilities (RFC 6386 §11.2, §13.2-13.5) ----

  // keyframe Y mode: leaves DC=0,V=1,H=2,TM=3,B_PRED=4
  private val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  private val KfYModeProb = Array(145, 156, 163, 128)
  // chroma mode: DC,V,H,TM
  private val UvModeTree = Array(-0, 2, -1, 4, -2, -3)
  private val KfUvModeProb = Array(142, 114, 183)
  // 4x4 b modes: B_DC=0,B_TM=1,B_VE=2,B_HE=3,B_LD=4,B_RD=5,B_VR=6,B_VL=7,B_HD=8,B_HU=9
  private val BModeTree = Array(
    -0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
  // kf_bmode_prob[above][left][9], default/update coefficient probs and
  // quantizer lookups live in Vp8Tables (extracted byte-exactly from the
  // public reference tables; see tools/extract_vp8_tables.py)
  private val KfBModeProb = Vp8Tables.KfBModeProb

  // DCT token tree (§13.2): ZERO=0, ONE=1, TWO=2, THREE=3, FOUR=4,
  // CAT1..CAT6=5..10, EOB=11
  private val CoefTree = Array(
    -11, 2, // EOB
    -0, 4, // ZERO
    -1, 6, // ONE
    8, 12,
    -2, 10, // TWO
    -3, -4, // THREE FOUR
    14, 16,
    -5, -6, // CAT1 CAT2
    18, 20,
    -7, -8, // CAT3 CAT4
    -9, -10) // CAT5 CAT6
  private val CatBase = Array(5, 7, 11, 19, 35, 67)
  private val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))

  private val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)
  private val CoefBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  /** default_coeff_probs[type 4][band 8][ctx 3][prob 11] (§13.5). */
  private[operators] val DefaultCoeffProbs = Vp8Tables.DefaultCoeffProbs

  /** coeff_update_probs[4][8][3][11] (§13.4) — the probability that each
    * coefficient probability is updated in the header. */
  private[operators] val CoeffUpdateProbs: Array[Array[Array[Array[Int]]]] =
    graft.operators.Vp8Tables.CoeffUpdateProbs

  // quantizer lookup tables (§14.1)
  private val DcQLookup = Vp8Tables.DcQLookup
  private val AcQLookup = Vp8Tables.AcQLookup

  private def clamp127(v: Int): Int = math.max(0, math.min(127, v))
  private def clampQ(v: Int): Int = math.max(0, math.min(127, v))
  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- transforms (§14.3, §14.4) ----

  /** Inverse WHT: distributes the Y2 block into the 16 luma DCs. */
  private[operators] def inverseWht(in: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(12 + i)
      val b1 = in(4 + i) + in(8 + i)
      val c1 = in(4 + i) - in(8 + i)
      val d1 = in(i) - in(12 + i)
      t(i) = a1 + b1
      t(4 + i) = c1 + d1
      t(8 + i) = a1 - b1
      t(12 + i) = d1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val base = i * 4
      val a1 = t(base) + t(base + 3)
      val b1 = t(base + 1) + t(base + 2)
      val c1 = t(base + 1) - t(base + 2)
      val d1 = t(base) - t(base + 3)
      val a2 = a1 + b1 + 3
      val b2 = c1 + d1
      val c2 = a1 - b1
      val d2 = d1 - c1
      out(base) = a2 >> 3
      out(base + 1) = (b2 + 3) >> 3
      out(base + 2) = (c2 + 3) >> 3
      out(base + 3) = (d2 + 3) >> 3
      i += 1
    }
    out
  }

  private val Cos = 20091 // (sqrt(2)cos(pi/8) - 1) in Q16
  private val Sin = 35468 // sqrt(2)sin(pi/8) in Q16

  /** The exact integer 4x4 IDCT (§14.4). */
  private[operators] def idct4x4(in: Array[Int]): Array[Int] = {
    val t = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(8 + i)
      val b1 = in(i) - in(8 + i)
      val temp1 = (in(4 + i) * Sin) >> 16
      val temp2 = in(12 + i) + ((in(12 + i) * Cos) >> 16)
      val c1 = temp1 - temp2
      val temp3 = in(4 + i) + ((in(4 + i) * Cos) >> 16)
      val temp4 = (in(12 + i) * Sin) >> 16
      val d1 = temp3 + temp4
      t(i) = a1 + d1
      t(12 + i) = a1 - d1
      t(4 + i) = b1 + c1
      t(8 + i) = b1 - c1
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val base = i * 4
      val a1 = t(base) + t(base + 2)
      val b1 = t(base) - t(base + 2)
      val temp1 = (t(base + 1) * Sin) >> 16
      val temp2 = t(base + 3) + ((t(base + 3) * Cos) >> 16)
      val c1 = temp1 - temp2
      val temp3 = t(base + 1) + ((t(base + 1) * Cos) >> 16)
      val temp4 = (t(base + 3) * Sin) >> 16
      val d1 = temp3 + temp4
      out(base) = (a1 + d1 + 4) >> 3
      out(base + 3) = (a1 - d1 + 4) >> 3
      out(base + 1) = (b1 + c1 + 4) >> 3
      out(base + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
    out
  }

  // ---- decoded frame ----

  /** Decoded YUV 4:2:0 planes, cropped to the declared dimensions
    * (chroma is ceil(w/2) x ceil(h/2)); `alpha` is the w x h plane from
    * an ALPH chunk when the container carries one. */
  final case class Yuv(w: Int, h: Int,
      y: Array[Byte], u: Array[Byte], v: Array[Byte],
      alpha: Option[Array[Byte]] = None) {
    def uvW: Int = (w + 1) / 2
    def uvH: Int = (h + 1) / 2
  }

  // ---- frame header state ----

  private final class Header {
    var segEnabled = false
    var segUpdateMap = false
    var segAbs = false
    val segQuant = new Array[Int](4)
    val segLf = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    var filterType = 0 // 0 = normal, 1 = simple
    var filterLevel = 0
    var sharpness = 0
    var lfDeltaEnabled = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    var nParts = 1
    var yacQi = 0
    var y1dcDelta = 0
    var y2dcDelta = 0; var y2acDelta = 0
    var uvdcDelta = 0; var uvacDelta = 0
    var skipEnabled = false
    var skipProb = 0
    // live coefficient probabilities (defaults, then header updates)
    val coeffProbs: Array[Array[Array[Array[Int]]]] =
      DefaultCoeffProbs.map(_.map(_.map(_.clone())))
  }

  /** Per-segment dequant factors: (y1dc, y1ac, y2dc, y2ac, uvdc, uvac). */
  private def dequantFor(h: Header, seg: Int): Array[Int] = {
    val base =
      if (h.segEnabled) {
        if (h.segAbs) h.segQuant(seg) else h.yacQi + h.segQuant(seg)
      } else h.yacQi
    val q = clampQ(base)
    val y2ac = math.max(8, AcQLookup(clampQ(q + h.y2acDelta)) * 155 / 100)
    Array(
      DcQLookup(clampQ(q + h.y1dcDelta)),
      AcQLookup(q),
      DcQLookup(clampQ(q + h.y2dcDelta)) * 2,
      y2ac,
      DcQLookup(math.min(117, clampQ(q + h.uvdcDelta))),
      AcQLookup(clampQ(q + h.uvacDelta)))
  }

  private def parseHeader(bd: BoolDecoder): Header = {
    val h = new Header
    bd.bool(128) // color space (0 for the profiles webp uses)
    bd.bool(128) // clamping type
    h.segEnabled = bd.bool(128) == 1
    if (h.segEnabled) {
      h.segUpdateMap = bd.bool(128) == 1
      val updateData = bd.bool(128) == 1
      if (updateData) {
        h.segAbs = bd.bool(128) == 1
        var i = 0
        while (i < 4) {
          if (bd.bool(128) == 1) h.segQuant(i) = bd.signedLiteral(7)
          i += 1
        }
        i = 0
        while (i < 4) {
          if (bd.bool(128) == 1) h.segLf(i) = bd.signedLiteral(6)
          i += 1
        }
      }
      if (h.segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bool(128) == 1) h.segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }
    h.filterType = bd.bool(128)
    h.filterLevel = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lfDeltaEnabled = bd.bool(128) == 1
    if (h.lfDeltaEnabled && bd.bool(128) == 1) { // delta update
      var i = 0
      while (i < 4) {
        if (bd.bool(128) == 1) h.refLfDelta(i) = bd.signedLiteral(6)
        i += 1
      }
      i = 0
      while (i < 4) {
        if (bd.bool(128) == 1) h.modeLfDelta(i) = bd.signedLiteral(6)
        i += 1
      }
    }
    h.nParts = 1 << bd.literal(2)
    h.yacQi = bd.literal(7)
    def delta(): Int = if (bd.bool(128) == 1) bd.signedLiteral(4) else 0
    h.y1dcDelta = delta()
    h.y2dcDelta = delta(); h.y2acDelta = delta()
    h.uvdcDelta = delta(); h.uvacDelta = delta()
    bd.bool(128) // refresh_entropy_probs (keyframe: no effect here)
    // coefficient probability updates
    var t = 0
    while (t < 4) {
      var b = 0
      while (b < 8) {
        var c = 0
        while (c < 3) {
          var p = 0
          while (p < 11) {
            if (bd.bool(CoeffUpdateProbs(t)(b)(c)(p)) == 1)
              h.coeffProbs(t)(b)(c)(p) = bd.literal(8)
            p += 1
          }
          c += 1
        }
        b += 1
      }
      t += 1
    }
    h.skipEnabled = bd.bool(128) == 1
    if (h.skipEnabled) h.skipProb = bd.literal(8)
    h
  }

  // ---- per-MB info ----



  private final class MbInfo {
    var ymode = 0 // 0 DC,1 V,2 H,3 TM,4 B_PRED
    var uvmode = 0
    val bmodes = new Array[Int](16)
    var segment = 0
    var skip = false
    var hasCoeffs = false
  }

  /** Implied 4x4 mode of a 16x16-mode MB for b-mode context. */
  private def impliedBMode(ymode: Int): Int = ymode match {
    case 0 => 0 // DC -> B_DC
    case 1 => 2 // V -> B_VE
    case 2 => 3 // H -> B_HE
    case _ => 1 // TM -> B_TM
  }

  // ---- token decoding (§13.3) ----

  /** Decode one block's coefficients into `coeffs` (dequantized, natural
    * order). Returns the end-of-block position n (tokens were decoded
    * for coefficients firstCoeff..n-1); n > firstCoeff is the "block
    * has coefficients" flag the contexts use. `firstCoeff` is 1 for
    * Y-after-Y2. `ctx0` in 0..2. */
  private def decodeCoeffs(bd: BoolDecoder, probs: Array[Array[Array[Int]]],
      firstCoeff: Int, ctx0: Int, dqDc: Int, dqAc: Int,
      coeffs: Array[Int]): Int = {
    var n = firstCoeff
    var ctx = ctx0
    var skipEob = false
    while (n < 16) {
      val band = CoefBands(n)
      val p = probs(band)(ctx)
      // after a ZERO token the EOB branch is skipped (start at node 2)
      val tok = bd.tree(CoefTree, p, if (skipEob) 2 else 0)
      if (tok == 11) return n // EOB
      if (tok == 0) {
        ctx = 0
        skipEob = true
        n += 1
      } else {
        val v =
          if (tok <= 4) tok
          else {
            val cat = tok - 5
            val cp = CatProbs(cat)
            var extra = 0
            var i = 0
            while (i < cp.length) { extra = (extra << 1) | bd.bool(cp(i)); i += 1 }
            CatBase(cat) + extra
          }
        val signed = if (bd.bool(128) == 1) -v else v
        val dq = if (n == 0) dqDc else dqAc
        coeffs(Zigzag(n)) = signed * dq
        ctx = if (v == 1) 1 else 2
        skipEob = false
        n += 1
      }
    }
    n
  }

  // ---- intra prediction ----

  /** A reconstruction plane padded to whole macroblocks, with the VP8
    * virtual borders: row -1 reads 127, column -1 reads 129, corner
    * (-1,-1) reads 127. */
  private final class Plane(val w: Int, val h: Int) {
    val a = new Array[Byte](w * h)
    def apply(x: Int, y: Int): Int =
      if (y < 0) 127
      else if (x < 0) 129
      else a((if (y >= h) h - 1 else y) * w + (if (x >= w) w - 1 else x)) & 0xff
    def set(x: Int, y: Int, v: Int): Unit = a(y * w + x) = v.toByte
  }

  private def pred16(plane: Plane, mx: Int, my: Int, mode: Int, size: Int,
      out: Array[Int]): Unit = {
    val x0 = mx * size; val y0 = my * size
    val hasAbove = my > 0
    val hasLeft = mx > 0
    mode match {
      case 0 => // DC with availability special cases
        var sum = 0
        var n = 0
        if (hasAbove) { var i = 0; while (i < size) { sum += plane(x0 + i, y0 - 1); i += 1 }; n += size }
        if (hasLeft) { var i = 0; while (i < size) { sum += plane(x0 - 1, y0 + i); i += 1 }; n += size }
        val dc = if (n == 0) 128 else (sum + n / 2) >> (if (n == size) (if (size == 16) 4 else 3) else (if (size == 16) 5 else 4))
        java.util.Arrays.fill(out, dc)
      case 1 => // V
        var c = 0
        while (c < size) {
          val v = plane(x0 + c, y0 - 1)
          var r = 0
          while (r < size) { out(r * size + c) = v; r += 1 }
          c += 1
        }
      case 2 => // H
        var r = 0
        while (r < size) {
          val v = plane(x0 - 1, y0 + r)
          var c = 0
          while (c < size) { out(r * size + c) = v; c += 1 }
          r += 1
        }
      case _ => // TM
        val al = plane(x0 - 1, y0 - 1)
        var r = 0
        while (r < size) {
          val l = plane(x0 - 1, y0 + r)
          var c = 0
          while (c < size) {
            out(r * size + c) = clamp255(l + plane(x0 + c, y0 - 1) - al)
            c += 1
          }
          r += 1
        }
    }
  }

  /** 4x4 B_PRED prediction for the subblock at pixel (x0, y0) of the
    * luma plane. `arOverride` supplies the above-right 4 pixels for
    * right-edge subblocks (the VP8 quirk: they come from the row above
    * the MACROBLOCK, not the not-yet-decoded right neighbor). */
  private def predB(pl: Plane, x0: Int, y0: Int, mode: Int,
      ar: Array[Int], out: Array[Int]): Unit = {
    val a = new Array[Int](8)
    var i = 0
    while (i < 4) { a(i) = pl(x0 + i, y0 - 1); i += 1 }
    i = 0
    while (i < 4) { a(4 + i) = ar(i); i += 1 }
    val l = new Array[Int](4)
    i = 0
    while (i < 4) { l(i) = pl(x0 - 1, y0 + i); i += 1 }
    val x = pl(x0 - 1, y0 - 1)
    def s3(p0: Int, p1: Int, p2: Int): Int = (p0 + 2 * p1 + p2 + 2) >> 2
    def s2(p0: Int, p1: Int): Int = (p0 + p1 + 1) >> 1
    def fill(f: (Int, Int) => Int): Unit = {
      var r = 0
      while (r < 4) {
        var c = 0
        while (c < 4) { out(r * 4 + c) = f(r, c); c += 1 }
        r += 1
      }
    }
    mode match {
      case 0 => // B_DC: always averages the (virtual) 8 neighbors
        val dc = (a(0) + a(1) + a(2) + a(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
        fill((_, _) => dc)
      case 1 => fill((r, c) => clamp255(l(r) + a(c) - x)) // B_TM
      case 2 => // B_VE
        val p = Array(s3(x, a(0), a(1)), s3(a(0), a(1), a(2)),
          s3(a(1), a(2), a(3)), s3(a(2), a(3), a(4)))
        fill((_, c) => p(c))
      case 3 => // B_HE
        val p = Array(s3(x, l(0), l(1)), s3(l(0), l(1), l(2)),
          s3(l(1), l(2), l(3)), s3(l(2), l(3), l(3)))
        fill((r, _) => p(r))
      case 4 => // B_LD
        fill { (r, c) =>
          val k = r + c
          if (k < 6) s3(a(k), a(k + 1), a(k + 2)) else s3(a(6), a(7), a(7))
        }
      case 5 => // B_RD
        val pp = Array(l(3), l(2), l(1), l(0), x, a(0), a(1), a(2), a(3))
        fill((r, c) => s3(pp(3 - r + c), pp(3 - r + c + 1), pp(3 - r + c + 2)))
      case 6 => // B_VR
        val pp = Array(l(3), l(2), l(1), l(0), x, a(0), a(1), a(2), a(3))
        val m = Array.ofDim[Int](4, 4)
        m(3)(0) = s3(pp(1), pp(2), pp(3))
        m(2)(0) = s3(pp(2), pp(3), pp(4))
        m(3)(1) = s3(pp(3), pp(4), pp(5)); m(1)(0) = m(3)(1)
        m(2)(1) = s2(pp(4), pp(5)); m(0)(0) = m(2)(1)
        m(3)(2) = s3(pp(4), pp(5), pp(6)); m(1)(1) = m(3)(2)
        m(2)(2) = s2(pp(5), pp(6)); m(0)(1) = m(2)(2)
        m(3)(3) = s3(pp(5), pp(6), pp(7)); m(1)(2) = m(3)(3)
        m(2)(3) = s2(pp(6), pp(7)); m(0)(2) = m(2)(3)
        m(1)(3) = s3(pp(6), pp(7), pp(8))
        m(0)(3) = s2(pp(7), pp(8))
        fill((r, c) => m(r)(c))
      case 7 => // B_VL
        val m = Array.ofDim[Int](4, 4)
        m(0)(0) = s2(a(0), a(1))
        m(1)(0) = s3(a(0), a(1), a(2))
        m(2)(0) = s2(a(1), a(2)); m(0)(1) = m(2)(0)
        m(3)(0) = s3(a(1), a(2), a(3)); m(1)(1) = m(3)(0)
        m(2)(1) = s2(a(2), a(3)); m(0)(2) = m(2)(1)
        m(3)(1) = s3(a(2), a(3), a(4)); m(1)(2) = m(3)(1)
        m(2)(2) = s2(a(3), a(4)); m(0)(3) = m(2)(2)
        m(3)(2) = s3(a(3), a(4), a(5)); m(1)(3) = m(3)(2)
        m(2)(3) = s3(a(4), a(5), a(6))
        m(3)(3) = s3(a(5), a(6), a(7))
        fill((r, c) => m(r)(c))
      case 8 => // B_HD
        val pp = Array(l(3), l(2), l(1), l(0), x, a(0), a(1), a(2))
        val m = Array.ofDim[Int](4, 4)
        m(3)(0) = s2(pp(0), pp(1))
        m(3)(1) = s3(pp(0), pp(1), pp(2))
        m(2)(0) = s2(pp(1), pp(2)); m(3)(2) = m(2)(0)
        m(2)(1) = s3(pp(1), pp(2), pp(3)); m(3)(3) = m(2)(1)
        m(1)(0) = s2(pp(2), pp(3)); m(2)(2) = m(1)(0)
        m(1)(1) = s3(pp(2), pp(3), pp(4)); m(2)(3) = m(1)(1)
        m(0)(0) = s2(pp(3), pp(4)); m(1)(2) = m(0)(0)
        m(0)(1) = s3(pp(3), pp(4), pp(5)); m(1)(3) = m(0)(1)
        m(0)(2) = s3(pp(4), pp(5), pp(6))
        m(0)(3) = s3(pp(5), pp(6), pp(7))
        fill((r, c) => m(r)(c))
      case _ => // B_HU
        val m = Array.ofDim[Int](4, 4)
        m(0)(0) = s2(l(0), l(1))
        m(0)(1) = s3(l(0), l(1), l(2))
        m(0)(2) = s2(l(1), l(2)); m(1)(0) = m(0)(2)
        m(0)(3) = s3(l(1), l(2), l(3)); m(1)(1) = m(0)(3)
        m(1)(2) = s2(l(2), l(3)); m(2)(0) = m(1)(2)
        m(1)(3) = s3(l(2), l(3), l(3)); m(2)(1) = m(1)(3)
        m(2)(2) = l(3); m(2)(3) = l(3)
        m(3)(0) = l(3); m(3)(1) = l(3); m(3)(2) = l(3); m(3)(3) = l(3)
        fill((r, c) => m(r)(c))
    }
  }

  // ---- loop filter (§15) ----

  private def s8(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v
  private def u2s(v: Int): Int = v - 128
  private def s2u(v: Int): Int = clamp255(v + 128)

  /** One filtered segment: pixels at p +/- k*step around the edge. */
  private def filterEdge(a: Array[Byte], pos: Int, step: Int,
      mbEdge: Boolean, interior: Int, edgeLimit: Int, hevT: Int,
      simple: Boolean): Unit = {
    def px(k: Int): Int = a(pos + k * step) & 0xff
    def set(k: Int, v: Int): Unit = a(pos + k * step) = v.toByte
    val p3 = px(-4); val p2 = px(-3); val p1 = px(-2); val p0 = px(-1)
    val q0 = px(0); val q1 = px(1); val q2 = px(2); val q3 = px(3)
    def abs(v: Int) = math.abs(v)
    if (simple) {
      if (abs(p0 - q0) * 2 + abs(p1 - q1) / 2 <= edgeLimit) {
        val sp1 = u2s(p1); val sp0 = u2s(p0); val sq0 = u2s(q0); val sq1 = u2s(q1)
        val a0 = s8(s8(sp1 - sq1) + 3 * (sq0 - sp0))
        val f1 = s8(a0 + 4) >> 3
        val f2 = s8(a0 + 3) >> 3
        set(0, s2u(sq0 - f1))
        set(-1, s2u(sp0 + f2))
      }
      return
    }
    val mask =
      abs(p0 - q0) * 2 + abs(p1 - q1) / 2 <= edgeLimit &&
        abs(p3 - p2) <= interior && abs(p2 - p1) <= interior &&
        abs(p1 - p0) <= interior && abs(q1 - q0) <= interior &&
        abs(q2 - q1) <= interior && abs(q3 - q2) <= interior
    if (!mask) return
    val hev = abs(p1 - p0) > hevT || abs(q1 - q0) > hevT
    val sp2 = u2s(p2); val sp1 = u2s(p1); val sp0 = u2s(p0)
    val sq0 = u2s(q0); val sq1 = u2s(q1); val sq2 = u2s(q2)
    if (!mbEdge) {
      // subblock edge: common adjustment, outer taps only without hev
      val base = if (hev) s8(sp1 - sq1) else 0
      val a0 = s8(base + 3 * (sq0 - sp0))
      val f1 = s8(a0 + 4) >> 3
      val f2 = s8(a0 + 3) >> 3
      var nq0 = sq0 - f1
      var np0 = sp0 + f2
      set(0, s2u(nq0)); set(-1, s2u(np0))
      if (!hev) {
        val a2 = (f1 + 1) >> 1
        set(1, s2u(sq1 - a2)); set(-2, s2u(sp1 + a2))
      }
    } else {
      if (hev) {
        val a0 = s8(s8(sp1 - sq1) + 3 * (sq0 - sp0))
        val f1 = s8(a0 + 4) >> 3
        val f2 = s8(a0 + 3) >> 3
        set(0, s2u(sq0 - f1)); set(-1, s2u(sp0 + f2))
      } else {
        val w = s8(s8(sp1 - sq1) + 3 * (sq0 - sp0))
        var af = (27 * w + 63) >> 7
        set(0, s2u(sq0 - af)); set(-1, s2u(sp0 + af))
        af = (18 * w + 63) >> 7
        set(1, s2u(sq1 - af)); set(-2, s2u(sp1 + af))
        af = (9 * w + 63) >> 7
        set(2, s2u(sq2 - af)); set(-3, s2u(sp2 + af))
      }
    }
  }

  /** Frame loop filter, raster MB order; per MB: left edge, inner
    * vertical edges, top edge, inner horizontal edges. */
  private def loopFilter(h: Header, mbW: Int, mbH: Int, mbs: Array[MbInfo],
      yp: Plane, up: Plane, vp: Plane): Unit = {
    if (h.filterLevel == 0) return
    val simple = h.filterType == 1
    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        val mb = mbs(my * mbW + mx)
        var level =
          if (h.segEnabled) {
            if (h.segAbs) h.segLf(mb.segment) else h.filterLevel + h.segLf(mb.segment)
          } else h.filterLevel
        if (h.lfDeltaEnabled) {
          level += h.refLfDelta(0) // keyframes reference INTRA (index 0)
          if (mb.ymode == 4) level += h.modeLfDelta(0) // B_PRED delta
        }
        level = math.max(0, math.min(63, level))
        if (level > 0) {
          var interior = level
          if (h.sharpness > 0) {
            interior >>= (if (h.sharpness > 4) 2 else 1)
            if (interior > 9 - h.sharpness) interior = 9 - h.sharpness
          }
          if (interior < 1) interior = 1
          val hevT = if (level >= 40) 2 else if (level >= 15) 1 else 0
          val mbLimit = (level + 2) * 2 + interior
          val sbLimit = level * 2 + interior
          val inner = mb.hasCoeffs || mb.ymode == 4
          val y0 = my * 16; val x0 = mx * 16
          def vEdgeY(x: Int, mbEdge: Boolean, limit: Int): Unit = {
            var r = 0
            while (r < 16) {
              filterEdge(yp.a, (y0 + r) * yp.w + x, 1, mbEdge, interior,
                limit, hevT, simple)
              r += 1
            }
          }
          def hEdgeY(y: Int, mbEdge: Boolean, limit: Int): Unit = {
            var c = 0
            while (c < 16) {
              filterEdge(yp.a, y * yp.w + x0 + c, yp.w, mbEdge, interior,
                limit, hevT, simple)
              c += 1
            }
          }
          def vEdgeUv(x: Int, mbEdge: Boolean, limit: Int): Unit = {
            var r = 0
            while (r < 8) {
              filterEdge(up.a, (my * 8 + r) * up.w + x, 1, mbEdge, interior,
                limit, hevT, simple)
              filterEdge(vp.a, (my * 8 + r) * vp.w + x, 1, mbEdge, interior,
                limit, hevT, simple)
              r += 1
            }
          }
          def hEdgeUv(y: Int, mbEdge: Boolean, limit: Int): Unit = {
            var c = 0
            while (c < 8) {
              filterEdge(up.a, y * up.w + mx * 8 + c, up.w, mbEdge, interior,
                limit, hevT, simple)
              filterEdge(vp.a, y * vp.w + mx * 8 + c, vp.w, mbEdge, interior,
                limit, hevT, simple)
              c += 1
            }
          }
          if (mx > 0) {
            vEdgeY(x0, mbEdge = true, mbLimit)
            if (!simple) vEdgeUv(mx * 8, mbEdge = true, mbLimit)
          }
          if (inner) {
            var k = 4
            while (k < 16) {
              vEdgeY(x0 + k, mbEdge = false, sbLimit)
              k += 4
            }
            if (!simple) vEdgeUv(mx * 8 + 4, mbEdge = false, sbLimit)
          }
          if (my > 0) {
            hEdgeY(y0, mbEdge = true, mbLimit)
            if (!simple) hEdgeUv(my * 8, mbEdge = true, mbLimit)
          }
          if (inner) {
            var k = 4
            while (k < 16) {
              hEdgeY(y0 + k, mbEdge = false, sbLimit)
              k += 4
            }
            if (!simple) hEdgeUv(my * 8 + 4, mbEdge = false, sbLimit)
          }
        }
        mx += 1
      }
      my += 1
    }
  }

  // ---- RIFF container ----

  /** The container's lossy payload: the VP8 chunk plus the ALPH chunk
    * when transparency is present. VP8X extended containers holding a
    * STILL (metadata chunks like EXIF/XMP/ICCP; alpha via ALPH) unwrap;
    * animation rejects by name, as do lossless streams (Vp8l's entry
    * point handles those). */
  final case class LossyChunks(vp8: Array[Byte], alph: Option[Array[Byte]])

  def unwrapRiff(b: Array[Byte]): Either[Rejected, LossyChunks] = {
    def fourcc(o: Int) = new String(b, o, 4, "US-ASCII")
    def u32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (b.length < 20 || fourcc(0) != "RIFF" || fourcc(8) != "WEBP")
      return Left(Rejected("bad_container"))
    fourcc(12) match {
      case "VP8 " =>
        val n = u32(16)
        if (n < 0 || 20 + n > b.length) return Left(Rejected("truncated_chunk"))
        Right(LossyChunks(java.util.Arrays.copyOfRange(b, 20, 20 + n), None))
      case "VP8L" => Left(Rejected("lossless_stream")) // Vp8l handles these
      case "VP8X" =>
        val n = u32(16)
        if (n < 10 || 20 + n > b.length) return Left(Rejected("truncated_chunk"))
        val flags = u32(20) // LE; high 8 bits are reserved in byte order
        // container-spec flag bits (libwebp mux constants): ICC 0x20,
        // alpha 0x10, EXIF 0x08, XMP 0x04, animation 0x02
        if ((flags & 0x02) != 0) return Left(Rejected("vp8x_animation_unsupported"))
        // walk chunks after the VP8X payload: an optional ALPH chunk
        // precedes the image chunk; metadata (EXIF/XMP/ICCP) skips
        var o = 20 + n + (n & 1)
        var alph: Option[Array[Byte]] = None
        while (o + 8 <= b.length) {
          val cc = fourcc(o)
          val size = u32(o + 4)
          if (size < 0 || o + 8 + size > b.length)
            return Left(Rejected("truncated_chunk"))
          cc match {
            case "VP8 " =>
              return Right(LossyChunks(
                java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size), alph))
            case "VP8L" => return Left(Rejected("lossless_stream"))
            case "ALPH" =>
              alph = Some(java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size))
              o += 8 + size + (size & 1)
            case "ANIM" | "ANMF" =>
              return Left(Rejected("vp8x_animation_unsupported"))
            case _ => o += 8 + size + (size & 1) // EXIF/XMP/ICCP/unknown
          }
        }
        Left(Rejected("vp8x_no_image_chunk"))
      case _ => Left(Rejected("bad_container"))
    }
  }

  /** A metadata chunk ("EXIF", "XMP ", "ICCP") from a VP8X container —
    * EXIF payloads feed [[Exif.exifFromTiff]] (the same TIFF walk the
    * JPEG tier uses). None for plain containers or absent chunks. */
  def metadataChunk(b: Array[Byte], kind: String): Option[Array[Byte]] = {
    def fourcc(o: Int) = new String(b, o, 4, "US-ASCII")
    def u32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    if (b.length < 30 || fourcc(0) != "RIFF" || fourcc(8) != "WEBP" ||
        fourcc(12) != "VP8X") return None
    val n = u32(16)
    if (n < 10 || 20 + n > b.length) return None
    var o = 20 + n + (n & 1)
    while (o + 8 <= b.length) {
      val size = u32(o + 4)
      if (size < 0 || o + 8 + size > b.length) return None
      if (fourcc(o) == kind)
        return Some(java.util.Arrays.copyOfRange(b, o + 8, o + 8 + size))
      o += 8 + size + (size & 1)
    }
    None
  }

  // ---- ALPH chunk (container spec: alpha plane for lossy stills) ----

  /** Decode an ALPH chunk to the w x h alpha plane. Header byte: bits
    * 0-1 compression (0 raw, 1 lossless-coded with alpha in GREEN),
    * bits 2-3 the per-row prediction filter (none/horizontal/vertical/
    * gradient), bits 4-5 pre-processing (level reduction — a decoder
    * only records it). */
  /** Either-typed entry for callers outside this object (the animation
    * walk decodes per-frame ALPH chunks). */
  private[operators] def decodeAlphaChunk(chunk: Array[Byte], w: Int,
      h: Int): Either[Rejected, Array[Byte]] =
    try Right(decodeAlpha(chunk, w, h))
    catch { case e: Bail => Left(Rejected(e.reason)) }

  private def decodeAlpha(chunk: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (chunk.isEmpty) bail("truncated_alpha")
    val hdr = chunk(0) & 0xff
    val compression = hdr & 3
    val filter = (hdr >> 2) & 3
    if (compression > 1) bail("bad_alpha_compression")
    val a = new Array[Byte](w * h)
    if (compression == 0) {
      if (chunk.length < 1 + w * h) bail("truncated_alpha")
      System.arraycopy(chunk, 1, a, 0, w * h)
    } else {
      val px = Vp8l.decodeRawStream(
        java.util.Arrays.copyOfRange(chunk, 1, chunk.length), w, h) match {
        case Left(r) => bail(s"alpha_${r.reason}")
        case Right(p) => p
      }
      var i = 0
      while (i < w * h) { a(i) = ((px(i) >> 8) & 0xff).toByte; i += 1 }
    }
    // inverse prediction filter (container spec; libwebp filters.c
    // semantics: row 0 and column 0 fall back as below)
    if (filter > 0) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val pred =
            if (x == 0 && y == 0) 0
            else filter match {
              case 1 => // horizontal: left; leftmost predicts from above
                if (x == 0) a((y - 1) * w) & 0xff else a(y * w + x - 1) & 0xff
              case 2 => // vertical: above; top row predicts from left
                if (y == 0) a(x - 1) & 0xff else a((y - 1) * w + x) & 0xff
              case _ => // gradient: clamp(left + above - above-left)
                if (y == 0) a(x - 1) & 0xff
                else if (x == 0) a((y - 1) * w) & 0xff
                else {
                  val l = a(y * w + x - 1) & 0xff
                  val t = a((y - 1) * w + x) & 0xff
                  val tl = a((y - 1) * w + x - 1) & 0xff
                  clamp255(l + t - tl)
                }
            }
          a(y * w + x) = ((a(y * w + x) & 0xff) + pred).toByte
          x += 1
        }
        y += 1
      }
    }
    a
  }

  def wrapRiff(vp8: Array[Byte]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val out = new java.io.ByteArrayOutputStream()
    val chunk = vp8.length
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + 8 + chunk + (chunk & 1)))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8 ".getBytes("US-ASCII"))
    out.write(le32(chunk))
    out.write(vp8)
    if ((chunk & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ---- frame decode ----

  def decode(riff: Array[Byte]): Either[Rejected, Yuv] =
    unwrapRiff(riff).flatMap { ch =>
      decodeFrame(ch.vp8).flatMap { yuv =>
        ch.alph match {
          case None => Right(yuv)
          case Some(chunk) =>
            try Right(yuv.copy(alpha = Some(decodeAlpha(chunk, yuv.w, yuv.h))))
            catch { case e: Bail => Left(Rejected(e.reason)) }
        }
      }
    }

  def decodeFrame(b: Array[Byte]): Either[Rejected, Yuv] =
    try {
      if (b.length < 10) bail("truncated_frame")
      val tag = (b(0) & 0xff) | ((b(1) & 0xff) << 8) | ((b(2) & 0xff) << 16)
      if ((tag & 1) != 0) bail("not_a_keyframe")
      val version = (tag >> 1) & 7
      if (version > 3) bail("bad_version")
      val firstPartSize = tag >> 5
      if ((b(3) & 0xff) != 0x9d || (b(4) & 0xff) != 0x01 || (b(5) & 0xff) != 0x2a)
        bail("bad_start_code")
      val w = ((b(6) & 0xff) | ((b(7) & 0xff) << 8)) & 0x3fff
      val h = ((b(8) & 0xff) | ((b(9) & 0xff) << 8)) & 0x3fff
      if (w == 0 || h == 0) bail("bad_dimensions")
      if (w.toLong * h > (1L << 24)) bail("oversized")
      if (10 + firstPartSize > b.length) bail("truncated_partition")
      val bd = new BoolDecoder(b, 10, 10 + firstPartSize)
      val hd = parseHeader(bd)
      if (bd.pastEnd > 2) bail("truncated_partition")

      // token partitions: (nParts - 1) 3-byte sizes, then the data
      val partsBase = 10 + firstPartSize
      val sizesLen = 3 * (hd.nParts - 1)
      if (partsBase + sizesLen > b.length) bail("truncated_partition")
      val partBounds = new Array[(Int, Int)](hd.nParts)
      var off = partsBase + sizesLen
      var pi = 0
      while (pi < hd.nParts) {
        val size =
          if (pi < hd.nParts - 1) {
            val o = partsBase + 3 * pi
            (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)
          } else b.length - off
        if (size < 0 || off + size > b.length) bail("truncated_partition")
        partBounds(pi) = (off, off + size)
        off += size
        pi += 1
      }
      val tokenBds = partBounds.map { case (f, u) => new BoolDecoder(b, f, u) }

      val mbW = (w + 15) / 16
      val mbH = (h + 15) / 16
      val yp = new Plane(mbW * 16, mbH * 16)
      val up = new Plane(mbW * 8, mbH * 8)
      val vp = new Plane(mbW * 8, mbH * 8)
      val mbs = Array.fill(mbW * mbH)(new MbInfo)
      val dequants = Array.tabulate(4)(dequantFor(hd, _))

      // nonzero-context state: above (per MB column) and left (current)
      val aboveYNz = Array.ofDim[Boolean](mbW, 4)
      val aboveUNz = Array.ofDim[Boolean](mbW, 2)
      val aboveVNz = Array.ofDim[Boolean](mbW, 2)
      val aboveY2Nz = new Array[Boolean](mbW)
      val leftYNz = new Array[Boolean](4)
      val leftUNz = new Array[Boolean](2)
      val leftVNz = new Array[Boolean](2)
      var leftY2Nz = false

      // b-mode context rows (above per MB column x 4, left x 4)
      val aboveBModes = Array.ofDim[Int](mbW, 4)
      val leftBModes = new Array[Int](4)

      val coeffs = new Array[Int](16)
      val predBuf = new Array[Int](256)
      val sbPred = new Array[Int](16)
      val ar = new Array[Int](4)

      var my = 0
      while (my < mbH) {
        java.util.Arrays.fill(leftYNz, false)
        java.util.Arrays.fill(leftUNz, false)
        java.util.Arrays.fill(leftVNz, false)
        leftY2Nz = false
        java.util.Arrays.fill(leftBModes, 0)
        val tbd = tokenBds(my % hd.nParts)
        var mx = 0
        while (mx < mbW) {
          val mb = mbs(my * mbW + mx)
          // -- mode decoding (first partition) --
          if (hd.segEnabled && hd.segUpdateMap) {
            mb.segment =
              if (bd.bool(hd.segTreeProbs(0)) == 0) bd.bool(hd.segTreeProbs(1))
              else 2 + bd.bool(hd.segTreeProbs(2))
          }
          if (hd.skipEnabled) mb.skip = bd.bool(hd.skipProb) == 1
          mb.ymode = bd.tree(KfYModeTree, KfYModeProb)
          if (mb.ymode == 4) { // B_PRED: 16 sub-modes with contexts
            var sb = 0
            while (sb < 16) {
              val sbx = sb & 3; val sby = sb >> 2
              val above =
                if (sby > 0) mb.bmodes(sb - 4)
                else if (my > 0) aboveBModes(mx)(sbx)
                else 0
              val left =
                if (sbx > 0) mb.bmodes(sb - 1)
                else leftBModes(sby)
              mb.bmodes(sb) = bd.tree(BModeTree, KfBModeProb(above)(left))
              sb += 1
            }
          } else {
            val im = impliedBMode(mb.ymode)
            java.util.Arrays.fill(mb.bmodes, im)
          }
          mb.uvmode = bd.tree(UvModeTree, KfUvModeProb)
          var sb = 0
          while (sb < 4) {
            aboveBModes(mx)(sb) = mb.bmodes(12 + sb)
            leftBModes(sb) = mb.bmodes(sb * 4 + 3)
            sb += 1
          }

          // -- residuals (token partition) --
          val dq = dequants(mb.segment)
          val hasY2 = mb.ymode != 4
          val yRes = Array.ofDim[Int](16, 16)
          val uRes = Array.ofDim[Int](4, 16)
          val vRes = Array.ofDim[Int](4, 16)
          var y2Dcs: Array[Int] = null
          var any = false
          if (mb.skip) {
            // contexts: luma/chroma cleared; the Y2 context is cleared
            // only for MBs that HAVE a Y2 block (B_PRED leaves it)
            java.util.Arrays.fill(leftYNz, false)
            java.util.Arrays.fill(aboveYNz(mx), false)
            java.util.Arrays.fill(leftUNz, false)
            java.util.Arrays.fill(aboveUNz(mx), false)
            java.util.Arrays.fill(leftVNz, false)
            java.util.Arrays.fill(aboveVNz(mx), false)
            if (hasY2) { leftY2Nz = false; aboveY2Nz(mx) = false }
          } else {
            if (hasY2) {
              val ctx = (if (aboveY2Nz(mx)) 1 else 0) + (if (leftY2Nz) 1 else 0)
              java.util.Arrays.fill(coeffs, 0)
              val nz = decodeCoeffs(tbd, hd.coeffProbs(1), 0, ctx,
                dq(2), dq(3), coeffs)
              y2Dcs = inverseWht(coeffs)
              val f = nz > 0
              aboveY2Nz(mx) = f; leftY2Nz = f
              if (f) any = true
            }
            val plane = if (hasY2) 0 else 3
            val first = if (hasY2) 1 else 0
            var blk = 0
            val yNz = new Array[Boolean](16)
            while (blk < 16) {
              val bx = blk & 3; val by = blk >> 2
              val aboveF = if (by == 0) aboveYNz(mx)(bx) else yNz(blk - 4)
              val leftF = if (bx == 0) leftYNz(by) else yNz(blk - 1)
              val ctx = (if (aboveF) 1 else 0) + (if (leftF) 1 else 0)
              java.util.Arrays.fill(coeffs, 0)
              val nz = decodeCoeffs(tbd, hd.coeffProbs(plane), first, ctx,
                dq(0), dq(1), coeffs)
              yRes(blk) = coeffs.clone()
              yNz(blk) = nz > first
              if (nz > first) any = true
              blk += 1
            }
            var i = 0
            while (i < 4) {
              aboveYNz(mx)(i) = yNz(12 + i)
              leftYNz(i) = yNz(i * 4 + 3)
              i += 1
            }
            // chroma: U then V, 4 blocks each in raster
            def chroma(res: Array[Array[Int]], aboveNz: Array[Boolean],
                leftNz: Array[Boolean]): Unit = {
              val nz = new Array[Boolean](4)
              var c = 0
              while (c < 4) {
                val cx = c & 1; val cy = c >> 1
                val aboveF = if (cy == 0) aboveNz(cx) else nz(c - 2)
                val leftF = if (cx == 0) leftNz(cy) else nz(c - 1)
                val ctx = (if (aboveF) 1 else 0) + (if (leftF) 1 else 0)
                java.util.Arrays.fill(coeffs, 0)
                val n = decodeCoeffs(tbd, hd.coeffProbs(2), 0, ctx,
                  dq(4), dq(5), coeffs)
                res(c) = coeffs.clone()
                nz(c) = n > 0
                if (nz(c)) any = true
                c += 1
              }
              aboveNz(0) = nz(2); aboveNz(1) = nz(3)
              leftNz(0) = nz(1); leftNz(1) = nz(3)
            }
            chroma(uRes, aboveUNz(mx), leftUNz)
            chroma(vRes, aboveVNz(mx), leftVNz)
          }
          mb.hasCoeffs = any

          // -- reconstruction --
          if (hasY2) {
            pred16(yp, mx, my, mb.ymode, 16, predBuf)
            var blk = 0
            while (blk < 16) {
              val res = if (mb.skip) null else yRes(blk)
              if (res != null && y2Dcs != null) res(0) = y2Dcs(blk)
              val px = idctOrDc(res)
              val bx = blk & 3; val by = blk >> 2
              var r = 0
              while (r < 4) {
                var c = 0
                while (c < 4) {
                  val v = clamp255(predBuf((by * 4 + r) * 16 + bx * 4 + c) +
                    (if (px == null) 0 else px(r * 4 + c)))
                  yp.set(mx * 16 + bx * 4 + c, my * 16 + by * 4 + r, v)
                  c += 1
                }
                r += 1
              }
              blk += 1
            }
          } else {
            // B_PRED: subblocks predicted and reconstructed in raster
            var blk = 0
            while (blk < 16) {
              val bx = blk & 3; val by = blk >> 2
              val x0 = mx * 16 + bx * 4
              val y0 = my * 16 + by * 4
              // above-right: same row for interior, the above-MB row for
              // right-edge subblocks (127 virtual on the first row)
              if (y0 == 0) { ar(0) = 127; ar(1) = 127; ar(2) = 127; ar(3) = 127 }
              else if (bx == 3) {
                val ry = my * 16 - 1
                var i = 0
                while (i < 4) { ar(i) = yp(mx * 16 + 16 + i, ry); i += 1 }
              } else {
                var i = 0
                while (i < 4) { ar(i) = yp(x0 + 4 + i, y0 - 1); i += 1 }
              }
              predB(yp, x0, y0, mb.bmodes(blk), ar, sbPred)
              val px = idctOrDc(if (mb.skip) null else yRes(blk))
              var r = 0
              while (r < 4) {
                var c = 0
                while (c < 4) {
                  val v = clamp255(sbPred(r * 4 + c) +
                    (if (px == null) 0 else px(r * 4 + c)))
                  yp.set(x0 + c, y0 + r, v)
                  c += 1
                }
                r += 1
              }
              blk += 1
            }
          }
          val uvPred = new Array[Int](64)
          def reconUv(pl: Plane, res: Array[Array[Int]]): Unit = {
            pred16(pl, mx, my, mb.uvmode, 8, uvPred)
            var c4 = 0
            while (c4 < 4) {
              val cx = c4 & 1; val cy = c4 >> 1
              val px = idctOrDc(if (mb.skip) null else res(c4))
              var r = 0
              while (r < 4) {
                var c = 0
                while (c < 4) {
                  val v = clamp255(uvPred((cy * 4 + r) * 8 + cx * 4 + c) +
                    (if (px == null) 0 else px(r * 4 + c)))
                  pl.set(mx * 8 + cx * 4 + c, my * 8 + cy * 4 + r, v)
                  c += 1
                }
                r += 1
              }
              c4 += 1
            }
          }
          reconUv(up, uRes)
          reconUv(vp, vRes)
          mx += 1
        }
        my += 1
      }
      if (bd.pastEnd > 8 || tokenBds.exists(_.pastEnd > 8))
        bail("truncated_partition")

      loopFilter(hd, mbW, mbH, mbs, yp, up, vp)

      // crop to declared dimensions
      val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
      val y = new Array[Byte](w * h)
      var r = 0
      while (r < h) { System.arraycopy(yp.a, r * yp.w, y, r * w, w); r += 1 }
      val u = new Array[Byte](uvW * uvH)
      val v = new Array[Byte](uvW * uvH)
      r = 0
      while (r < uvH) {
        System.arraycopy(up.a, r * up.w, u, r * uvW, uvW)
        System.arraycopy(vp.a, r * vp.w, v, r * uvW, uvW)
        r += 1
      }
      Right(Yuv(w, h, y, u, v))
    } catch {
      case e: Bail => Left(Rejected(e.reason))
      case _: ArrayIndexOutOfBoundsException => Left(Rejected("corrupt_stream"))
    }

  /** IDCT of a residual block, or null when there is nothing to add. */
  private def idctOrDc(res: Array[Int]): Array[Int] =
    if (res == null) null
    else {
      var allZero = true
      var i = 0
      while (i < 16 && allZero) { if (res(i) != 0) allZero = false; i += 1 }
      if (allZero) null else idct4x4(res)
    }

  // ---- fixture encoder ----

  /** Wrap a plain lossy container in VP8X with a raw ALPH chunk: the
    * alpha plane is FORWARD-filtered with the given method (0-3) so the
    * decoder's inverse filter is load-bearing for the replay. */
  def wrapWithAlpha(riff: Array[Byte], alpha: Array[Byte], w: Int, h: Int,
      filter: Int): Array[Byte] = {
    require(alpha.length == w * h && filter >= 0 && filter <= 3)
    val chunkLen = (riff(16) & 0xff) | ((riff(17) & 0xff) << 8) |
      ((riff(18) & 0xff) << 16)
    val vp8Chunk = java.util.Arrays.copyOfRange(riff, 20, 20 + chunkLen)
    // forward filter: residual = value - pred over the ORIGINAL plane
    val filtered = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0
          else filter match {
            case 0 => 0
            case 1 => if (x == 0) alpha((y - 1) * w) & 0xff
              else alpha(y * w + x - 1) & 0xff
            case 2 => if (y == 0) alpha(x - 1) & 0xff
              else alpha((y - 1) * w + x) & 0xff
            case _ =>
              if (y == 0) alpha(x - 1) & 0xff
              else if (x == 0) alpha((y - 1) * w) & 0xff
              else clamp255((alpha(y * w + x - 1) & 0xff) +
                (alpha((y - 1) * w + x) & 0xff) -
                (alpha((y - 1) * w + x - 1) & 0xff))
          }
        filtered(y * w + x) = ((alpha(y * w + x) & 0xff) - pred).toByte
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def chunk(cc: String, body: Array[Byte]): Unit = {
      out.write(cc.getBytes("US-ASCII")); le32(body.length)
      out.write(body, 0, body.length)
      if ((body.length & 1) == 1) out.write(0)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(0)
    out.write("WEBP".getBytes("US-ASCII"))
    val x = new Array[Byte](10)
    x(0) = 0x10 // alpha flag
    def w24(o: Int, v: Int): Unit = { x(o) = (v & 0xff).toByte
      x(o + 1) = ((v >> 8) & 0xff).toByte; x(o + 2) = ((v >> 16) & 0xff).toByte }
    w24(4, w - 1); w24(7, h - 1)
    chunk("VP8X", x)
    chunk("ALPH", Array[Byte]((filter << 2).toByte) ++ filtered)
    chunk("VP8 ", vp8Chunk)
    val bytes = out.toByteArray
    val size = bytes.length - 8
    bytes(4) = (size & 0xff).toByte; bytes(5) = ((size >> 8) & 0xff).toByte
    bytes(6) = ((size >> 16) & 0xff).toByte; bytes(7) = ((size >> 24) & 0xff).toByte
    bytes
  }

  /** Encode target YUV planes (values constant per MACROBLOCK in every
    * plane — asserted) as a VP8 key frame that the decoder reconstructs
    * BIT-FOR-BIT: quantizer index 0 gives dc step 4 / y2-dc step 8,
    * where DC-only dequant + IWHT + IDCT are exact integer identities
    * ((64r+3)>>3 = 8r and (8r+4)>>3 = r for all signed r). Modes rotate
    * per MB: Y takes DC/V/H/TM/B_PRED by formula (B_PRED sub-modes
    * alternate B_DC/B_TM — the constant-prediction pair), chroma takes
    * DC/V/H/TM. The emitted residual per 4x4 block is its exact
    * (target - prediction) constant, so mode decode, token decode with
    * real DC magnitudes up to category 6, contexts, skip, Y2/WHT, and
    * every used predictor are all load-bearing for the pixel replay.
    *
    * `targetY/U/V(mbx, mby)` give each macroblock's constant; planes
    * pad to whole MBs (the decoder crops). `nTokenParts` in {1,2,4,8};
    * `filterLevel` > 0 turns the loop filter on (NOT bit-exact against
    * the closed-form targets — property fixtures only);
    * `withSegmentation` exercises the segment map with all-zero
    * feature data (so exactness holds). */
  def encode(w: Int, h: Int,
      targetY: (Int, Int) => Int,
      targetU: (Int, Int) => Int,
      targetV: (Int, Int) => Int,
      nTokenParts: Int = 1,
      filterLevel: Int = 0,
      simpleFilter: Boolean = false,
      withSegmentation: Boolean = false): Array[Byte] = {
    require(Set(1, 2, 4, 8)(nTokenParts))
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val yp = new Plane(mbW * 16, mbH * 16)
    val up = new Plane(mbW * 8, mbH * 8)
    val vp = new Plane(mbW * 8, mbH * 8)

    val bd1 = new BoolEncoder
    // header (must mirror parseHeader exactly)
    bd1.bool(128, 0); bd1.bool(128, 0) // color space, clamping
    bd1.bool(128, if (withSegmentation) 1 else 0)
    if (withSegmentation) {
      bd1.bool(128, 1) // update map
      bd1.bool(128, 0) // no feature data -> all-zero quant/lf deltas
      var i = 0
      while (i < 3) { bd1.bool(128, 1); bd1.literal(8, 128); i += 1 }
    }
    bd1.bool(128, if (simpleFilter) 1 else 0)
    bd1.literal(6, filterLevel)
    bd1.literal(3, 0) // sharpness
    bd1.bool(128, 0) // no lf deltas
    bd1.literal(2, Integer.numberOfTrailingZeros(nTokenParts))
    bd1.literal(7, 0) // y_ac quantizer index 0
    var i = 0
    while (i < 5) { bd1.bool(128, 0); i += 1 } // no quantizer deltas
    bd1.bool(128, 0) // refresh entropy (n/a)
    // no coefficient probability updates
    var t = 0
    while (t < 4) {
      var bb = 0
      while (bb < 8) {
        var c = 0
        while (c < 3) {
          var p = 0
          while (p < 11) {
            bd1.bool(CoeffUpdateProbs(t)(bb)(c)(p), 0)
            p += 1
          }
          c += 1
        }
        bb += 1
      }
      t += 1
    }
    bd1.bool(128, 1) // mb_no_coeff_skip
    bd1.literal(8, 128) // skip prob
    val skipProb = 128

    val tokenBds = Array.fill(nTokenParts)(new BoolEncoder)

    def writeCoeffs(be: BoolEncoder, probs: Array[Array[Array[Int]]],
        firstCoeff: Int, ctx0: Int, levels: Array[Int]): Int = {
      // levels in natural order; emit in zigzag with EOB after the last
      var last = -1
      var n = firstCoeff
      while (n < 16) { if (levels(Zigzag(n)) != 0) last = n; n += 1 }
      var ctx = ctx0
      var skipEob = false
      n = firstCoeff
      while (n <= last) {
        val v0 = levels(Zigzag(n))
        val p = probs(CoefBands(n))(ctx)
        val v = math.abs(v0)
        val tok =
          if (v <= 4) v
          else if (v <= 6) 5
          else if (v <= 10) 6
          else if (v <= 18) 7
          else if (v <= 34) 8
          else if (v <= 66) 9
          else 10
        be.tree(CoefTree, p, tok, if (skipEob) 2 else 0)
        if (tok == 0) { ctx = 0; skipEob = true }
        else {
          if (tok >= 5) {
            val cat = tok - 5
            val cp = CatProbs(cat)
            val extra = v - CatBase(cat)
            var i2 = cp.length - 1
            var bit = 0
            while (i2 >= 0) {
              be.bool(cp(cp.length - 1 - i2), (extra >> i2) & 1)
              i2 -= 1
            }
            bit = 0 // silence unused warnings
            require(extra >= 0 && extra < (1 << cp.length), s"value $v out of cat$cat")
          }
          be.bool(128, if (v0 < 0) 1 else 0)
          ctx = if (v == 1) 1 else 2
          skipEob = false
        }
        n += 1
      }
      if (last < 15) { // EOB (legal: the previous token was nonzero)
        val p = probs(CoefBands(if (last < firstCoeff) firstCoeff else last + 1))(ctx)
        be.tree(CoefTree, p, 11)
      }
      if (last < 0) firstCoeff else last + 1
    }

    val probs = DefaultCoeffProbs
    val aboveYNz = Array.ofDim[Boolean](mbW, 4)
    val aboveUNz = Array.ofDim[Boolean](mbW, 2)
    val aboveVNz = Array.ofDim[Boolean](mbW, 2)
    val aboveY2Nz = new Array[Boolean](mbW)
    val aboveBModes = Array.ofDim[Int](mbW, 4)

    var my = 0
    while (my < mbH) {
      val leftYNz = new Array[Boolean](4)
      val leftUNz = new Array[Boolean](2)
      val leftVNz = new Array[Boolean](2)
      var leftY2Nz = false
      val leftBModes = new Array[Int](4)
      val tbe = tokenBds(my % nTokenParts)
      var mx = 0
      while (mx < mbW) {
        val tY = targetY(mx, my) & 0xff
        val tU = targetU(mx, my) & 0xff
        val tV = targetV(mx, my) & 0xff
        val m = (mx + 3 * my + tY) % 5
        val uvm = (mx + 2 * my + tU) % 4
        val hasY2 = m != 4

        // -- compute residuals against honest predictions --
        val yLevels = Array.ofDim[Int](16, 16) // quantized levels, natural order
        var y2Levels = new Array[Int](16)
        val bmodes = new Array[Int](16)
        if (hasY2) {
          val pred = new Array[Int](256)
          pred16(yp, mx, my, m, 16, pred)
          // constant-per-MB target + constant pred (constant neighbors)
          val p0 = pred(0)
          require(pred.forall(_ == p0), "16x16 prediction must be constant")
          val r = tY - p0
          // Y2 DC-only: level 8r at q 8 distributes dc = 8r to every
          // subblock; Y subblocks carry no AC -> no tokens
          y2Levels(0) = 8 * r
          java.util.Arrays.fill(bmodes, impliedBMode(m))
        } else {
          // B_PRED: reconstruct subblock by subblock
          val ar = new Array[Int](4)
          val sp = new Array[Int](16)
          var blk = 0
          while (blk < 16) {
            val bx = blk & 3; val by = blk >> 2
            val x0 = mx * 16 + bx * 4
            val y0 = my * 16 + by * 4
            bmodes(blk) = (mx + my + bx + by) % 2 // B_DC / B_TM
            if (y0 == 0) { ar(0) = 127; ar(1) = 127; ar(2) = 127; ar(3) = 127 }
            else if (bx == 3) {
              val ry = my * 16 - 1
              var k = 0
              while (k < 4) { ar(k) = yp(mx * 16 + 16 + k, ry); k += 1 }
            } else {
              var k = 0
              while (k < 4) { ar(k) = yp(x0 + 4 + k, y0 - 1); k += 1 }
            }
            predB(yp, x0, y0, bmodes(blk), ar, sp)
            val p0 = sp(0)
            require(sp.forall(_ == p0), "B_DC/B_TM prediction must be constant")
            val r = tY - p0
            yLevels(blk)(0) = 2 * r // dc q = 4, residual 4*(2r)/4 -> D=8r? no:
            // level L dequantizes to 4L; IDCT DC-only gives (4L+4)>>3.
            // want r: 4L = 8r -> L = 2r, (8r+4)>>3 = r exactly.
            // reconstruct
            var rr = 0
            while (rr < 4) {
              var cc = 0
              while (cc < 4) { yp.set(x0 + cc, y0 + rr, clamp255(p0 + r)); cc += 1 }
              rr += 1
            }
            blk += 1
          }
        }
        if (hasY2) {
          // reconstruct the whole MB (constant tY by construction)
          var rr = 0
          while (rr < 16) {
            var cc = 0
            while (cc < 16) { yp.set(mx * 16 + cc, my * 16 + rr, tY); cc += 1 }
            rr += 1
          }
        }
        val uLevels = Array.ofDim[Int](4, 16)
        val vLevels = Array.ofDim[Int](4, 16)
        def chromaPlane(pl: Plane, tv: Int, levels: Array[Array[Int]]): Unit = {
          val pred = new Array[Int](64)
          pred16(pl, mx, my, uvm, 8, pred)
          val p0 = pred(0)
          require(pred.forall(_ == p0), "chroma prediction must be constant")
          val r = tv - p0
          var c4 = 0
          while (c4 < 4) { levels(c4)(0) = 2 * r; c4 += 1 } // uv dc q = 4
          var rr = 0
          while (rr < 8) {
            var cc = 0
            while (cc < 8) { pl.set(mx * 8 + cc, my * 8 + rr, tv); cc += 1 }
            rr += 1
          }
        }
        chromaPlane(up, tU, uLevels)
        chromaPlane(vp, tV, vLevels)

        val allZero =
          (!hasY2 || y2Levels.forall(_ == 0)) &&
            yLevels.forall(_.forall(_ == 0)) &&
            uLevels.forall(_.forall(_ == 0)) && vLevels.forall(_.forall(_ == 0))

        // -- mode bits (first partition) --
        if (withSegmentation) { // segment 0 via the tree (probs 128)
          bd1.bool(128, 0); bd1.bool(128, 0)
        }
        bd1.bool(skipProb, if (allZero) 1 else 0)
        bd1.tree(KfYModeTree, KfYModeProb, m)
        if (!hasY2) {
          var sb = 0
          while (sb < 16) {
            val sbx = sb & 3; val sby = sb >> 2
            val above =
              if (sby > 0) bmodes(sb - 4)
              else if (my > 0) aboveBModes(mx)(sbx)
              else 0
            val left = if (sbx > 0) bmodes(sb - 1) else leftBModes(sby)
            bd1.tree(BModeTree, KfBModeProb(above)(left), bmodes(sb))
            sb += 1
          }
        }
        bd1.tree(UvModeTree, KfUvModeProb, uvm)
        var sb = 0
        while (sb < 4) {
          aboveBModes(mx)(sb) = bmodes(12 + sb)
          leftBModes(sb) = bmodes(sb * 4 + 3)
          sb += 1
        }

        // -- tokens --
        if (allZero) {
          java.util.Arrays.fill(leftYNz, false)
          java.util.Arrays.fill(aboveYNz(mx), false)
          java.util.Arrays.fill(leftUNz, false)
          java.util.Arrays.fill(aboveUNz(mx), false)
          java.util.Arrays.fill(leftVNz, false)
          java.util.Arrays.fill(aboveVNz(mx), false)
          if (hasY2) { leftY2Nz = false; aboveY2Nz(mx) = false }
        } else {
          if (hasY2) {
            val ctx = (if (aboveY2Nz(mx)) 1 else 0) + (if (leftY2Nz) 1 else 0)
            val nz = writeCoeffs(tbe, probs(1), 0, ctx, y2Levels)
            val f = nz > 0
            aboveY2Nz(mx) = f; leftY2Nz = f
          }
          val plane = if (hasY2) 0 else 3
          val first = if (hasY2) 1 else 0
          val yNz = new Array[Boolean](16)
          var blk = 0
          while (blk < 16) {
            val bx = blk & 3; val by = blk >> 2
            val aboveF = if (by == 0) aboveYNz(mx)(bx) else yNz(blk - 4)
            val leftF = if (bx == 0) leftYNz(by) else yNz(blk - 1)
            val ctx = (if (aboveF) 1 else 0) + (if (leftF) 1 else 0)
            val nz = writeCoeffs(tbe, probs(plane), first, ctx, yLevels(blk))
            yNz(blk) = nz > first
            blk += 1
          }
          var k = 0
          while (k < 4) {
            aboveYNz(mx)(k) = yNz(12 + k)
            leftYNz(k) = yNz(k * 4 + 3)
            k += 1
          }
          def chromaTok(levels: Array[Array[Int]], aboveNz: Array[Boolean],
              leftNz: Array[Boolean]): Unit = {
            val nz = new Array[Boolean](4)
            var c = 0
            while (c < 4) {
              val cx = c & 1; val cy = c >> 1
              val aboveF = if (cy == 0) aboveNz(cx) else nz(c - 2)
              val leftF = if (cx == 0) leftNz(cy) else nz(c - 1)
              val ctx = (if (aboveF) 1 else 0) + (if (leftF) 1 else 0)
              val n = writeCoeffs(tbe, probs(2), 0, ctx, levels(c))
              nz(c) = n > 0
              c += 1
            }
            aboveNz(0) = nz(2); aboveNz(1) = nz(3)
            leftNz(0) = nz(1); leftNz(1) = nz(3)
          }
          chromaTok(uLevels, aboveUNz(mx), leftUNz)
          chromaTok(vLevels, aboveVNz(mx), leftVNz)
        }
        mx += 1
      }
      my += 1
    }

    val part1 = bd1.finish()
    val parts = tokenBds.map(_.finish())
    val out = new java.io.ByteArrayOutputStream()
    val tag = (part1.length << 5) | (1 << 4) | 0 // keyframe, version 0, shown
    out.write(tag & 0xff); out.write((tag >> 8) & 0xff); out.write((tag >> 16) & 0xff)
    out.write(0x9d); out.write(0x01); out.write(0x2a)
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    out.write(part1, 0, part1.length)
    var pi = 0
    while (pi < nTokenParts - 1) {
      val n = parts(pi).length
      out.write(n & 0xff); out.write((n >> 8) & 0xff); out.write((n >> 16) & 0xff)
      pi += 1
    }
    parts.foreach(p => out.write(p, 0, p.length))
    wrapRiff(out.toByteArray)
  }
}

