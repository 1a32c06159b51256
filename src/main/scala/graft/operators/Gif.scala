package graft.operators

/** Pure-JVM GIF87a/89a codec: palette-indexed images under real LZW
  * entropy coding — the last member of the image family whose pixel layer
  * was header-only (PNG and JPEG are full codecs). LZW is LOSSLESS, so
  * unlike the DCT fixtures no fixed-point trickery is needed: roundtrips
  * must be bit-exact for ANY index pattern, and the spec drives patterns
  * across code-width growth boundaries and the 4096-entry dictionary
  * reset.
  *
  * Contract (reject-don't-guess, like the other codecs): global color
  * table required, first image block only, no local color table,
  * 64M-pixel dimension cap checked before any allocation. Four-pass
  * interlace (flag 0x40) is supported on both sides — row placement
  * only; the LZW layer is identical.
  * Extension blocks (0x21) are skipped. Citations: GIF89a specification
  * (CompuServe, public), T.81-adjacent LZW as specified there — variable
  * width 3..12 bits LSB-first, clear/EOI codes, early-change OFF.
  */
object Gif {

  /** Display-row order of the four GIF interlace passes for height `h`
    * (GIF89a appendix E): rows 0,8,16.. then 4,12.. then 2,6.. then
    * odd rows. `result(s)` = the display row stored at position `s`. */
  private[operators] def interlaceRows(h: Int): Array[Int] =
    Array.range(0, h, 8) ++ Array.range(4, h, 8) ++
      Array.range(2, h, 4) ++ Array.range(1, h, 2)

  /** Encode a palette-indexed image as GIF89a. `palette` holds packed
    * 0xRRGGBB ints (length a power of two, 2..256); `indices` row-major,
    * each < palette.length. `interlaced` stores rows in the four-pass
    * GIF interlace order (flag 0x40 in the image descriptor) — the
    * entropy layer is identical, only row placement changes. */
  def encodeIndexed(
      w: Int, h: Int, palette: Array[Int], indices: Array[Byte],
      interlaced: Boolean = false): Array[Byte] =
    encodeFrames(w, h, palette, Seq(indices), interlaced, withGce = false)

  /** Animated GIF89a: every frame full-canvas over the one global
    * palette, each preceded by a graphic-control extension carrying
    * `delayCs` (centiseconds; disposal = do-not-dispose, so frames are
    * full replacements — the contract [[decodeFrames]] enforces). */
  def encodeAnimated(
      w: Int, h: Int, palette: Array[Int], frames: Seq[Array[Byte]],
      delayCs: Int = 10, interlaced: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "an animation needs at least one frame")
    encodeFrames(w, h, palette, frames, interlaced, withGce = true, delayCs)
  }

  private def encodeFrames(
      w: Int, h: Int, palette: Array[Int], frames: Seq[Array[Byte]],
      interlaced: Boolean, withGce: Boolean, delayCs: Int = 0): Array[Byte] = {
    frames.foreach(f => require(f.length == w * h,
      s"need $w*$h=${w * h} indices per frame, got ${f.length}"))
    require(w >= 1 && h >= 1)
    require(palette.length >= 2 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1,
      s"palette must be a power of two in [2,256], got ${palette.length}")
    val palBits = 32 - Integer.numberOfLeadingZeros(palette.length - 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | (palBits - 1)) // global color table, 2^palBits entries
    out.write(0); out.write(0) // background, aspect
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    val minCode = math.max(2, palBits)
    frames.foreach { indices =>
      if (withGce) { // graphic control: disposal 1, no transparency
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0x04); le16(delayCs); out.write(0); out.write(0)
      }
      out.write(0x2c) // image descriptor
      le16(0); le16(0); le16(w); le16(h)
      out.write(if (interlaced) 0x40 else 0) // no local table
      out.write(minCode)
      val src =
        if (!interlaced) indices
        else {
          val reordered = new Array[Byte](indices.length)
          val rows = interlaceRows(h)
          var s = 0
          while (s < h) {
            System.arraycopy(indices, rows(s) * w, reordered, s * w, w)
            s += 1
          }
          reordered
        }
      out.write(lzwEncode(src, minCode))
    }
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** LZW-encode one frame's indices: LSB-first bit packing into
    * <=255-byte sub-blocks, terminator included. */
  private def lzwEncode(src: Array[Byte], minCode: Int): Array[Byte] = {

    // LZW encode, LSB-first bit packing into <=255-byte sub-blocks
    val clear = 1 << minCode
    val eoi = clear + 1
    val block = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    val sub = new Array[Byte](255)
    var subLen = 0
    def flushByte(b: Int): Unit = {
      sub(subLen) = b.toByte; subLen += 1
      if (subLen == 255) { block.write(subLen); block.write(sub, 0, subLen); subLen = 0 }
    }
    // The code WIDTH follows the DECODER's view of the dictionary — the
    // decoder grows its table one entry per data code after the first
    // (it cannot know about the encoder's in-flight entry), so tracking
    // our own hash size would desynchronize the width schedule at the
    // stream tail. `dNext`/`firstSinceClear` replicate the decoder
    // state machine exactly; the bump check runs before every emit,
    // mirroring the decoder's check before every read.
    var width = minCode + 1
    var dNext = eoi + 1
    var firstSinceClear = true
    def emit(code: Int, isData: Boolean): Unit = {
      if (dNext == (1 << width) && width < 12) width += 1
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) { flushByte((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
      if (isData) {
        if (!firstSinceClear && dNext < 4096) dNext += 1
        firstSinceClear = false
      }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var dictNext = eoi + 1
    emit(clear, isData = false)
    var cur = src(0) & 0xff
    var i = 1
    while (i < src.length) {
      val k = src(i) & 0xff
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur, isData = true)
        if (dictNext < 4096) { dict.put(key, dictNext); dictNext += 1 }
        else { // dictionary full: clear and start over, decoder in lockstep
          emit(clear, isData = false)
          dict = new java.util.HashMap()
          dictNext = eoi + 1
          dNext = eoi + 1
          width = minCode + 1
          firstSinceClear = true
        }
        cur = k
      }
      i += 1
    }
    emit(cur, isData = true)
    emit(eoi, isData = false)
    if (nBits > 0) flushByte((acc & 0xff).toInt)
    if (subLen > 0) { block.write(subLen); block.write(sub, 0, subLen) }
    block.write(0) // sub-block terminator
    block.toByteArray
  }

  /** Decode the FIRST frame: (w, h, palette, row-major indices) — the
    * still-image view of any stream [[decodeFrames]] accepts. */
  def decodeIndexed(p: Array[Byte])
      : Option[(Int, Int, Array[Int], Array[Byte])] =
    decodeFrames(p).map { case (w, h, pal, frames) => (w, h, pal, frames.head) }

  /** Decode ALL frames of a (possibly animated) GIF: (w, h, palette,
    * frames). Contract: every image block full-canvas over the one
    * global palette (no local tables, no sub-rectangle composition —
    * disposal semantics stay out; each frame is a full replacement,
    * which is what [[encodeAnimated]] emits), per-frame interlace
    * allowed, graphic-control and other extensions skipped, terminating
    * trailer required. None on any violation. */
  def decodeFrames(p: Array[Byte])
      : Option[(Int, Int, Array[Int], Seq[Array[Byte]])] = {
    if (p.length < 14) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    val sw = le16(6); val sh = le16(8)
    val flags = p(10) & 0xff
    if ((flags & 0x80) == 0) return None // need a global color table
    val palSize = 1 << ((flags & 0x07) + 1)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > (1L << 26)) return None
    var i = 13
    if (i + 3 * palSize > p.length) return None
    val palette = Array.tabulate(palSize) { c =>
      ((p(i + 3 * c) & 0xff) << 16) | ((p(i + 3 * c + 1) & 0xff) << 8) |
        (p(i + 3 * c + 2) & 0xff)
    }
    i += 3 * palSize
    val frames = Seq.newBuilder[Array[Byte]]
    var nFrames = 0
    var trailer = false
    while (!trailer) {
      // skip extensions until an image descriptor or the trailer
      while (i < p.length && (p(i) & 0xff) == 0x21) {
        i += 2 // introducer + label
        var more = true
        while (more) {
          if (i >= p.length) return None
          val n = p(i) & 0xff
          i += 1
          if (n == 0) more = false else i += n
        }
      }
      if (i >= p.length) return None // ran out before the trailer
      (p(i) & 0xff) match {
        case 0x3b => trailer = true
        case 0x2c =>
          // allocation cap is TOTAL decoded pixels, not per-canvas: LZW
          // expands ~1000x, so a small stream declaring a large canvas
          // with many frames must reject BEFORE each frame's allocation
          // (same contract as Adpcm's 2^26-sample cap)
          if ((nFrames + 1).toLong * sw * sh > (1L << 26)) return None
          decodeFrame(p, i, sw, sh, palSize) match {
            case Some((frame, next)) =>
              frames += frame; nFrames += 1; i = next
            case None => return None
          }
        case _ => return None
      }
    }
    if (nFrames == 0) None else Some((sw, sh, palette, frames.result()))
  }

  /** One image block at `i` (which points at 0x2c): full-canvas
    * descriptor + LZW data. Returns (display-order indices, index just
    * past the sub-block terminator). */
  private def decodeFrame(
      p: Array[Byte], start: Int, sw: Int, sh: Int,
      palSize: Int): Option[(Array[Byte], Int)] =
    decodeImageBlock(p, start, sw, sh, palSize) match {
      case Some((0, 0, w, h, px, next)) if w == sw && h == sh =>
        Some((px, next))
      case _ => None // full-canvas contract of decodeFrames
    }

  /** One image block at `start` allowing SUB-RECTANGLE placement (the
    * animation shape [[decodeAnim]] consumes): returns
    * (left, top, w, h, display-order indices, next offset). */
  private def decodeImageBlock(
      p: Array[Byte], start: Int, sw: Int, sh: Int,
      palSize: Int): Option[(Int, Int, Int, Int, Array[Byte], Int)] = {
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    var i = start
    if (i + 10 > p.length) return None
    val left = le16(i + 1); val top = le16(i + 3)
    val w = le16(i + 5); val h = le16(i + 7)
    val iflags = p(i + 9) & 0xff
    if (w == 0 || h == 0 || left + w > sw || top + h > sh) return None
    if ((iflags & 0x80) != 0) return None // local color table off-contract
    val interlaced = (iflags & 0x40) != 0
    i += 10
    if (i >= p.length) return None
    val minCode = p(i) & 0xff
    i += 1
    if (minCode < 2 || minCode > 11) return None
    val clear = 1 << minCode
    val eoi = clear + 1

    // collect the entropy bytes from the sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var more = true
    while (more) {
      if (i >= p.length) return None
      val n = p(i) & 0xff
      i += 1
      if (n == 0) more = false
      else {
        if (i + n > p.length) return None
        data.write(p, i, n)
        i += n
      }
    }
    val d = data.toByteArray

    val out = new Array[Byte](w * h)
    var outAt = 0
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var dictNext = eoi + 1
    var width = minCode + 1
    var acc = 0L
    var nBits = 0
    var at = 0
    var prev = -1
    val stack = new Array[Byte](4096)
    def emitEntry(code: Int): Boolean = { // expand `code` into out; false = bad
      var sp = 0
      var c = code
      while (c >= clear + 2) {
        if (sp >= stack.length) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (c >= clear) return false // must bottom out at a root index
      if (outAt + sp + 1 > out.length) return false
      out(outAt) = c.toByte; outAt += 1
      while (sp > 0) { sp -= 1; out(outAt) = stack(sp); outAt += 1 }
      true
    }
    def firstChar(code: Int): Int = {
      var c = code
      while (c >= clear + 2) c = prefix(c)
      c
    }
    var done = false
    while (!done) {
      // width check BEFORE reading: the next code can be at most dictNext
      if (dictNext == (1 << width) && width < 12) width += 1
      while (nBits < width) {
        if (at >= d.length) return None // ran out before EOI
        acc |= (d(at) & 0xff).toLong << nBits
        nBits += 8
        at += 1
      }
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>= width
      nBits -= width
      if (code == eoi) {
        done = true
      } else if (code == clear) {
        dictNext = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (prev < 0) {
        if (code >= clear) return None // first code must be a root
        if (outAt >= out.length) return None
        out(outAt) = code.toByte; outAt += 1
        prev = code
      } else {
        if (code > dictNext || (code < clear + 2 && code >= clear)) return None
        val kwkwk = code == dictNext
        val expand = if (kwkwk) prev else code
        val head = firstChar(if (kwkwk) prev else code)
        if (kwkwk) {
          // prev + firstChar(prev): emit prev then its head
          if (!emitEntry(prev)) return None
          if (outAt >= out.length) return None
          out(outAt) = head.toByte; outAt += 1
        } else {
          if (!emitEntry(expand)) return None
        }
        if (dictNext < 4096) {
          prefix(dictNext) = prev
          suffix(dictNext) = head.toByte
          dictNext += 1
        }
        prev = code
      }
    }
    if (outAt != out.length) return None
    // indices must address the palette
    var v = 0
    while (v < out.length) {
      if ((out(v) & 0xff) >= palSize) return None
      v += 1
    }
    val display =
      if (!interlaced) out
      else {
        // stored position s holds display row interlaceRows(h)(s)
        val d2 = new Array[Byte](out.length)
        val rows = interlaceRows(h)
        var s = 0
        while (s < h) {
          System.arraycopy(out, s * w, d2, rows(s) * w, w)
          s += 1
        }
        d2
      }
    Some((left, top, w, h, display, i))
  }

  // ---- full-fidelity animation: sub-rects, disposal, transparency ----

  /** One animation frame with its graphic-control state. `disposal`:
    * 0/1 keep, 2 restore-to-background (the rect clears to transparent
    * after display — the browser convention), 3 restore-to-previous.
    * `transparentIndex` -1 when the frame is fully opaque. */
  final case class AnimFrame(
      x: Int, y: Int, w: Int, h: Int, delayCs: Int,
      disposal: Int, transparentIndex: Int, indices: Array[Byte])

  /** GIF89a with the full per-frame graphic-control vocabulary the
    * plain [[encodeAnimated]] deliberately leaves out: sub-rectangle
    * placement, disposal methods 0-3, and a transparent index. */
  def encodeAnimatedComposed(
      w: Int, h: Int, palette: Array[Int],
      frames: Seq[AnimFrame]): Array[Byte] = {
    require(frames.nonEmpty)
    require(palette.length >= 2 && palette.length <= 256 &&
      Integer.bitCount(palette.length) == 1)
    frames.foreach { f =>
      require(f.indices.length == f.w * f.h)
      require(f.x >= 0 && f.y >= 0 && f.x + f.w <= w && f.y + f.h <= h)
      require(f.disposal >= 0 && f.disposal <= 3)
    }
    val palBits = 32 - Integer.numberOfLeadingZeros(palette.length - 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | (palBits - 1))
    out.write(0); out.write(0)
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    val minCode = math.max(2, palBits)
    frames.foreach { f =>
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transparentIndex >= 0) 1 else 0))
      le16(f.delayCs)
      out.write(math.max(0, f.transparentIndex))
      out.write(0)
      out.write(0x2c)
      le16(f.x); le16(f.y); le16(f.w); le16(f.h)
      out.write(0) // no local table, not interlaced
      out.write(minCode)
      out.write(lzwEncode(f.indices, minCode))
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode a GIF89a animation with full graphic-control fidelity:
    * (canvasW, canvasH, palette, frames). Rejects (None) on the same
    * grammar violations as [[decodeFrames]]; sub-rectangles allowed. */
  def decodeAnim(p: Array[Byte])
      : Option[(Int, Int, Array[Int], Seq[AnimFrame])] = {
    if (p.length < 14) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    val sw = le16(6); val sh = le16(8)
    val flags = p(10) & 0xff
    if ((flags & 0x80) == 0) return None
    val palSize = 1 << ((flags & 0x07) + 1)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > (1L << 26)) return None
    var i = 13
    if (i + 3 * palSize > p.length) return None
    val palette = Array.tabulate(palSize) { c =>
      ((p(i + 3 * c) & 0xff) << 16) | ((p(i + 3 * c + 1) & 0xff) << 8) |
        (p(i + 3 * c + 2) & 0xff)
    }
    i += 3 * palSize
    val frames = Seq.newBuilder[AnimFrame]
    var nFrames = 0
    var trailer = false
    var delayCs = 0
    var disposal = 0
    var transparentIndex = -1
    while (!trailer) {
      while (i < p.length && (p(i) & 0xff) == 0x21) {
        val label = if (i + 1 < p.length) p(i + 1) & 0xff else -1
        i += 2
        if (label == 0xf9) {
          // graphic control: read it instead of skipping
          if (i + 6 > p.length) return None
          val n = p(i) & 0xff
          if (n != 4) return None
          val gflags = p(i + 1) & 0xff
          disposal = (gflags >> 2) & 7
          if (disposal > 3) return None
          delayCs = (p(i + 2) & 0xff) | ((p(i + 3) & 0xff) << 8)
          transparentIndex =
            if ((gflags & 1) != 0) p(i + 4) & 0xff else -1
          i += 5
          if ((p(i) & 0xff) != 0) return None // block terminator
          i += 1
        } else {
          var more = true
          while (more) {
            if (i >= p.length) return None
            val n = p(i) & 0xff
            i += 1
            if (n == 0) more = false else i += n
          }
        }
      }
      if (i >= p.length) return None
      (p(i) & 0xff) match {
        case 0x3b => trailer = true
        case 0x2c =>
          if ((nFrames + 1).toLong * sw * sh > (1L << 26)) return None
          decodeImageBlock(p, i, sw, sh, palSize) match {
            case Some((l, t, w, h, px, next)) =>
              frames += AnimFrame(l, t, w, h, delayCs, disposal,
                transparentIndex, px)
              nFrames += 1
              i = next
              delayCs = 0; disposal = 0; transparentIndex = -1
            case None => return None
          }
        case _ => return None
      }
    }
    if (nFrames == 0) None else Some((sw, sh, palette, frames.result()))
  }

  /** Canvas composition per the GIF89a disposal semantics — the same
    * replay [[WebpAnim.compose]] runs for ANMF frames: the canvas
    * starts fully transparent; each frame paints its rect skipping the
    * transparent index; after display, disposal 2 clears the rect to
    * transparent and disposal 3 restores the pre-frame canvas. Returns
    * one ARGB canvas per frame (opaque pixels 0xFF......, untouched
    * pixels 0). */
  def compose(canvasW: Int, canvasH: Int, palette: Array[Int],
      frames: Seq[AnimFrame]): Seq[Array[Int]] = {
    val canvas = new Array[Int](canvasW * canvasH)
    frames.map { f =>
      val snapshot = if (f.disposal == 3) canvas.clone() else null
      var y = 0
      while (y < f.h) {
        var x = 0
        while (x < f.w) {
          val idx = f.indices(y * f.w + x) & 0xff
          if (idx != f.transparentIndex)
            canvas((f.y + y) * canvasW + (f.x + x)) =
              0xff000000 | palette(idx)
          x += 1
        }
        y += 1
      }
      val shown = canvas.clone()
      if (f.disposal == 2) {
        var yy = 0
        while (yy < f.h) {
          var xx = 0
          while (xx < f.w) {
            canvas((f.y + yy) * canvasW + (f.x + xx)) = 0
            xx += 1
          }
          yy += 1
        }
      } else if (f.disposal == 3) {
        System.arraycopy(snapshot, 0, canvas, 0, canvas.length)
      }
      shown
    }
  }

  /** Decode to interleaved RGB via the palette. */
  def decodeRgb(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeIndexed(p).map { case (w, h, pal, idx) =>
      val rgb = new Array[Byte](3 * w * h)
      var k = 0
      while (k < idx.length) {
        val c = pal(idx(k) & 0xff)
        rgb(3 * k) = ((c >> 16) & 0xff).toByte
        rgb(3 * k + 1) = ((c >> 8) & 0xff).toByte
        rgb(3 * k + 2) = (c & 0xff).toByte
        k += 1
      }
      (w, h, rgb)
    }
}
