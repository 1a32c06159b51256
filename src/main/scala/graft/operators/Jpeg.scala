package graft.operators

/** Pure-JVM BASELINE JPEG (ITU-T T.81) codec for 8-bit grayscale — the
  * real-codec step past PNG: markers, DQT/DHT/SOF0/SOS segment parsing,
  * canonical Huffman built from the stream's own DHT, FF00 byte
  * stuffing, zigzag, dequantization, and a full 2-D IDCT. Single
  * component, no subsampling, no restart intervals, no progressive —
  * everything else is rejected, never mis-decoded.
  *
  * The encoder emits spec-compliant streams any baseline decoder reads:
  * a standard JFIF skeleton with CUSTOM canonical Huffman tables carried
  * in DHT (12 DC symbols at 4 bits, 162 AC symbols at 8 bits — a
  * degenerate but valid prefix code, so the all-ones codes stay unused
  * as T.81 F.1.2.1.2 requires) and a quantization table whose DC step is
  * 8. That step is what makes block-flat fixtures EXACT through the
  * lossy pipeline: a flat block's FDCT is DC-only with F(0,0) = 8·s, so
  * quantize(8s/8) = s restores the block bit-perfectly — the q93 oracle
  * replays decoded pixels from fixture arithmetic while the decoder
  * still runs the full Huffman + IDCT path (it cannot know the ACs are
  * zero until it has decoded them).
  */
object Jpeg {

  // zigzag index -> (row, col): odd anti-diagonals walk row-increasing,
  // even ones row-decreasing (T.81 Figure 5)
  private[operators] val zigzag: Array[Int] = {
    val out = new Array[Int](64)
    var i = 0
    for (s <- 0 to 14) {
      val range =
        if (s % 2 == 1) math.max(0, s - 7) to math.min(7, s)
        else math.min(7, s) to math.max(0, s - 7) by -1
      for (r <- range) { out(i) = r * 8 + (s - r); i += 1 }
    }
    out
  }

  /** Quant table in NATURAL order: DC step 8 (see scaladoc), AC steps a
    * mild constant 16 — carried in DQT, so the decoder learns it from
    * the stream, not from this object. */
  private[operators] val quant: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)

  /** Chroma quant table (Tq=1 in color streams): same DC step 8 (flat
    * chroma regions stay exact), coarser AC — carried in DQT like the
    * luma table. */
  private[operators] val quantC: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 24)

  // canonical tables: BITS (codes per length 1..16) + ordered symbol values
  private[operators] val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private[operators] val dcVals = Array.tabulate(12)(identity) // categories 0..11
  private[operators] val acBits = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private[operators] val acVals: Array[Int] = {
    // EOB, ZRL, and every (run 0-15, size 1-10) pair
    val syms = Seq(0x00, 0xf0) ++
      (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)
    syms.toArray
  }

  /** Canonical code assignment (T.81 C.2): symbols in HUFFVAL order get
    * increasing codes, lengths from BITS. Returns symbol -> (code, len). */
  private[operators] def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = 0
      while (n < bits(len - 1)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; n += 1
      }
      code <<= 1
    }
    out.result()
  }

  private[operators] class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          buf.write(acc)
          if (acc == 0xff) buf.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
        acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
        buf.write(acc)
        if (acc == 0xff) buf.write(0x00)
      }
      buf.toByteArray
    }
  }

  /** Magnitude category: number of bits to hold |v| (0 for v == 0). */
  private[operators] def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** JPEG signed-magnitude payload bits: v >= 0 as-is, v < 0 stored as
    * v - 1 in `size` low bits (ones-complement form, T.81 F.1.2.1.1). */
  private[operators] def magnitudeBits(v: Int, size: Int): Int =
    if (v >= 0) v else (v - 1) & ((1 << size) - 1)

  // cosT(x)(u) = cos((2x+1)·u·π/16), the only transcendental either
  // transform needs — precomputed once per JVM, not per block
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val c0 = 1.0 / math.sqrt(2)

  private[operators] def fdct(block: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += block(x * 8 + y) * cosT(x)(u) * cosT(y)(v)
            y += 1
          }
          x += 1
        }
        val cu = if (u == 0) c0 else 1.0
        val cv = if (v == 0) c0 else 1.0
        out(u * 8 + v) = 0.25 * cu * cv * s
        v += 1
      }
      u += 1
    }
    out
  }

  private[operators] def idct(coef: Array[Double]): Array[Double] = {
    val out = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val cu = if (u == 0) c0 else 1.0
            val cv = if (v == 0) c0 else 1.0
            s += cu * cv * coef(u * 8 + v) * cosT(x)(u) * cosT(y)(v)
            v += 1
          }
          u += 1
        }
        out(x * 8 + y) = 0.25 * s
        y += 1
      }
      x += 1
    }
    out
  }

  /** FDCT + quantize + entropy-code one level-shifted block; returns the
    * new DC predictor. Shared by the gray and color encoders. */
  private def encodeBlock(
      bw: BitWriter,
      block: Array[Double],
      qtab: Array[Int],
      dcCodes: Map[Int, (Int, Int)],
      acCodes: Map[Int, (Int, Int)],
      prevDc: Int): Int = {
    val coef = fdct(block)
    val q = Array.tabulate(64)(i =>
      math.round(coef(zigzag(i)) / qtab(zigzag(i))).toInt)
    val diff = q(0) - prevDc
    val dcSize = category(diff)
    val (dcCode, dcLen) = dcCodes(dcSize)
    bw.put(dcCode, dcLen)
    if (dcSize > 0) bw.put(magnitudeBits(diff, dcSize), dcSize)
    var run = 0
    var lastNonZero = 63
    while (lastNonZero > 0 && q(lastNonZero) == 0) lastNonZero -= 1
    var k = 1
    while (k <= lastNonZero) {
      if (q(k) == 0) run += 1
      else {
        while (run > 15) { // ZRL
          val (c0, l0) = acCodes(0xf0); bw.put(c0, l0); run -= 16
        }
        val size = category(q(k))
        require(size <= 10, s"AC coefficient ${q(k)} out of table range")
        val (c1, l1) = acCodes((run << 4) | size)
        bw.put(c1, l1)
        bw.put(magnitudeBits(q(k), size), size)
        run = 0
      }
      k += 1
    }
    if (lastNonZero < 63) { val (c, l) = acCodes(0x00); bw.put(c, l) } // EOB
    q(0)
  }

  /** Gather one 8x8 level-shifted block from a plane, edge-replicated. */
  private[operators] def gatherBlock(
      plane: Array[Byte], w: Int, h: Int, bx: Int, by: Int): Array[Double] = {
    val block = new Array[Double](64)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val sy = math.min(by * 8 + r, h - 1)
        val sx = math.min(bx * 8 + c, w - 1)
        block(r * 8 + c) = (plane(sy * w + sx) & 0xff) - 128.0
        c += 1
      }
      r += 1
    }
    block
  }

  /** Encode a row-major grayscale plane as baseline JFIF. Dimensions
    * need not be block-aligned; partial edge blocks replicate the last
    * row/column (the standard encoder convention).
    *
    * `restartInterval` > 0 writes a DRI segment and splits the entropy
    * stream into byte-aligned restart segments of that many MCUs (one
    * block each in grayscale), separated by RST0..RST7 cycling markers
    * with the DC predictor reset at each — what real camera output uses
    * so a corrupted segment loses one interval, not the whole scan
    * (T.81 B.2.4.4, E.2.4).
    */
  def encodeGray(w: Int, h: Int, px: Array[Byte],
      restartInterval: Int = 0): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h,
      s"need $w*$h=${w * h} pixels, got ${px.length}")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"restart interval must fit DRI's 16 bits: $restartInterval")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    // DQT: Pq=0 (8-bit), Tq=0, 64 entries in zigzag order
    seg(0xdb, 0x00 +: Array.tabulate(64)(i => quant(zigzag(i))))
    // SOF0: precision 8, h, w, 1 component (id 1, sampling 1x1, table 0)
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    // DHT: DC class 0 id 0, then AC class 1 id 0
    seg(0xc4, (0x00 +: (dcBits ++ dcVals)) ++ (0x10 +: (acBits ++ acVals)))
    if (restartInterval > 0) // DRI: restart every Ri MCUs
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    // SOS: 1 component, DC/AC table 0, full spectral range
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))

    val dcCodes = canonicalCodes(dcBits, dcVals)
    val acCodes = canonicalCodes(acBits, acVals)
    var bw = new BitWriter
    var prevDc = 0
    var sinceRestart = 0
    var rst = 0
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    val nBlocks = blocksX * blocksY
    var done = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          // close the segment (1-padded to a byte), emit the cycling
          // marker UNSTUFFED, reset the predictor
          val segBytes = bw.finish()
          out.write(segBytes, 0, segBytes.length)
          marker(0xd0 + rst)
          rst = (rst + 1) % 8
          bw = new BitWriter
          prevDc = 0
          sinceRestart = 0
        }
        prevDc = encodeBlock(bw, gatherBlock(px, w, h, bx, by),
          quant, dcCodes, acCodes, prevDc)
        sinceRestart += 1
        done += 1
        bx += 1
      }
      by += 1
    }
    require(done == nBlocks)
    val entropy = bw.finish()
    out.write(entropy, 0, entropy.length)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** 2x2-average chroma subsample (edge-replicated, +2 rounding — exact
    * on regions flat per 2x2). Full-res w×h plane → ceil(w/2)×ceil(h/2). */
  private[operators] def subsample(plane: Array[Byte], w: Int, h: Int): (Int, Int, Array[Byte]) = {
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val out = new Array[Byte](cw * ch)
    var y = 0
    while (y < ch) {
      var x = 0
      while (x < cw) {
        var s = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val sy = math.min(2 * y + dy, h - 1)
            val sx = math.min(2 * x + dx, w - 1)
            s += plane(sy * w + sx) & 0xff
            dx += 1
          }
          dy += 1
        }
        out(y * cw + x) = ((s + 2) / 4).toByte
        x += 1
      }
      y += 1
    }
    (cw, ch, out)
  }

  /** Encode full-resolution Y/Cb/Cr planes as baseline 4:2:0 JFIF —
    * the canonical color layout: luma quant table Tq=0, chroma Tq=1,
    * Huffman table id 0 for luma and id 1 for chroma (distinct ids, so a
    * decoder must honor the per-component table bindings), MCUs of four
    * Y blocks + Cb + Cr in T.81 interleave order. Chroma is 2x2-averaged
    * here; regions flat per MCU survive the whole pipeline exactly under
    * the DC quant step of 8 (same argument as the gray codec). */
  def encodeColor420(
      w: Int, h: Int,
      yP: Array[Byte], cbP: Array[Byte], crP: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && yP.length == w * h &&
      cbP.length == w * h && crP.length == w * h,
      s"need three $w*$h=${w * h} planes")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    // DQT: two 8-bit tables — Tq=0 luma, Tq=1 chroma
    seg(0xdb, (0x00 +: Array.tabulate(64)(i => quant(zigzag(i)))) ++
      (0x01 +: Array.tabulate(64)(i => quantC(zigzag(i)))))
    // SOF0: 3 components — Y id1 2x2 Tq0, Cb id2 1x1 Tq1, Cr id3 1x1 Tq1
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    // DHT: DC/AC id 0 (luma) and DC/AC id 1 (chroma) — same canonical
    // content, distinct ids (the binding is what's under test downstream)
    seg(0xc4, (0x00 +: (dcBits ++ dcVals)) ++ (0x10 +: (acBits ++ acVals)) ++
      (0x01 +: (dcBits ++ dcVals)) ++ (0x11 +: (acBits ++ acVals)))
    // SOS: Y tables 0/0, chroma tables 1/1
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))

    val dcCodes = canonicalCodes(dcBits, dcVals)
    val acCodes = canonicalCodes(acBits, acVals)
    val (cw, ch, cb) = subsample(cbP, w, h)
    val (_, _, cr) = subsample(crP, w, h)
    val bw = new BitWriter
    val mcusX = (w + 15) / 16
    val mcusY = (h + 15) / 16
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        var vb = 0
        while (vb < 2) { // four Y blocks, raster order within the MCU
          var hb = 0
          while (hb < 2) {
            dcY = encodeBlock(bw,
              gatherBlock(yP, w, h, 2 * mx + hb, 2 * my + vb),
              quant, dcCodes, acCodes, dcY)
            hb += 1
          }
          vb += 1
        }
        dcCb = encodeBlock(bw, gatherBlock(cb, cw, ch, mx, my),
          quantC, dcCodes, acCodes, dcCb)
        dcCr = encodeBlock(bw, gatherBlock(cr, cw, ch, mx, my),
          quantC, dcCodes, acCodes, dcCr)
        mx += 1
      }
      my += 1
    }
    val entropy = bw.finish()
    out.write(entropy, 0, entropy.length)
    marker(0xd9) // EOI
    out.toByteArray
  }

  // ---- decoder ----

  private[operators] final class BitReader(p: Array[Byte], var i: Int) {
    private var acc = 0
    private var nBits = 0
    var truncated = false
    /** Next bit, honoring FF00 stuffing; 0 past the end (flagged). */
    def bit(): Int = {
      if (nBits == 0) {
        if (i >= p.length) { truncated = true; return 0 }
        var b = p(i) & 0xff
        i += 1
        if (b == 0xff) {
          if (i < p.length && (p(i) & 0xff) == 0x00) i += 1 // stuffed FF
          else { // a real marker inside entropy data: stream over
            i -= 1; truncated = true; b = 0; return 0
          }
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    /** Byte-align and consume the next marker if it is RSTn: discards
      * the current partial byte (the encoder 1-padded it), skips 0xFF
      * fill bytes (T.81 B.1.1.2 allows any number before a marker), and
      * returns the restart index 0-7 — None if what follows is not a
      * well-formed restart marker (missing, truncated, or some other
      * marker: the caller fails the stream rather than resyncing into
      * garbage). */
    def restart(): Option[Int] = {
      nBits = 0
      if (i + 1 >= p.length || (p(i) & 0xff) != 0xff) return None
      var j = i + 1
      while (j < p.length - 1 && (p(j) & 0xff) == 0xff) j += 1
      val m = p(j) & 0xff
      if (m < 0xd0 || m > 0xd7) return None
      i = j + 1
      truncated = false
      Some(m - 0xd0)
    }
  }

  /** Decode tree for one DHT table: (code, len) -> symbol. */
  private[operators] final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val bySymbol = canonicalCodes(bits, vals)
    // len -> (firstCode, firstIndex) for canonical fast decode
    private val lookup: Map[(Int, Int), Int] =
      bySymbol.map { case (sym, (code, len)) => (len, code) -> sym }
    def decode(br: BitReader): Option[Int] = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit()
        len += 1
        if (br.truncated) return None
        lookup.get((len, code)) match {
          case Some(sym) => return Some(sym)
          case None => ()
        }
      }
      None
    }
  }

  /** Extend a magnitude-bits payload back to a signed value (T.81 F2.2.1). */
  private[operators] def extend(v: Int, size: Int): Int =
    if (size == 0) 0
    else if (v < (1 << (size - 1))) v - (1 << size) + 1
    else v

  /** Encode full-resolution Y/Cb/Cr planes as baseline 4:4:4 JFIF (no
    * subsampling — every MCU is one block per component). Same table
    * layout as [[encodeColor420]]. */
  def encodeColor444(
      w: Int, h: Int,
      yP: Array[Byte], cbP: Array[Byte], crP: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && yP.length == w * h &&
      cbP.length == w * h && crP.length == w * h,
      s"need three $w*$h=${w * h} planes")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, (0x00 +: Array.tabulate(64)(i => quant(zigzag(i)))) ++
      (0x01 +: Array.tabulate(64)(i => quantC(zigzag(i)))))
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xc4, (0x00 +: (dcBits ++ dcVals)) ++ (0x10 +: (acBits ++ acVals)) ++
      (0x01 +: (dcBits ++ dcVals)) ++ (0x11 +: (acBits ++ acVals)))
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcCodes = canonicalCodes(dcBits, dcVals)
    val acCodes = canonicalCodes(acBits, acVals)
    val bw = new BitWriter
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8
    var dcY = 0; var dcCb = 0; var dcCr = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        dcY = encodeBlock(bw, gatherBlock(yP, w, h, bx, by),
          quant, dcCodes, acCodes, dcY)
        dcCb = encodeBlock(bw, gatherBlock(cbP, w, h, bx, by),
          quantC, dcCodes, acCodes, dcCb)
        dcCr = encodeBlock(bw, gatherBlock(crP, w, h, bx, by),
          quantC, dcCodes, acCodes, dcCr)
        bx += 1
      }
      by += 1
    }
    val entropy = bw.finish()
    out.write(entropy, 0, entropy.length)
    marker(0xd9)
    out.toByteArray
  }

  /** One decoded component: sampling factors + its (padded-to-MCU) plane. */
  private[operators] final case class Comp(
      id: Int, hs: Int, vs: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0,
      var plane: Array[Byte] = null, var planeW: Int = 0, var planeH: Int = 0)

  /** Decode one entropy-coded block into a spatial 8x8 (+128, clamped). */
  private def decodeBlockTo(
      br: BitReader, dcTab: HuffTable, acTab: HuffTable, qt: Array[Int],
      prevDc: Int): Option[(Int, Array[Byte])] = {
    val q = new Array[Int](64) // zigzag order
    val dcSize = dcTab.decode(br).getOrElse(return None)
    if (dcSize > 11) return None
    val diff = extend(br.bits(dcSize), dcSize)
    if (br.truncated) return None
    val dc = prevDc + diff
    q(0) = dc
    var k = 1
    var eob = false
    while (k < 64 && !eob) {
      val sym = acTab.decode(br).getOrElse(return None)
      if (sym == 0x00) eob = true
      else if (sym == 0xf0) k += 16
      else {
        val run = sym >> 4
        val size = sym & 0x0f
        k += run
        if (k > 63 || size == 0) return None
        q(k) = extend(br.bits(size), size)
        if (br.truncated) return None
        k += 1
      }
    }
    val coef = new Array[Double](64)
    var z = 0
    while (z < 64) {
      coef(zigzag(z)) = q(z).toDouble * qt(zigzag(z))
      z += 1
    }
    val sp = idct(coef)
    val out = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      val v = math.round(sp(i) + 128.0).toInt
      out(i) = math.max(0, math.min(255, v)).toByte
      i += 1
    }
    Some((dc, out))
  }

  /** Fixed-point YCbCr→RGB (16.16 constants, bias keeps operands
    * positive so `>> 16` is plain division — replayable as
    * `(x + 32768 + 16777216) // 65536 - 256` in any SQL dialect). */
  @inline private[operators] def clamp8(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v
  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    val cbd = cb - 128
    val crd = cr - 128
    val r = clamp8(y + (((91881 * crd + 32768 + (1 << 24)) >> 16) - 256))
    val g = clamp8(y - (((22554 * cbd + 46802 * crd + 32768 + (1 << 24)) >> 16) - 256))
    val b = clamp8(y + (((116130 * cbd + 32768 + (1 << 24)) >> 16) - 256))
    (r, g, b)
  }

  /** Shared baseline parse + MCU decode. Contract: baseline SOF0, 8-bit
    * quant, no restart intervals; 1 component at 1x1, or 3 components as
    * 4:4:4 (all 1x1) or 4:2:0 (Y 2x2, chroma 1x1). Tables are built from
    * the stream's DQT/DHT and bound per component from SOF/SOS ids. */
  private def decodeBaseline(p: Array[Byte]): Option[(Int, Int, Array[Comp])] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    var i = 2
    var w = 0; var h = 0
    val qts = new Array[Array[Int]](4) // natural order, by Tq
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Comp] = null
    var restartInterval = 0
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 4 > p.length) return None
      if ((p(i) & 0xff) != 0xff) return None
      val m = p(i + 1) & 0xff
      if (m == 0xd9) return None // EOI before SOS
      val len = ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > p.length) return None
      val body = i + 4
      val bodyLen = len - 2
      m match {
        case 0xdb => // DQT: several tables per segment, 8-bit only
          var j = body
          while (j < body + bodyLen) {
            val pqTq = p(j) & 0xff
            if ((pqTq >> 4) != 0) return None // 16-bit table out of contract
            if (j + 65 > body + bodyLen) return None
            val tq = pqTq & 0x0f
            if (tq > 3) return None
            val qt = new Array[Int](64)
            var k = 0
            while (k < 64) { qt(zigzag(k)) = p(j + 1 + k) & 0xff; k += 1 }
            qts(tq) = qt
            j += 65
          }
        case 0xc0 => // SOF0 baseline
          if (bodyLen < 8 || (p(body) & 0xff) != 8) return None
          h = ((p(body + 1) & 0xff) << 8) | (p(body + 2) & 0xff)
          w = ((p(body + 3) & 0xff) << 8) | (p(body + 4) & 0xff)
          val nComp = p(body + 5) & 0xff
          if (nComp != 1 && nComp != 3) return None
          if (bodyLen < 6 + 3 * nComp) return None
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
          comps = Array.tabulate(nComp) { c =>
            val o = body + 6 + 3 * c
            val samp = p(o + 1) & 0xff
            Comp(p(o) & 0xff, samp >> 4, samp & 0x0f, p(o + 2) & 0xff)
          }
          val sampOk =
            if (nComp == 1) comps(0).hs == 1 && comps(0).vs == 1
            else {
              val y = comps(0); val u = comps(1); val v = comps(2)
              val chroma11 = u.hs == 1 && u.vs == 1 && v.hs == 1 && v.vs == 1
              ((y.hs == 1 && y.vs == 1) || (y.hs == 2 && y.vs == 2)) && chroma11
            }
          if (!sampOk) return None
          if (comps.exists(_.tq > 3)) return None
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // extended/progressive/lossless out of contract
        case 0xc4 => // DHT: several tables per segment, by (class, id)
          var j = body
          while (j < body + bodyLen) {
            val tcTh = p(j) & 0xff
            if (j + 17 > body + bodyLen) return None
            val bits = Array.tabulate(16)(k => p(j + 1 + k) & 0xff)
            val n = bits.sum
            if (j + 17 + n > body + bodyLen) return None
            val vals = Array.tabulate(n)(k => p(j + 17 + k) & 0xff)
            val th = tcTh & 0x0f
            if (th > 3) return None
            (tcTh >> 4) match {
              case 0 => dcTabs(th) = new HuffTable(bits, vals)
              case 1 => acTabs(th) = new HuffTable(bits, vals)
              case _ => return None
            }
            j += 17 + n
          }
        case 0xdd => // DRI: restart every Ri MCUs (0 disables)
          if (bodyLen != 2) return None
          restartInterval = ((p(body) & 0xff) << 8) | (p(body + 1) & 0xff)
        case 0xda =>
          if (comps == null) return None
          val ns = p(body) & 0xff
          if (bodyLen < 4 + 2 * ns || ns != comps.length) return None
          var c = 0
          while (c < ns) {
            val cid = p(body + 1 + 2 * c) & 0xff
            val tdTa = p(body + 2 + 2 * c) & 0xff
            val comp = comps.find(_.id == cid).getOrElse(return None)
            comp.td = tdTa >> 4
            comp.ta = tdTa & 0x0f
            if (comp.td > 3 || comp.ta > 3) return None
            c += 1
          }
          sosAt = body + bodyLen
        case _ => () // APPn/COM/etc: skip
      }
      i += 2 + len
    }
    if (w == 0 || comps == null) return None
    if (comps.exists(c => qts(c.tq) == null || dcTabs(c.td) == null ||
      acTabs(c.ta) == null)) return None

    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      c.planeW = mcusX * 8 * c.hs
      c.planeH = mcusY * 8 * c.vs
      c.plane = new Array[Byte](c.planeW * c.planeH)
    }
    val br = new BitReader(p, sosAt)
    val prevDc = new Array[Int](comps.length)
    var mcuCount = 0
    var expectRst = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount > 0 &&
            mcuCount % restartInterval == 0) {
          // byte-aligned resync on the CYCLING marker index (a skipped or
          // repeated segment shows up as an index mismatch), DC
          // predictors reset (T.81 E.2.4)
          br.restart() match {
            case Some(m) if m == expectRst =>
              expectRst = (expectRst + 1) % 8
              java.util.Arrays.fill(prevDc, 0)
            case _ => return None
          }
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var vb = 0
          while (vb < c.vs) {
            var hb = 0
            while (hb < c.hs) {
              val (dc, sp) = decodeBlockTo(br, dcTabs(c.td), acTabs(c.ta),
                qts(c.tq), prevDc(ci)).getOrElse(return None)
              prevDc(ci) = dc
              val ox = (mx * c.hs + hb) * 8
              val oy = (my * c.vs + vb) * 8
              var r = 0
              while (r < 8) {
                System.arraycopy(sp, r * 8, c.plane, (oy + r) * c.planeW + ox, 8)
                r += 1
              }
              hb += 1
            }
            vb += 1
          }
          ci += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    Some((w, h, comps))
  }

  /** Decode a grayscale JFIF stream: (w, h, row-major pixels). None for
    * anything out of contract — color streams included (see
    * [[decodeRgb]]); the Huffman and quant tables are BUILT FROM THE
    * STREAM's DHT/DQT, not assumed. Progressive (SOF2) streams route to
    * [[JpegProgressive]] instead of rejecting. */
  def decodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (JpegProgressive.isProgressive(p)) JpegProgressive.decodeGray(p)
    else decodeBaseline(p).collect {
      case (w, h, comps) if comps.length == 1 =>
        val c = comps(0)
        val out = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          System.arraycopy(c.plane, y * c.planeW, out, y * w, w)
          y += 1
        }
        (w, h, out)
    }

  /** Decode a baseline COLOR JFIF stream (4:4:4 or 4:2:0) to (w, h,
    * interleaved RGB): chroma upsamples by sample replication, then the
    * fixed-point [[ycbcrToRgb]]. None for grayscale streams and anything
    * out of the baseline contract. */
  def decodeRgb(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (JpegProgressive.isProgressive(p)) JpegProgressive.decodeRgb(p)
    else decodeBaseline(p).collect {
      case (w, h, comps) if comps.length == 3 =>
        val yC = comps(0); val cbC = comps(1); val crC = comps(2)
        val hMax = comps.map(_.hs).max
        val vMax = comps.map(_.vs).max
        val out = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val yv = yC.plane(y * yC.planeW + x) & 0xff
            val cy = y * cbC.vs / vMax
            val cx = x * cbC.hs / hMax
            val cbv = cbC.plane(cy * cbC.planeW + cx) & 0xff
            val crv = crC.plane(cy * crC.planeW + cx) & 0xff
            val (r, g, b) = ycbcrToRgb(yv, cbv, crv)
            val o = 3 * (y * w + x)
            out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
            x += 1
          }
          y += 1
        }
        (w, h, out)
    }
}
