package graft.operators

import scala.collection.mutable.ArrayBuffer

/** FLAC fixed-predictor subset — the first COMPRESSED audio codec in the
  * family (PCM/G.711/ADPCM are fixed-rate): a big-endian bitstream whose
  * every frame is sync-coded, CRC-guarded twice (CRC-8 over the header,
  * CRC-16 over the whole frame), and predicted by one of the five fixed
  * polynomial predictors with Rice-coded residuals. Implemented from the
  * public format specification (RFC 9639 / xiph.org):
  *
  *   - `fLaC` magic + STREAMINFO metadata block (other blocks skipped)
  *   - frame header: 14-bit sync, blocking strategy 0, 16-bit block
  *     size (code 0b0111), sample rate from STREAMINFO, independent
  *     channels, 8/16-bit sample size, UTF-8-coded frame number
  *   - subframes: CONSTANT, VERBATIM, FIXED orders 0-4, and LPC orders
  *     1-32 (quantized coefficients, 4-bit precision code, 5-bit signed
  *     shift, 64-bit accumulator) with Rice partitions (4-bit
  *     parameter, escape code 15 → raw b-bit residuals)
  *
  * Decode is LOSSLESS, so an encode→decode round trip is identity per
  * sample — the property both the spec and the oracle replay. Same
  * reject-don't-guess contract as the other codecs: bad magic, missing
  * or short STREAMINFO, reserved bits set, unknown codes, CRC mismatch
  * on either guard, residuals running past the frame, a sample total
  * disagreeing with STREAMINFO, or trailing garbage all decode to None —
  * a corrupt shard quarantines, never half-plays.
  *
  * Beyond-reference operator (the reference pipeline is relational-only);
  * per-record decode shape matches the q203 PCM family.
  */
object Flac {

  private final class Bad extends RuntimeException("bad flac")
  private def bad(): Nothing = throw new Bad

  // ---------------------------------------------------------------- CRC
  /** CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the header guard. */
  def crc8(buf: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= buf(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the frame guard. */
  def crc16(buf: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (buf(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------- bit plumbing
  private final class BitWriter {
    private val out = new ArrayBuffer[Byte]()
    private var cur = 0
    private var nBits = 0
    def size: Int = out.length
    def bytes: Array[Byte] = { require(nBits == 0); out.toArray }
    def byteAt(i: Int): Byte = out(i)
    def write(value: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((value >>> k) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out += cur.toByte; cur = 0; nBits = 0 }
        k -= 1
      }
    }
    def writeUnary(q: Int): Unit = { var i = 0; while (i < q) { write(0, 1); i += 1 }; write(1, 1) }
    def align(): Unit = if (nBits != 0) write(0, 8 - nBits)
    def writeBytes(b: Array[Byte]): Unit = { require(nBits == 0); out ++= b }
  }

  private final class BitReader(val buf: Array[Byte], startByte: Int) {
    var pos: Long = startByte.toLong * 8
    def bytePos: Int = { if ((pos & 7) != 0) bad(); (pos >> 3).toInt }
    def atByteBoundary: Boolean = (pos & 7) == 0
    def read(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) {
        val bp = (pos >> 3).toInt
        if (bp >= buf.length) bad()
        v = (v << 1) | ((buf(bp) >> (7 - (pos & 7)).toInt) & 1)
        pos += 1
        k += 1
      }
      v
    }
    def readSigned(n: Int): Int = {
      val v = read(n)
      (v << (64 - n) >> (64 - n)).toInt
    }
    def readUnary(): Int = {
      var q = 0
      while (read(1) == 0) { q += 1; if (q > (1 << 24)) bad() }
      q
    }
    def align(): Unit = {
      while ((pos & 7) != 0) { if (read(1) != 0) bad() } // padding must be 0
    }
  }

  // --------------------------------------------------- fixed predictors
  /** Residual of the order-k fixed polynomial predictor, in place of the
    * spec's difference cascade: coefficients are the alternating binomial
    * row (1), (1,-1), (1,-2,1), …  */
  private def residual(s: Array[Int], i: Int, order: Int): Long = order match {
    case 0 => s(i)
    case 1 => s(i).toLong - s(i - 1)
    case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
    case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
    case 4 => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) - 4L * s(i - 3) + s(i - 4)
    case _ => bad()
  }

  private def reconstruct(s: Array[Int], i: Int, order: Int, r: Long): Long =
    order match {
      case 0 => r
      case 1 => r + s(i - 1)
      case 2 => r + 2L * s(i - 1) - s(i - 2)
      case 3 => r + 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
      case 4 => r + 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
      case _ => bad()
    }

  private def zigzag(r: Long): Long = if (r >= 0) 2 * r else -2 * r - 1
  private def unzigzag(u: Long): Long = if ((u & 1) == 0) u >> 1 else -((u >> 1) + 1)

  // ------------------------------------------------------------ encoder

  /** UTF-8-style frame-number coding (the FLAC extension of UTF-8 to
    * 36-bit values). */
  private def writeFrameNumber(w: BitWriter, n: Long): Unit = {
    if (n < 0x80) w.write(n, 8)
    else if (n < 0x800) { w.write(0xc0 | (n >> 6), 8); w.write(0x80 | (n & 0x3f), 8) }
    else if (n < 0x10000) {
      w.write(0xe0 | (n >> 12), 8)
      w.write(0x80 | ((n >> 6) & 0x3f), 8); w.write(0x80 | (n & 0x3f), 8)
    } else bad() // fixtures never need more; larger forms omitted
  }

  private def readFrameNumber(r: BitReader): Long = {
    val b0 = r.read(8)
    if ((b0 & 0x80) == 0) b0
    else {
      var extra = 0
      var v = 0L
      if ((b0 & 0xe0) == 0xc0) { extra = 1; v = b0 & 0x1f }
      else if ((b0 & 0xf0) == 0xe0) { extra = 2; v = b0 & 0x0f }
      else if ((b0 & 0xf8) == 0xf0) { extra = 3; v = b0 & 0x07 }
      else if ((b0 & 0xfc) == 0xf8) { extra = 4; v = b0 & 0x03 }
      else if ((b0 & 0xfe) == 0xfc) { extra = 5; v = b0 & 0x01 }
      else if (b0 == 0xfe) { extra = 6; v = 0 }
      else bad()
      var i = 0
      while (i < extra) {
        val b = r.read(8)
        if ((b & 0xc0) != 0x80) bad()
        v = (v << 6) | (b & 0x3f)
        i += 1
      }
      v
    }
  }

  /** Cheapest coding for a partition: (param, rawBits). param 0-14 is a
    * Rice parameter (exact cost scan); param 15 is the escape — chosen
    * when raw `rawBits`-bit residuals are cheaper than the best Rice
    * (the pathological-residual case the escape exists for). */
  private def bestRice(us: Array[Long], rs: Array[Long]): (Int, Int) = {
    var best = 0
    var bestCost = Long.MaxValue
    var p = 0
    while (p <= 14) {
      var cost = 0L
      var i = 0
      while (i < us.length) { cost += (us(i) >>> p) + 1 + p; i += 1 }
      if (cost < bestCost) { bestCost = cost; best = p }
      p += 1
    }
    var maxBits = 1
    var i = 0
    while (i < rs.length) {
      val v = rs(i)
      val need = 65 - java.lang.Long.numberOfLeadingZeros(if (v < 0) ~v else v)
      if (need > maxBits) maxBits = need
      i += 1
    }
    if (maxBits <= 31 && 5L + maxBits.toLong * rs.length < bestCost)
      (15, maxBits)
    else (best, 0)
  }

  /** Encode independent-channel audio. `samples(ch)(i)`, all channels the
    * same length; `bits` ∈ {8, 16}; every frame `blockSize` samples (the
    * last one shorter). Subframe type per (frame, channel) is chosen by
    * content: all-equal → CONSTANT, else LPC when `lpcCoefs` is given
    * (quantized coefficients at `lpcPrec` bits, right-shift `lpcShift` —
    * encoding computes exact residuals against the integer predictor, so
    * ANY coefficient choice round-trips losslessly), else FIXED with the
    * given order. */
  def encode(samples: Array[Array[Int]], bits: Int, sampleRate: Int,
      blockSize: Int, fixedOrder: Int, partitionOrder: Int = 1,
      lpcCoefs: Array[Int] = null, lpcPrec: Int = 0,
      lpcShift: Int = 0): Array[Byte] = {
    require(samples.nonEmpty && samples.forall(_.length == samples(0).length))
    require(samples(0).length > 0, "empty streams are out of subset")
    require(bits == 8 || bits == 16)
    require(fixedOrder >= 0 && fixedOrder <= 4)
    if (lpcCoefs != null) {
      require(lpcCoefs.length >= 1 && lpcCoefs.length <= 32)
      require(lpcPrec >= 2 && lpcPrec <= 15)
      require(lpcShift >= 0 && lpcShift <= 15)
      require(lpcCoefs.forall(c =>
        c >= -(1 << (lpcPrec - 1)) && c < (1 << (lpcPrec - 1))))
    }
    val nCh = samples.length
    val total = samples(0).length
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))

    // STREAMINFO: last-block flag set, type 0, length 34
    val si = new BitWriter
    si.write(blockSize, 16); si.write(blockSize, 16) // min/max block size
    si.write(0, 24); si.write(0, 24)                 // frame sizes unknown
    si.write(sampleRate, 20)
    si.write(nCh - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    (0 until 16).foreach(_ => si.write(0, 8))        // md5 unknown
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.bytes)

    var frameNo = 0L
    var start = 0
    while (start < total) {
      val bs = math.min(blockSize, total - start)
      val w = new BitWriter
      w.write(0x3ffe, 14) // sync
      w.write(0, 1)       // reserved
      w.write(0, 1)       // blocking strategy: fixed
      w.write(0x7, 4)     // block size: 16-bit value - 1 follows
      w.write(0x0, 4)     // sample rate: from STREAMINFO
      w.write(nCh - 1, 4) // channel assignment: independent
      w.write(if (bits == 8) 1 else 4, 3)
      w.write(0, 1)       // reserved
      writeFrameNumber(w, frameNo)
      w.write(bs - 1, 16)
      val headBytes = w.bytes // byte-aligned here by construction
      val w2 = new BitWriter
      w2.writeBytes(headBytes)
      w2.write(crc8(headBytes, 0, headBytes.length), 8)

      var ch = 0
      while (ch < nCh) {
        val s = new Array[Int](bs)
        Array.copy(samples(ch), start, s, 0, bs)
        val allEq = s.forall(_ == s(0))
        w2.write(0, 1) // subframe pad bit
        if (allEq) {
          w2.write(0, 6) // CONSTANT
          w2.write(0, 1) // wasted bits
          w2.write(s(0).toLong & ((1L << bits) - 1), bits)
        } else {
          val useLpc = lpcCoefs != null && bs > lpcCoefs.length
          val order =
            if (useLpc) lpcCoefs.length else math.min(fixedOrder, bs - 1)
          if (useLpc) w2.write(32 | (order - 1), 6) // LPC
          else w2.write(8 + order, 6)               // FIXED
          w2.write(0, 1) // wasted bits
          var i = 0
          while (i < order) {
            w2.write(s(i).toLong & ((1L << bits) - 1), bits); i += 1
          }
          if (useLpc) {
            w2.write(lpcPrec - 1, 4)
            w2.write(lpcShift, 5)
            lpcCoefs.foreach(c =>
              w2.write(c.toLong & ((1L << lpcPrec) - 1), lpcPrec))
          }
          def resOf(idx: Int): Long =
            if (useLpc) {
              var acc = 0L
              var j = 0
              while (j < order) { acc += lpcCoefs(j).toLong * s(idx - 1 - j); j += 1 }
              s(idx) - (acc >> lpcShift)
            } else residual(s, idx, order)
          // residual: method 00 (4-bit Rice), partitions must divide bs
          val po = if (partitionOrder > 0 && bs % (1 << partitionOrder) == 0 &&
            bs / (1 << partitionOrder) > order) partitionOrder else 0
          w2.write(0, 2)
          w2.write(po, 4)
          val nPart = 1 << po
          val partLen = bs / nPart
          var part = 0
          var ri = order
          while (part < nPart) {
            val cnt = (if (part == 0) partLen - order else partLen)
            val rs = new Array[Long](cnt)
            val us = new Array[Long](cnt)
            var k = 0
            while (k < cnt) {
              rs(k) = resOf(ri + k); us(k) = zigzag(rs(k)); k += 1
            }
            val (p, rawBits) = bestRice(us, rs)
            w2.write(p, 4)
            if (p == 15) {
              w2.write(rawBits, 5)
              k = 0
              while (k < cnt) {
                w2.write(rs(k) & ((1L << rawBits) - 1), rawBits); k += 1
              }
            } else {
              k = 0
              while (k < cnt) {
                w2.writeUnary((us(k) >>> p).toInt)
                w2.write(us(k) & ((1L << p) - 1), p)
                k += 1
              }
            }
            ri += cnt
            part += 1
          }
        }
        ch += 1
      }
      w2.align()
      val frameBytes = w2.bytes
      out.write(frameBytes)
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      out.write(c16 >> 8); out.write(c16 & 0xff)
      start += bs
      frameNo += 1
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ decoder

  final case class Audio(sampleRate: Int, channels: Int, bits: Int,
      samples: Array[Array[Int]])

  /** Decode, or None on any grammar/CRC violation. */
  def decode(blob: Array[Byte]): Option[Audio] =
    try Some(decodeOrThrow(blob)) catch {
      case _: Bad => None
      case _: IndexOutOfBoundsException => None
      case _: IllegalArgumentException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeOrThrow(blob: Array[Byte]): Audio = {
    if (blob.length < 4 + 4 + 34) bad()
    if (new String(blob, 0, 4, "US-ASCII") != "fLaC") bad()

    // metadata blocks; STREAMINFO must come first (spec) and exist once
    var p = 4
    var last = false
    var first = true
    var rate = -1; var nCh = -1; var bits = -1; var total = -1L
    while (!last) {
      if (p + 4 > blob.length) bad()
      val h = blob(p) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((blob(p + 1) & 0xff) << 16) | ((blob(p + 2) & 0xff) << 8) |
        (blob(p + 3) & 0xff)
      p += 4
      if (p + len > blob.length) bad()
      if (first) {
        if (btype != 0 || len != 34) bad()
        val r = new BitReader(blob, p)
        val minBs = r.read(16); val maxBs = r.read(16)
        if (minBs < 16 && minBs != maxBs) bad() // spec: 16 ≤ block size
        r.read(24); r.read(24)
        rate = r.read(20).toInt
        nCh = r.read(3).toInt + 1
        bits = r.read(5).toInt + 1
        total = r.read(36)
        if (bits != 8 && bits != 16) bad() // subset
        first = false
      } else if (btype == 0 || btype == 127) bad() // dup STREAMINFO / invalid
      p += len
    }
    if (first) bad()

    val chans = Array.fill(nCh)(new ArrayBuffer[Int]())
    var expectFrame = 0L
    while (p < blob.length) {
      val frameStart = p
      val r = new BitReader(blob, p)
      if (r.read(14) != 0x3ffe) bad()
      if (r.read(1) != 0) bad()
      if (r.read(1) != 0) bad() // fixed-blocksize streams only in subset
      val bsCode = r.read(4).toInt
      val srCode = r.read(4).toInt
      val chAsg = r.read(4).toInt
      val ssCode = r.read(3).toInt
      if (r.read(1) != 0) bad()
      if (chAsg != nCh - 1 || chAsg > 7) bad() // independent channels only
      val frameBits = ssCode match {
        case 0 => bits
        case 1 => 8
        case 4 => 16
        case _ => bad() // subset
      }
      if (frameBits != bits) bad()
      val fno = readFrameNumber(r)
      if (fno != expectFrame) bad()
      val bs = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.read(8).toInt + 1
        case 7 => r.read(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => bad()
      }
      srCode match {
        case 0 => ()
        case 12 => if (r.read(8) * 1000 != rate) bad()
        case 13 => if (r.read(16) != rate) bad()
        case 14 => if (r.read(16) * 10 != rate) bad()
        case c if c >= 1 && c <= 11 => () // table codes: accept, rate fixed by STREAMINFO
        case _ => bad()
      }
      if (!r.atByteBoundary) bad()
      val headEnd = r.bytePos
      if (r.read(8) != crc8(blob, frameStart, headEnd)) bad()

      var ch = 0
      while (ch < nCh) {
        if (r.read(1) != 0) bad()
        val stype = r.read(6).toInt
        val wasted = r.read(1)
        if (wasted != 0) bad() // subset: no wasted bits
        val s = new Array[Int](bs)
        // shared Rice-partition residual walk; `recon` turns (index,
        // residual) into the reconstructed sample for the subframe type
        def readResiduals(order: Int, recon: (Int, Long) => Long): Unit = {
          if (r.read(2) != 0) bad() // only 4-bit-Rice method in subset
          val po = r.read(4).toInt
          val nPart = 1 << po
          if (bs % nPart != 0) bad()
          val partLen = bs / nPart
          if (partLen <= order && nPart > 1) bad()
          var part = 0
          var i = order
          while (part < nPart) {
            val cnt = if (part == 0) partLen - order else partLen
            if (cnt < 0) bad()
            val prm = r.read(4).toInt
            var k = 0
            if (prm == 15) { // escape: raw residuals
              val raw = r.read(5).toInt
              while (k < cnt) {
                val res = if (raw == 0) 0L else r.readSigned(raw).toLong
                val v = recon(i, res)
                if (v < Int.MinValue || v > Int.MaxValue) bad()
                s(i) = v.toInt; i += 1; k += 1
              }
            } else {
              while (k < cnt) {
                val q = r.readUnary()
                val u = (q.toLong << prm) | r.read(prm)
                val v = recon(i, unzigzag(u))
                if (v < Int.MinValue || v > Int.MaxValue) bad()
                s(i) = v.toInt; i += 1; k += 1
              }
            }
            part += 1
          }
        }
        if (stype == 0) { // CONSTANT
          val v = r.readSigned(bits)
          java.util.Arrays.fill(s, v)
        } else if (stype == 1) { // VERBATIM
          var i = 0
          while (i < bs) { s(i) = r.readSigned(bits); i += 1 }
        } else if (stype >= 8 && stype <= 12) { // FIXED order 0-4
          val order = stype - 8
          if (order > bs) bad()
          var i = 0
          while (i < order) { s(i) = r.readSigned(bits); i += 1 }
          readResiduals(order, (j, res) => reconstruct(s, j, order, res))
        } else if (stype >= 32 && stype <= 63) { // LPC order 1-32
          val order = stype - 31
          if (order > bs) bad()
          var i = 0
          while (i < order) { s(i) = r.readSigned(bits); i += 1 }
          val precM1 = r.read(4).toInt
          if (precM1 == 15) bad() // invalid precision code per spec
          val prec = precM1 + 1
          val shift = r.readSigned(5)
          if (shift < 0) bad() // negative shift reserved
          val coefs = new Array[Int](order)
          var j = 0
          while (j < order) { coefs(j) = r.readSigned(prec); j += 1 }
          readResiduals(order, (idx, res) => {
            var acc = 0L
            var jj = 0
            while (jj < order) { acc += coefs(jj).toLong * s(idx - 1 - jj); jj += 1 }
            (acc >> shift) + res
          })
        } else bad() // reserved types: out of subset
        // range check against the declared sample size
        val lo = -(1 << (bits - 1)); val hi = (1 << (bits - 1)) - 1
        var i2 = 0
        while (i2 < bs) { if (s(i2) < lo || s(i2) > hi) bad(); i2 += 1 }
        chans(ch) ++= s
        ch += 1
      }
      r.align()
      val frameEnd = r.bytePos
      val c16 = ((r.read(8) << 8) | r.read(8)).toInt
      if (c16 != crc16(blob, frameStart, frameEnd)) bad()
      p = frameEnd + 2
      expectFrame += 1
    }
    if (chans(0).length.toLong != total) bad() // STREAMINFO total must agree
    Audio(rate, nCh, bits, chans.map(_.toArray))
  }
}
