package graft.operators

/** LZMA2 decoder, from scratch — the compression layer inside `.xz`
  * (see [[Xz]] for the container). Grammar per the public LZMA/LZMA2
  * specification (the reference SDK's documented behavior; interop
  * pinned against the on-classpath reference codec xz-java and
  * CPython's liblzma in tools/fuzz_xz_diff.py).
  *
  * LZMA2 is a chunked envelope over raw LZMA: a control byte per
  * chunk — 0x00 end; 0x01/0x02 uncompressed chunk (with/without
  * dictionary reset), 2-byte BE size-1; 0x80|x compressed chunk with
  * the unpacked size's high 5 bits in the control byte, 2-byte BE
  * unpacked-size-low and compressed-size fields, and a 2-bit reset
  * code (0 none / 1 state / 2 state+props, props byte follows /
  * 3 state+props+dict).
  *
  * Raw LZMA: a binary range coder over adaptive 11-bit probabilities:
  * 12-state match/rep state machine, literal coder with lc/lp/pb
  * contexts and matched-literal mode, two length coders (choice /
  * choice2 / low / mid / high bit trees), distance slots with
  * reverse-bit-tree "special positions" for slots 4..13 and direct
  * bits + 4 reversed align bits beyond, and the rep0..rep3 distance
  * history. Chunk boundaries must land EXACTLY (range coder fully
  * normalized, sizes consumed to the byte) — reject-don't-guess.
  */
object Lzma2 {

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  /** Decode an LZMA2 chunk stream into exactly ≤ maxOut bytes.
    * Throws Xz.BailException-compatible reasons via Either. */
  def decode(src: Array[Byte], off: Int, len: Int,
      maxOut: Int): Either[String, Array[Byte]] =
    try Right(run(src, off, len, maxOut))
    catch { case e: Bail => Left(e.reason) }

  /** Raw LZMA1 — the 7z folder coder 03 01 01: one packed props byte
    * (lc/lp/pb), dictionary size carried separately, OUTPUT SIZE KNOWN
    * from the folder's unpack size (7z encoders write end-marker-free
    * streams when the size is recorded, which it always is). One
    * whole-stream chunk over the same range decoder as LZMA2.
    *
    * `eos = true` is the ZIP method-14 shape (APPNOTE 5.8 / liblzma
    * raw LZMA1): the stream ends with the 0xFFFFFFFF END MARKER after
    * exactly `outLen` bytes, followed only by range-coder flush tail. */
  private[operators] def lzma1Decode(src: Array[Byte], off: Int, len: Int,
      props: Int, outLen: Int, maxOut: Int, eos: Boolean = false)
      : Either[String, Array[Byte]] =
    try {
      if (outLen < 0 || outLen > maxOut) bail("lzma_bomb")
      if (props > (4 * 5 + 4) * 9 + 8) bail("bad_lzma_props")
      val lc = props % 9
      val lp = (props / 9) % 5
      val pb = props / 45
      val out = new Array[Byte](outLen)
      if (outLen > 0 || eos) {
        val p = newProbs(lc, lp)
        lzmaDecode(src, off, len, out, 0, outLen, 0, p, lc, lp, pb,
          0, 0, 0, 0, 0, eos)
      }
      Right(out)
    } catch { case e: Bail => Left(e.reason) }

  private def run(src: Array[Byte], off: Int, len: Int,
      maxOut: Int): Array[Byte] = {
    var i = off
    val end = off + len
    var out = new Array[Byte](math.min(maxOut, 64 * 1024))
    var n = 0
    def ensure(extra: Int): Unit = {
      if (n + extra > maxOut) bail("lzma2_bomb")
      if (n + extra > out.length) {
        var cap = out.length
        while (cap < n + extra) cap <<= 1
        out = java.util.Arrays.copyOf(out, math.min(cap, maxOut))
      }
    }

    // persistent LZMA state across chunks (reset by control codes)
    var lc = -1; var lp = -1; var pb = -1
    var probs: Array[Short] = null
    var state = 0
    var rep0 = 0; var rep1 = 0; var rep2 = 0; var rep3 = 0
    var dictStart = 0 // dictionary reset boundary: matches may not cross

    def u16be(): Int = {
      if (i + 2 > end) bail("truncated_lzma2")
      val v = ((src(i) & 0xff) << 8) | (src(i + 1) & 0xff)
      i += 2
      v
    }

    var done = false
    while (!done) {
      if (i >= end) bail("truncated_lzma2")
      val control = src(i) & 0xff; i += 1
      if (control == 0x00) done = true
      else if (control == 0x01 || control == 0x02) {
        // uncompressed chunk; 0x01 resets the dictionary
        val size = u16be() + 1
        if (i + size > end) bail("truncated_lzma2")
        if (control == 0x01) dictStart = n
        ensure(size)
        System.arraycopy(src, i, out, n, size)
        i += size; n += size
        state = 0; rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
      } else if ((control & 0x80) != 0) {
        val unpacked = ((control & 0x1f) << 16) + u16be() + 1
        val packed = u16be() + 1
        val resetCode = (control >> 5) & 3
        if (resetCode >= 2) {
          if (i >= end) bail("truncated_lzma2")
          val props = src(i) & 0xff; i += 1
          if (props > (4 * 5 + 4) * 9 + 8) bail("bad_lzma_props")
          lc = props % 9
          lp = (props / 9) % 5
          pb = props / 45
          if (lc + lp > 4) bail("bad_lzma_props") // LZMA2 restriction
          probs = null // sizes depend on lc/lp
        }
        if (lc < 0) bail("missing_lzma_props")
        if (resetCode >= 1 || probs == null) {
          probs = newProbs(lc, lp)
          state = 0; rep0 = 0; rep1 = 0; rep2 = 0; rep3 = 0
        }
        if (resetCode == 3) dictStart = n
        if (i + packed > end) bail("truncated_lzma2")
        ensure(unpacked)
        val res = lzmaDecode(src, i, packed, out, n, unpacked, dictStart,
          probs, lc, lp, pb, state, rep0, rep1, rep2, rep3)
        state = res(0); rep0 = res(1); rep1 = res(2); rep2 = res(3)
        rep3 = res(4)
        i += packed
        n += unpacked
      } else bail("bad_lzma2_control")
    }
    java.util.Arrays.copyOf(out, n)
  }

  // ---- raw LZMA over one chunk ----

  // probability array layout offsets (computed for lc/lp at reset)
  private val NumStates = 12
  private val OffIsMatch = 0 // 12 << 4
  private val OffIsRep = OffIsMatch + (NumStates << 4)
  private val OffIsRepG0 = OffIsRep + NumStates
  private val OffIsRepG1 = OffIsRepG0 + NumStates
  private val OffIsRepG2 = OffIsRepG1 + NumStates
  private val OffIsRep0Long = OffIsRepG2 + NumStates
  private val OffPosSlot = OffIsRep0Long + (NumStates << 4) // 4 * 64
  private val OffSpecPos = OffPosSlot + 4 * 64 // 115
  private val OffAlign = OffSpecPos + 115 // 16
  private val OffLenCoder = OffAlign + 16 // 2 + 16*8 + 16*8 + 256
  private val LenCoderSize = 2 + (16 << 3) + (16 << 3) + 256
  private val OffRepLenCoder = OffLenCoder + LenCoderSize
  private val OffLiteral = OffRepLenCoder + LenCoderSize

  private def newProbs(lc: Int, lp: Int): Array[Short] = {
    val size = OffLiteral + (0x300 << (lc + lp))
    val a = new Array[Short](size)
    java.util.Arrays.fill(a, 1024.toShort) // 2048/2
    a
  }

  /** Decode one LZMA chunk; returns Array(state, rep0..rep3). With
    * `eos`, one extra symbol is decoded once the output is full and it
    * must be the 0xFFFFFFFF end marker (the zip/raw-liblzma shape). */
  private def lzmaDecode(src: Array[Byte], srcOff: Int, srcLen: Int,
      out: Array[Byte], outOff: Int, outLen: Int, dictStart: Int,
      p: Array[Short], lc: Int, lp: Int, pb: Int,
      state0: Int, r0: Int, r1: Int, r2: Int, r3: Int,
      eos: Boolean = false): Array[Int] = {
    var state = state0
    var rep0 = r0; var rep1 = r1; var rep2 = r2; var rep3 = r3
    val srcEnd = srcOff + srcLen
    // range decoder init: first byte must be 0
    var ip = srcOff
    if (srcLen < 5) bail("truncated_lzma_chunk")
    if (src(ip) != 0) bail("bad_range_coder_init")
    ip += 1
    var code = 0
    var k = 0
    while (k < 4) { code = (code << 8) | (src(ip) & 0xff); ip += 1; k += 1 }
    var range = 0xFFFFFFFF

    def normalize(): Unit =
      if ((range & 0xFF000000) == 0) {
        if (ip >= srcEnd) bail("truncated_lzma_chunk")
        range <<= 8
        code = (code << 8) | (src(ip) & 0xff)
        ip += 1
      }

    def bit(idx: Int): Int = {
      val prob = p(idx) & 0xffff
      val bound = (range >>> 11) * prob
      // unsigned compare code < bound
      if ((code ^ 0x80000000) < (bound ^ 0x80000000)) {
        range = bound
        p(idx) = (prob + ((2048 - prob) >>> 5)).toShort
        normalize()
        0
      } else {
        range -= bound
        code -= bound
        p(idx) = (prob - (prob >>> 5)).toShort
        normalize()
        1
      }
    }

    def bitTree(base: Int, nBits: Int): Int = {
      var m = 1
      var j = 0
      while (j < nBits) { m = (m << 1) | bit(base + m); j += 1 }
      m - (1 << nBits)
    }

    def bitTreeReverse(base: Int, nBits: Int): Int = {
      var m = 1
      var sym = 0
      var j = 0
      while (j < nBits) {
        val b = bit(base + m)
        m = (m << 1) | b
        sym |= b << j
        j += 1
      }
      sym
    }

    def directBits(nBits: Int): Int = {
      var res = 0
      var j = nBits
      while (j > 0) {
        range = range >>> 1
        val ge = (code ^ 0x80000000) >= (range ^ 0x80000000) // unsigned
        res <<= 1
        if (ge) { code -= range; res |= 1 }
        normalize()
        j -= 1
      }
      res
    }

    def lenDecode(base: Int, posState: Int): Int =
      if (bit(base) == 0) bitTree(base + 2 + (posState << 3), 3)
      else if (bit(base + 1) == 0)
        8 + bitTree(base + 2 + (16 << 3) + (posState << 3), 3)
      else 16 + bitTree(base + 2 + (16 << 3) + (16 << 3), 8)

    val posMask = (1 << pb) - 1
    val litPosMask = (1 << lp) - 1
    var n = outOff
    val outEnd = outOff + outLen

    var eosSeen = false
    while (n < outEnd || (eos && !eosSeen)) {
      // position contexts count bytes SINCE THE DICTIONARY RESET, not
      // absolute output offset (the xz LZDecoder contract)
      val rp = n - dictStart
      val posState = rp & posMask
      if (bit(OffIsMatch + (state << 4) + posState) == 0) {
        // literal
        if (n >= outEnd) bail("chunk_output_overrun")
        val prevByte = if (n > dictStart) out(n - 1) & 0xff else 0
        val litState =
          ((rp & litPosMask) << lc) + (prevByte >>> (8 - lc))
        val base = OffLiteral + 0x300 * litState
        var sym = 1
        if (state >= 7) {
          // matched literal: decode against the byte at rep0+1 back
          if (n - rep0 - 1 < dictStart) bail("bad_distance")
          var matchByte = out(n - rep0 - 1) & 0xff
          var break = false
          while (!break && sym < 0x100) {
            val matchBit = (matchByte >> 7) & 1
            matchByte <<= 1
            val b = bit(base + ((1 + matchBit) << 8) + sym)
            sym = (sym << 1) | b
            if (matchBit != b) break = true
          }
          while (sym < 0x100) sym = (sym << 1) | bit(base + sym)
        } else {
          while (sym < 0x100) sym = (sym << 1) | bit(base + sym)
        }
        out(n) = sym.toByte
        n += 1
        state = if (state < 4) 0 else if (state < 10) state - 3 else state - 6
      } else {
        var len = 0
        if (bit(OffIsRep + state) == 0) {
          // match: new distance
          rep3 = rep2; rep2 = rep1; rep1 = rep0
          len = 2 + lenDecode(OffLenCoder, posState)
          val lenToPosState = math.min(len - 2, 3)
          val slot = bitTree(OffPosSlot + (lenToPosState << 6), 6)
          if (slot < 4) rep0 = slot
          else {
            val nd = (slot >> 1) - 1
            var dist = (2 | (slot & 1)) << nd
            if (slot < 14)
              // SpecPos base = dist - slot; the reverse tree accesses
              // base + m for m in 1..2^nd-1 (index 0 of the 115-entry
              // table is never touched, as in the reference decoder)
              dist += bitTreeReverse(OffSpecPos + dist - slot, nd)
            else {
              dist += directBits(nd - 4) << 4
              dist += bitTreeReverse(OffAlign, 4)
            }
            if (dist == -1) {
              // 0xFFFFFFFF end marker: only legal in eos mode with the
              // output exactly full
              if (!eos || n != outEnd) bail("unexpected_end_marker")
              eosSeen = true
              len = 0 // nothing to copy
            } else rep0 = dist
          }
          state = if (state < 7) 7 else 10
        } else {
          // rep match
          if (bit(OffIsRepG0 + state) == 0) {
            if (bit(OffIsRep0Long + (state << 4) + posState) == 0) {
              // short rep: 1 byte at rep0
              if (n >= outEnd) bail("chunk_output_overrun")
              if (n - rep0 - 1 < dictStart) bail("bad_distance")
              out(n) = out(n - rep0 - 1)
              n += 1
              state = if (state < 7) 9 else 11
              // continue main loop
              len = -1
            }
          } else {
            val dist =
              if (bit(OffIsRepG1 + state) == 0) rep1
              else if (bit(OffIsRepG2 + state) == 0) {
                val d = rep2; rep2 = rep1; d
              } else {
                val d = rep3; rep3 = rep2; rep2 = rep1; d
              }
            rep1 = rep0
            rep0 = dist
          }
          if (len == 0) {
            len = 2 + lenDecode(OffRepLenCoder, posState)
            state = if (state < 7) 8 else 11
          }
        }
        if (len > 0) {
          if (n + len > outEnd) bail("chunk_output_overrun")
          if (rep0 < 0 || n - rep0 - 1 < dictStart) bail("bad_distance")
          var j = 0
          while (j < len) { out(n) = out(n - rep0 - 1); n += 1; j += 1 }
        }
      }
    }
    // the chunk must consume its input exactly (up to range-coder tail)
    if (eos) {
      if (!eosSeen) bail("missing_end_marker")
      // the encoder's flush leaves at most the range coder's look-ahead
      // unread; anything more is smuggled bytes
      if (srcEnd - ip > 8) bail("lzma_chunk_size_mismatch")
    } else if (ip != srcEnd) bail("lzma_chunk_size_mismatch")
    Array(state, rep0, rep1, rep2, rep3)
  }
}
