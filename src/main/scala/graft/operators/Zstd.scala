package graft.operators

/** Zstandard frame format (RFC 8878) — the container modern corpora and
  * CDC pipelines ship in (Common Crawl index shards, .jsonl.zst dumps).
  * Three layers live here:
  *
  *  - the FRAME/BLOCK WALK: magic, frame-header descriptor
  *    (content-size/single-segment/checksum/dictionary-id flags), window
  *    descriptor, dictionary id, frame content size, the 3-byte block
  *    headers (last/type/size), skippable frames (0x184D2A5x), and the
  *    XXH64-low32 content checksum — the cheap metadata-first pass run
  *    before deciding what to decompress (the q209/q212 pattern);
  *  - STORED-MODE DECODE: Raw and RLE blocks reconstruct content
  *    exactly, and the checksum VERIFIES via a from-scratch XXH64;
  *  - the ENTROPY LAYER (RFC 8878 §4): Compressed blocks decode in
  *    full — FSE table descriptions (the variable-precision count
  *    stream with zero-repeat flags) and decoding tables (the
  *    step-spread state machine), Huffman literals with both weight
  *    transports (direct 4-bit and the two-state interleaved
  *    FSE-compressed form) in 1- and 4-stream layouts over the
  *    backward bitstream, the sequences section (Predefined / RLE /
  *    FSE_Compressed / Repeat modes for LL/OF/ML, three interleaved
  *    states), and sequence execution with the three-slot repeat-offset
  *    history incl. the litLength==0 rep1-1 special case. Treeless
  *    literals and Repeat table modes carry state across blocks within
  *    a frame, as the spec requires.
  *
  * DICTIONARY frames (RFC 8878 §5) decode when the dictionary is
  * supplied: formatted ZDICT output (magic, id, starting entropy
  * tables parsed with the same readers as compressed blocks, repeat
  * offsets, content history) and raw-content dictionaries (the
  * out-of-band `zstd -D` pairing). Without the dictionary such frames
  * quarantine by name; with the wrong one, on the id.
  *
  * Reject-don't-guess: bad magic, reserved block type, truncated
  * headers/payloads, content-size or checksum mismatches,
  * dictionary frames without their dictionary,
  * and every entropy-layer grammar violation (non-exact FSE count
  * totals, oversubscribed or overlong Huffman weights, offsets past the
  * produced history, bitstreams that do not land on their padding
  * marker) all quarantine with named reasons. Interop is pinned in
  * ZstdSpec against frames produced by a real zstd encoder (zstd-jni,
  * already on Spark's classpath) across levels and content shapes —
  * decode side here is from scratch.
  */
object Zstd {

  final case class Rejected(reason: String)
  private final class Bail(val reason: String) extends RuntimeException(reason)
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // ---- XXH64 (the checksum zstd mandates; public algorithm) ----

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def u64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
    v
  }
  private def u32l(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  def xxh64(b: Array[Byte], seed: Long = 0L): Long = {
    val len = b.length
    def round(acc: Long, in: Long): Long =
      java.lang.Long.rotateLeft(acc + in * P2, 31) * P1
    var h =
      if (len >= 32) {
        var a1 = seed + P1 + P2
        var a2 = seed + P2
        var a3 = seed
        var a4 = seed - P1
        var i = 0
        while (i + 32 <= len) {
          a1 = round(a1, u64(b, i))
          a2 = round(a2, u64(b, i + 8))
          a3 = round(a3, u64(b, i + 16))
          a4 = round(a4, u64(b, i + 24))
          i += 32
        }
        var acc = java.lang.Long.rotateLeft(a1, 1) +
          java.lang.Long.rotateLeft(a2, 7) +
          java.lang.Long.rotateLeft(a3, 12) +
          java.lang.Long.rotateLeft(a4, 18)
        def merge(acc0: Long, v: Long): Long =
          (acc0 ^ round(0L, v)) * P1 + P4
        acc = merge(acc, a1); acc = merge(acc, a2)
        acc = merge(acc, a3); acc = merge(acc, a4)
        acc
      } else seed + P5
    h += len
    var i = (len / 32) * 32
    while (i + 8 <= len) {
      h ^= round(0L, u64(b, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= u32l(b, i) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (b(i) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  // ---- entropy layer: bit IO ----

  /** Forward LSB-first bit reader (FSE table descriptions travel this
    * way). Reads past `until` set `truncated` and return zeros. */
  private final class Fwd(b: Array[Byte], val start: Int, until: Int) {
    private var bitPos = 0
    var truncated = false
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIx = start + (bitPos >> 3)
        if (byteIx >= until) { truncated = true; return v }
        v |= (((b(byteIx) >> (bitPos & 7)) & 1) << i)
        bitPos += 1
        i += 1
      }
      v
    }
    def bytesConsumed: Int = (bitPos + 7) >> 3
  }

  /** Backward bitstream (RFC 8878 §3.1.1.3.2.1): written LSB-first,
    * read from the END after discarding the highest set bit of the last
    * non-zero byte (the padding marker). `read` returns the bits just
    * below the cursor, assembled as the little-endian value they form;
    * reads below the start pad with zeros and raise `overflowed` (the
    * FSE alternating-state termination condition). */
  private final class Back(b: Array[Byte], from: Int, until: Int) {
    var bitPos: Long = {
      var last = until - 1
      while (last >= from && b(last) == 0) last -= 1
      if (last < from) -1L
      else (last - from).toLong * 8 + (31 - Integer.numberOfLeadingZeros(b(last) & 0xff))
    }
    def bad: Boolean = bitPos < 0
    var overflowed = false
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = bitPos - n + i
        if (p >= 0)
          v |= (((b(from + (p >> 3).toInt) >> (p & 7).toInt) & 1) << i)
        i += 1
      }
      v
    }
    def read(n: Int): Int = {
      val v = peek(n)
      bitPos -= n
      if (bitPos < 0) overflowed = true
      v
    }
    def finished: Boolean = bitPos == 0
  }

  // ---- entropy layer: FSE ----

  /** One FSE decoding table: per state, the emitted symbol and the
    * (nbBits, baseline) state-update rule. */
  private[operators] final case class Fse(log: Int, sym: Array[Int], nb: Array[Int],
      base: Array[Int])

  /** FSE table description (RFC 8878 §4.1.1): accuracy log, then
    * variable-precision normalized counts with the 2-bit zero-repeat
    * escape. Returns (counts with -1 for "less than 1", accuracyLog);
    * the caller advances by `fw.bytesConsumed`. */
  private def readFseCounts(fw: Fwd, maxSym: Int, maxLog: Int): (Array[Int], Int) = {
    val accuracyLog = fw.read(4) + 5
    if (accuracyLog > maxLog) bail("bad_fse_accuracy")
    var remaining = (1 << accuracyLog) + 1
    var threshold = 1 << accuracyLog
    val counts = new Array[Int](maxSym + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSym) {
      if (previous0) {
        var rep = fw.read(2)
        while (rep == 3) {
          charnum += 3
          if (charnum > maxSym) bail("bad_fse_counts")
          rep = fw.read(2)
        }
        charnum += rep
        if (charnum > maxSym || fw.truncated) bail("bad_fse_counts")
      }
      val max = (2 * threshold - 1) - remaining
      val nbBits = 32 - Integer.numberOfLeadingZeros(threshold) // log2(threshold)+1
      val small = fw.read(nbBits - 1)
      val value =
        if (small < max) small
        else {
          val full = small | (fw.read(1) << (nbBits - 1))
          if (full >= threshold) full - max else full
        }
      if (fw.truncated) bail("bad_fse_counts")
      val count = value - 1 // -1 encodes the "less than 1" probability
      remaining -= math.abs(count)
      counts(charnum) = count
      charnum += 1
      previous0 = count == 0
      while (remaining > 0 && remaining < threshold) threshold >>= 1
    }
    if (remaining != 1) bail("bad_fse_counts")
    (counts, accuracyLog)
  }

  /** Decoding-table construction (RFC 8878 §4.1.1.2): "less than 1"
    * symbols take the top states; the rest spread with the fixed step;
    * each state's update rule comes from its symbol's occurrence rank. */
  private def buildFse(counts: Array[Int], accuracyLog: Int): Fse = {
    val size = 1 << accuracyLog
    val sym = new Array[Int](size)
    var high = size - 1
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) {
        if (high < 0) bail("bad_fse_table")
        sym(high) = s; high -= 1
      }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < counts.length) {
      var k = 0
      while (k < counts(s)) {
        sym(pos) = s
        do pos = (pos + step) & mask while (pos > high)
        k += 1
      }
      s += 1
    }
    if (pos != 0) bail("bad_fse_table")
    val next = counts.map(c => if (c == -1) 1 else c)
    val nb = new Array[Int](size)
    val base = new Array[Int](size)
    var u = 0
    while (u < size) {
      val x = next(sym(u)); next(sym(u)) += 1
      val bits = accuracyLog - (31 - Integer.numberOfLeadingZeros(x))
      nb(u) = bits
      base(u) = (x << bits) - size
      u += 1
    }
    Fse(accuracyLog, sym, nb, base)
  }

  /** The degenerate single-state table RLE mode uses (0-bit updates). */
  private def rleFse(symbol: Int): Fse =
    Fse(0, Array(symbol), Array(0), Array(0))

  // Predefined distributions (RFC 8878 §3.1.1.3.2.2.1).
  private lazy val PredefLl = buildFse(Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1), 6)
  private lazy val PredefMl = buildFse(Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1, -1, -1), 6)
  private lazy val PredefOf = buildFse(Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1), 5)

  // Literals-length and match-length code tables (§3.1.1.3.2.1.1).
  private val LlBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ---- entropy layer: Huffman literals ----

  /** Huffman decode table: peek `log` bits of the backward stream as an
    * index; each entry holds (symbol, code length). */
  private[operators] final case class Huf(log: Int, sym: Array[Byte], nb: Array[Int])

  /** Build the decode table from weights (the last weight implied).
    * Per §4.2.1: symbols sorted by weight then index get ascending
    * codes, so the table fills sequentially, 2^(w-1) cells per symbol. */
  private def buildHuf(weights: Array[Int]): Huf = {
    if (weights.exists(w => w < 0 || w > 11)) bail("bad_huffman_weights")
    var total = 0L
    weights.foreach(w => if (w > 0) total += (1L << (w - 1)))
    if (total == 0) bail("bad_huffman_weights")
    // complete to the next power of two; the leftover must itself be a
    // power of two — it is the implied last symbol's span
    val tableLog = 64 - java.lang.Long.numberOfLeadingZeros(total)
    if (tableLog > 11) bail("bad_huffman_weights")
    val leftover = (1L << tableLog) - total
    if (leftover == 0 || (leftover & (leftover - 1)) != 0)
      bail("bad_huffman_weights")
    val lastWeight = java.lang.Long.numberOfTrailingZeros(leftover).toInt + 1
    val all = weights :+ lastWeight
    val size = 1 << tableLog
    val sym = new Array[Byte](size)
    val nb = new Array[Int](size)
    var pos = 0
    var w = 1
    while (w <= tableLog.toInt) {
      var s = 0
      while (s < all.length) {
        if (all(s) == w) {
          val span = 1 << (w - 1)
          if (pos + span > size) bail("bad_huffman_weights")
          java.util.Arrays.fill(sym, pos, pos + span, s.toByte)
          java.util.Arrays.fill(nb, pos, pos + span, tableLog.toInt + 1 - w)
          pos += span
        }
        s += 1
      }
      w += 1
    }
    if (pos != size) bail("bad_huffman_weights")
    Huf(tableLog.toInt, sym, nb)
  }

  /** Huffman tree description (§4.2.1): headerByte >= 128 → direct
    * 4-bit weights; < 128 → FSE-compressed weights decoded by two
    * alternating states from a backward stream. Returns (table, bytes
    * consumed including the header byte). */
  private def readHuffman(b: Array[Byte], off: Int, end: Int): (Huf, Int) = {
    if (off >= end) bail("truncated_huffman")
    val hdr = b(off) & 0xff
    if (hdr >= 128) {
      val n = hdr - 127 // number of explicit weights
      val bytes = (n + 1) / 2
      if (off + 1 + bytes > end) bail("truncated_huffman")
      val weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val v = b(off + 1 + (i >> 1)) & 0xff
        weights(i) = if ((i & 1) == 0) v >> 4 else v & 0x0f
        i += 1
      }
      (buildHuf(weights), 1 + bytes)
    } else {
      val compSize = hdr
      if (off + 1 + compSize > end) bail("truncated_huffman")
      val fw = new Fwd(b, off + 1, off + 1 + compSize)
      val (counts, log) = readFseCounts(fw, maxSym = 15, maxLog = 6)
      val table = buildFse(counts, log)
      val bitsFrom = off + 1 + fw.bytesConsumed
      if (bitsFrom > off + 1 + compSize) bail("truncated_huffman")
      val back = new Back(b, bitsFrom, off + 1 + compSize)
      if (back.bad) bail("bad_huffman_weights")
      var s1 = back.read(log)
      var s2 = back.read(log)
      if (back.overflowed) bail("bad_huffman_weights")
      val ws = scala.collection.mutable.ArrayBuffer[Int]()
      var done = false
      while (!done) {
        if (ws.length > 255) bail("bad_huffman_weights")
        ws += table.sym(s1)
        s1 = table.base(s1) + back.read(table.nb(s1))
        if (back.overflowed) { ws += table.sym(s2); done = true }
        else {
          ws += table.sym(s2)
          s2 = table.base(s2) + back.read(table.nb(s2))
          if (back.overflowed) { ws += table.sym(s1); done = true }
        }
      }
      (buildHuf(ws.toArray), 1 + compSize)
    }
  }

  /** Decode exactly `n` literals from one backward Huffman stream. The
    * stream must land exactly on its padding marker. */
  private def hufStream(huf: Huf, b: Array[Byte], from: Int, until: Int,
      n: Int, out: Array[Byte], outOff: Int): Unit = {
    val back = new Back(b, from, until)
    if (back.bad) bail("bad_literals_stream")
    var i = 0
    while (i < n) {
      val ix = back.peek(huf.log)
      out(outOff + i) = huf.sym(ix)
      back.bitPos -= huf.nb(ix)
      i += 1
    }
    if (back.bitPos != 0) bail("bad_literals_stream")
  }

  // ---- entropy layer: one Compressed block ----

  /** Per-frame entropy state the spec carries across blocks: the last
    * Huffman table (Treeless literals) and last FSE tables (Repeat
    * mode), plus the three-slot repeat-offset history. */
  private final class FrameState {
    var huf: Huf = null
    var ll: Fse = null
    var of: Fse = null
    var ml: Fse = null
    var rep1 = 1L; var rep2 = 4L; var rep3 = 8L
    /** RFC 8878 Window_Size (exponent + mantissa form) when the frame
      * carries a window descriptor; -1 for single-segment frames, whose
      * window is the frame content itself. Offsets beyond it PLUS the
      * dictionary content reject (round-12 conformance tightening:
      * produced-history and allocation-cap bounds alone accepted a
      * conforming-looking frame whose matches reached further back than
      * its declared window). The dictionary allowance is not a
      * loophole: the ZstdDiff differential sweep caught the REAL
      * encoder emitting dictionary-frame offsets beyond the declared
      * window — reference zstd bounds offsets by prefix+dictionary, so
      * a window-only bound would reject compliant encoder output. */
    var windowSize = -1L
    var dictLen = 0L
  }

  /** Growable output buffer with random access (sequence execution
    * copies from its own history). */
  private final class OutBuf {
    var a = new Array[Byte](64 * 1024)
    var n = 0
    /** Bytes before this mark are dictionary-content history: matches
      * may reach into them, but they are not part of the frame's own
      * output (content size, checksum, FrameInfo.content). */
    var base = 0
    /** Output ceiling, enforced BEFORE allocation grows past it — the
      * caller-supplied bomb cap (Content-Encoding threads its per-stage
      * cap here; the default is the engine-wide 64 MiB media cap). */
    var cap: Int = 1 << 26
    private def ensure(extra: Int): Unit = {
      if (n - base + extra > cap) bail("oversized")
      if (n + extra > a.length) {
        var cap = a.length
        while (cap < n + extra) cap <<= 1
        a = java.util.Arrays.copyOf(a, cap)
      }
    }
    def append(src: Array[Byte], from: Int, len: Int): Unit = {
      ensure(len); System.arraycopy(src, from, a, n, len); n += len
    }
    def appendRun(v: Byte, len: Int): Unit = {
      ensure(len); java.util.Arrays.fill(a, n, n + len, v); n += len
    }
    /** Overlap-correct match copy from `dist` back in the history. */
    def copyMatch(dist: Int, len: Int): Unit = {
      if (dist <= 0 || dist > n) bail("bad_offset")
      ensure(len)
      var i = 0
      while (i < len) { a(n) = a(n - dist); n += 1; i += 1 }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOfRange(a, base, n)
    def dataLength: Int = n - base
  }

  /** Literals section (§3.1.1.3.1): header, optional Huffman tree,
    * 1 or 4 backward streams. Returns (literals, bytes consumed). */
  private def decodeLiterals(b: Array[Byte], off: Int, end: Int,
      st: FrameState): (Array[Byte], Int) = {
    if (off >= end) bail("truncated_literals")
    val b0 = b(off) & 0xff
    val ltype = b0 & 3
    val sizeFormat = (b0 >> 2) & 3
    def u8(i: Int): Int = {
      if (i >= end) bail("truncated_literals"); b(i) & 0xff
    }
    if (ltype <= 1) { // Raw / RLE
      val (regen, hdrLen) = sizeFormat match {
        case 0 | 2 => (b0 >> 3, 1)
        case 1 => ((b0 >> 4) | (u8(off + 1) << 4), 2)
        case _ => ((b0 >> 4) | (u8(off + 1) << 4) | (u8(off + 2) << 12), 3)
      }
      if (regen > (1 << 20)) bail("oversized_literals")
      if (ltype == 0) {
        if (off + hdrLen + regen > end) bail("truncated_literals")
        (java.util.Arrays.copyOfRange(b, off + hdrLen, off + hdrLen + regen),
          hdrLen + regen)
      } else {
        val v = u8(off + hdrLen).toByte
        val out = new Array[Byte](regen)
        java.util.Arrays.fill(out, v)
        (out, hdrLen + 1)
      }
    } else { // Compressed / Treeless
      val (regen, comp, nStreams, hdrLen) = sizeFormat match {
        case 0 =>
          ((b0 >> 4) | ((u8(off + 1) & 0x3f) << 4),
            (u8(off + 1) >> 6) | (u8(off + 2) << 2), 1, 3)
        case 1 =>
          ((b0 >> 4) | ((u8(off + 1) & 0x3f) << 4),
            (u8(off + 1) >> 6) | (u8(off + 2) << 2), 4, 3)
        case 2 =>
          ((b0 >> 4) | (u8(off + 1) << 4) | ((u8(off + 2) & 0x03) << 12),
            (u8(off + 2) >> 2) | (u8(off + 3) << 6), 4, 4)
        case _ =>
          ((b0 >> 4) | (u8(off + 1) << 4) | ((u8(off + 2) & 0x3f) << 12),
            (u8(off + 2) >> 6) | (u8(off + 3) << 2) | (u8(off + 4) << 10), 4, 5)
      }
      if (regen > (1 << 20)) bail("oversized_literals")
      if (off + hdrLen + comp > end) bail("truncated_literals")
      var p = off + hdrLen
      val streamsEnd = off + hdrLen + comp
      val huf =
        if (ltype == 2) {
          val (h, used) = readHuffman(b, p, streamsEnd)
          st.huf = h; p += used; h
        } else {
          if (st.huf == null) bail("treeless_without_tree")
          st.huf
        }
      val out = new Array[Byte](regen)
      if (nStreams == 1) hufStream(huf, b, p, streamsEnd, regen, out, 0)
      else {
        if (p + 6 > streamsEnd) bail("truncated_literals")
        def u16(i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        val c1 = u16(p); val c2 = u16(p + 2); val c3 = u16(p + 4)
        val s123 = (regen + 3) / 4
        val s4 = regen - 3 * s123
        if (s4 < 0) bail("bad_literals_stream")
        val f1 = p + 6
        val f2 = f1 + c1; val f3 = f2 + c2; val f4 = f3 + c3
        if (f4 > streamsEnd) bail("truncated_literals")
        hufStream(huf, b, f1, f2, s123, out, 0)
        hufStream(huf, b, f2, f3, s123, out, s123)
        hufStream(huf, b, f3, f4, s123, out, 2 * s123)
        hufStream(huf, b, f4, streamsEnd, s4, out, 3 * s123)
      }
      (out, hdrLen + comp)
    }
  }

  /** One of LL/OF/ML table selections (§3.1.1.3.2.1.1 modes). Returns
    * (table, bytes consumed). */
  private def seqTable(mode: Int, b: Array[Byte], off: Int, end: Int,
      predef: Fse, prev: Fse, maxSym: Int, maxLog: Int): (Fse, Int) =
    mode match {
      case 0 => (predef, 0)
      case 1 =>
        if (off >= end) bail("truncated_sequences")
        val s = b(off) & 0xff
        if (s > maxSym) bail("bad_sequences")
        (rleFse(s), 1)
      case 2 =>
        val fw = new Fwd(b, off, end)
        val (counts, log) = readFseCounts(fw, maxSym, maxLog)
        (buildFse(counts, log), fw.bytesConsumed)
      case _ =>
        if (prev == null) bail("repeat_without_table")
        (prev, 0)
    }

  /** Sequences section + execution (§3.1.1.3.2): three interleaved FSE
    * states over the backward stream, then literal/match copies with
    * the repeat-offset rules. */
  private def decodeSequences(b: Array[Byte], off0: Int, end: Int,
      lits: Array[Byte], out: OutBuf, st: FrameState): Unit = {
    var off = off0
    if (off >= end) bail("truncated_sequences")
    val h0 = b(off) & 0xff
    var nSeq = 0
    if (h0 < 128) { nSeq = h0; off += 1 }
    else if (h0 < 255) {
      if (off + 1 >= end) bail("truncated_sequences")
      nSeq = ((h0 - 128) << 8) | (b(off + 1) & 0xff); off += 2
    } else {
      if (off + 2 >= end) bail("truncated_sequences")
      nSeq = ((b(off + 1) & 0xff) | ((b(off + 2) & 0xff) << 8)) + 0x7f00
      off += 3
    }
    if (nSeq == 0) {
      if (off != end) bail("bad_sequences") // trailing garbage
      out.append(lits, 0, lits.length)
      return
    }
    if (off >= end) bail("truncated_sequences")
    val modes = b(off) & 0xff; off += 1
    if ((modes & 3) != 0) bail("bad_sequences") // reserved bits
    val (llT, u1) = seqTable((modes >> 6) & 3, b, off, end, PredefLl, st.ll,
      maxSym = 35, maxLog = 9)
    off += u1
    val (ofT, u2) = seqTable((modes >> 4) & 3, b, off, end, PredefOf, st.of,
      maxSym = 31, maxLog = 8)
    off += u2
    val (mlT, u3) = seqTable((modes >> 2) & 3, b, off, end, PredefMl, st.ml,
      maxSym = 52, maxLog = 9)
    off += u3
    st.ll = llT; st.of = ofT; st.ml = mlT

    val back = new Back(b, off, end)
    if (back.bad) bail("bad_sequences")
    var llS = back.read(llT.log)
    var ofS = back.read(ofT.log)
    var mlS = back.read(mlT.log)
    if (back.overflowed) bail("bad_sequences")
    var litPos = 0
    var i = 0
    while (i < nSeq) {
      val ofCode = ofT.sym(ofS)
      if (ofCode > 31) bail("bad_sequences")
      val offsetValue = (1L << ofCode) + (
        if (ofCode > 0) {
          // up to 31 extra bits; read in two chunks to stay in Int land
          if (ofCode <= 16) back.read(ofCode).toLong
          else {
            val hi = back.read(ofCode - 16).toLong
            val lo = back.read(16).toLong
            (hi << 16) | lo
          }
        } else 0L)
      val mlCode = mlT.sym(mlS)
      if (mlCode > 52) bail("bad_sequences")
      val matchLen = MlBase(mlCode) + back.read(MlBits(mlCode))
      val llCode = llT.sym(llS)
      if (llCode > 35) bail("bad_sequences")
      val litLen = LlBase(llCode) + back.read(LlBits(llCode))
      if (back.overflowed) bail("bad_sequences")
      // repeat-offset resolution (§3.1.1.3.2.2)
      var offset = 0L
      if (offsetValue > 3) {
        offset = offsetValue - 3
        st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = offset
      } else {
        val v = if (litLen == 0) offsetValue + 1 else offsetValue
        // v in 1..4: 1=rep1, 2=rep2, 3=rep3, 4=rep1-1
        offset = v match {
          case 1 => st.rep1
          case 2 => val o = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
          case 3 =>
            val o = st.rep3; st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
          case _ =>
            val o = st.rep1 - 1
            if (o <= 0) bail("bad_offset")
            st.rep3 = st.rep2; st.rep2 = st.rep1; st.rep1 = o; o
        }
      }
      if (litPos + litLen > lits.length) bail("bad_sequences")
      out.append(lits, litPos, litLen)
      litPos += litLen
      if (offset > Int.MaxValue) bail("bad_offset")
      if (st.windowSize >= 0 && offset > st.windowSize + st.dictLen)
        bail("offset_beyond_window")
      out.copyMatch(offset.toInt, matchLen)
      i += 1
      if (i < nSeq) { // last sequence: no state updates
        llS = llT.base(llS) + back.read(llT.nb(llS))
        mlS = mlT.base(mlS) + back.read(mlT.nb(mlS))
        ofS = ofT.base(ofS) + back.read(ofT.nb(ofS))
        if (back.overflowed) bail("bad_sequences")
      }
    }
    if (back.bitPos != 0) bail("bad_sequences") // must land on the marker
    out.append(lits, litPos, lits.length - litPos)
  }

  /** One Compressed block (§3.1.1.3): literals section then sequences. */
  private def decodeCompressedBlock(b: Array[Byte], off: Int, end: Int,
      out: OutBuf, st: FrameState): Unit = {
    val sizeBefore = out.n
    val (lits, used) = decodeLiterals(b, off, end, st)
    decodeSequences(b, off + used, end, lits, out, st)
    if (out.n - sizeBefore > (1 << 17) + (1 << 10))
      bail("oversized_block") // spec: a block decodes to at most 128 KB
  }

  // ---- dictionaries (RFC 8878 §5) ----

  /** A parsed zstd dictionary: starting entropy tables, starting repeat
    * offsets, and the content prefix match offsets may reach into.
    * Opaque outside the codec (the table types are internal). */
  final class Dict private[operators] (
      val id: Long,
      private[operators] val huf: Huf,
      private[operators] val ll: Fse,
      private[operators] val of: Fse,
      private[operators] val ml: Fse,
      private[operators] val rep1: Long,
      private[operators] val rep2: Long,
      private[operators] val rep3: Long,
      private[operators] val content: Array[Byte]) {
    def contentLength: Int = content.length
  }

  private val DictMagic = 0xEC30A437

  /** Parse a FORMATTED dictionary (the ZDICT trainer's output: magic,
    * dict id, entropy tables in compressed-block format, rep offsets,
    * content). A blob without the magic is treated as a RAW-CONTENT
    * dictionary (id 0, default tables) — both forms real corpora use. */
  def parseDictionary(b: Array[Byte]): Either[Rejected, Dict] =
    try {
      if (b.length < 8 || u32l(b, 0).toInt != DictMagic)
        return Right(new Dict(0L, null, null, null, null, 1L, 4L, 8L, b))
      val id = u32l(b, 4)
      var o = 8
      val (huf, hufUsed) = readHuffman(b, o, b.length)
      o += hufUsed
      // entropy tables after the Huffman table travel in the order
      // Offsets, Match_Lengths, Literals_Lengths, each a full FSE table
      // description byte-aligned
      val fwOf = new Fwd(b, o, b.length)
      val (ofC, ofLog) = readFseCounts(fwOf, maxSym = 31, maxLog = 8)
      val of = buildFse(ofC, ofLog)
      o += fwOf.bytesConsumed
      val fwMl = new Fwd(b, o, b.length)
      val (mlC, mlLog) = readFseCounts(fwMl, maxSym = 52, maxLog = 9)
      val ml = buildFse(mlC, mlLog)
      o += fwMl.bytesConsumed
      val fwLl = new Fwd(b, o, b.length)
      val (llC, llLog) = readFseCounts(fwLl, maxSym = 35, maxLog = 9)
      val ll = buildFse(llC, llLog)
      o += fwLl.bytesConsumed
      if (o + 12 > b.length) bail("truncated_dictionary")
      val r1 = u32l(b, o); val r2 = u32l(b, o + 4); val r3 = u32l(b, o + 8)
      o += 12
      val content = java.util.Arrays.copyOfRange(b, o, b.length)
      if (r1 == 0 || r2 == 0 || r3 == 0 ||
          r1 > content.length || r2 > content.length || r3 > content.length)
        bail("bad_dictionary_offsets")
      Right(new Dict(id, huf, ll, of, ml, r1, r2, r3, content))
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  // ---- frame walk + stored-mode decode ----

  /** Per-frame census row. */
  final case class FrameInfo(
      skippable: Boolean,
      singleSegment: Boolean,
      hasChecksum: Boolean,
      contentSize: Long, // -1 when the header omits it
      windowLog: Int, // -1 for single-segment / skippable
      nBlocks: Int, nRaw: Int, nRle: Int,
      content: Array[Byte], // empty for skippable frames
      nCompressed: Int = 0) // entropy-coded (FSE/Huffman) blocks

  private val Magic = 0xFD2FB528
  private val SkippableBase = 0x184D2A50

  /** Walk a (possibly multi-frame) zstd stream: per-frame metadata plus
    * reconstructed content. `dict` supplies an RFC 8878 §5 dictionary
    * for frames whose header references one (starting entropy tables,
    * repeat offsets, and content history) — without it such frames
    * quarantine by name, with a WRONG one they quarantine on the id. */
  def decode(b: Array[Byte]): Either[Rejected, Seq[FrameInfo]] =
    decode(b, None)

  def decode(b: Array[Byte],
      dict: Option[Dict]): Either[Rejected, Seq[FrameInfo]] =
    decode(b, dict, 1 << 26)

  /** As above, with a caller-supplied per-frame output cap (bomb guard
    * enforced before allocation — the Content-Encoding stage threads
    * its per-stage cap here). */
  def decode(b: Array[Byte], dict: Option[Dict],
      maxOut: Int): Either[Rejected, Seq[FrameInfo]] =
    try {
      val out = Seq.newBuilder[FrameInfo]
      var i = 0
      if (b.length < 4) bail("truncated_magic")
      while (i < b.length) {
        if (i + 4 > b.length) bail("truncated_magic")
        val magic = u32l(b, i).toInt
        i += 4
        if ((magic & 0xfffffff0) == SkippableBase) {
          if (i + 4 > b.length) bail("truncated_skippable")
          val n = u32l(b, i); i += 4
          if (i + n > b.length) bail("truncated_skippable")
          i += n.toInt
          out += FrameInfo(skippable = true, singleSegment = false,
            hasChecksum = false, -1L, -1, 0, 0, 0, Array.empty)
        } else if (magic == Magic) {
          if (i >= b.length) bail("truncated_header")
          val fhd = b(i) & 0xff; i += 1
          val fcsFlag = fhd >> 6
          val singleSegment = (fhd & 0x20) != 0
          // bit 3 is Reserved (must reject); bit 4 is Unused — RFC 8878
          // says a decoder "shall not interpret" it, so a set Unused bit
          // on an otherwise-decodable frame passes through
          if ((fhd & 0x08) != 0) bail("reserved_fhd_bits")
          val hasChecksum = (fhd & 0x04) != 0
          val didFlag = fhd & 0x03
          var windowLog = -1
          var windowSize = -1L
          if (!singleSegment) {
            if (i >= b.length) bail("truncated_header")
            val wd = b(i) & 0xff; i += 1
            windowLog = 10 + (wd >> 3) // exponent sizes, mantissa refines
            val windowBase = 1L << windowLog
            windowSize = windowBase + (windowBase / 8) * (wd & 7)
          }
          val didLen = didFlag match {
            case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
          }
          // raw-content dictionaries carry no id, so frames built with
          // one have NO dictionary-id field — the pairing is
          // out-of-band, exactly like `zstd -D`: an explicitly supplied
          // raw dict (id 0) seeds every frame
          var frameDict: Option[Dict] = dict.filter(_.id == 0L)
          if (didLen > 0) {
            if (i + didLen > b.length) bail("truncated_header")
            var did = 0L
            var k = 0
            while (k < didLen) { did |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
            i += didLen
            dict match {
              case None => bail("dictionary_frame") // undecodable without it
              case Some(d) =>
                // raw-content dictionaries carry no id (0 here): accept
                // any reference; formatted ids must match exactly
                if (d.id != 0L && d.id != did) bail("dictionary_mismatch")
                frameDict = Some(d)
            }
          }
          val fcsLen = fcsFlag match {
            case 0 => if (singleSegment) 1 else 0
            case 1 => 2; case 2 => 4; case _ => 8
          }
          var contentSize = -1L
          if (fcsLen > 0) {
            if (i + fcsLen > b.length) bail("truncated_header")
            var v = 0L
            var k = 0
            while (k < fcsLen) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
            contentSize = if (fcsLen == 2) v + 256 else v
            i += fcsLen
          }
          val content = new OutBuf
          content.cap = maxOut
          val st = new FrameState
          st.windowSize = windowSize
          frameDict.foreach { d =>
            content.append(d.content, 0, d.content.length)
            content.base = content.n
            st.dictLen = d.content.length
            if (d.huf != null) { // formatted dicts seed the entropy state
              st.huf = d.huf; st.ll = d.ll; st.of = d.of; st.ml = d.ml
            }
            st.rep1 = d.rep1; st.rep2 = d.rep2; st.rep3 = d.rep3
          }
          var last = false
          var nBlocks = 0; var nRaw = 0; var nRle = 0; var nCompressed = 0
          while (!last) {
            if (i + 3 > b.length) bail("truncated_block_header")
            val hdr = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
              ((b(i + 2) & 0xff) << 16)
            i += 3
            last = (hdr & 1) == 1
            val btype = (hdr >> 1) & 3
            val bsize = hdr >>> 3
            nBlocks += 1
            btype match {
              case 0 => // Raw: bsize literal bytes
                if (i + bsize > b.length) bail("truncated_block")
                content.append(b, i, bsize)
                i += bsize
                nRaw += 1
              case 1 => // RLE: one byte repeated bsize times
                if (i >= b.length) bail("truncated_block")
                val v = b(i); i += 1
                content.appendRun(v, bsize)
                nRle += 1
              case 2 => // Compressed: the full entropy layer
                if (i + bsize > b.length) bail("truncated_block")
                decodeCompressedBlock(b, i, i + bsize, content, st)
                i += bsize
                nCompressed += 1
              case _ => bail("reserved_block_type")
            }
            if (content.dataLength > maxOut) bail("oversized")
          }
          val data = content.toArray
          if (contentSize >= 0 && data.length != contentSize)
            bail("content_size_mismatch")
          if (hasChecksum) {
            if (i + 4 > b.length) bail("truncated_checksum")
            val want = u32l(b, i); i += 4
            if ((xxh64(data) & 0xffffffffL) != want) bail("checksum_mismatch")
          }
          out += FrameInfo(skippable = false, singleSegment, hasChecksum,
            contentSize, windowLog, nBlocks, nRaw, nRle, data, nCompressed)
        } else bail("bad_magic")
      }
      Right(out.result())
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  // ---- encode (fixtures + roundtrip gate): stored-mode frames ----

  /** Encode `data` as one legal zstd frame of Raw/RLE blocks: runs of a
    * single byte at least `rleThreshold` long become RLE blocks, the
    * rest Raw blocks capped at `maxBlock`. `checksum` appends the
    * XXH64-low32; `withContentSize` writes the FCS field
    * (single-segment form). A `skippablePrefix` > 0 prepends a
    * skippable frame of that many bytes (id-derived content). */
  def encode(data: Array[Byte], checksum: Boolean = true,
      withContentSize: Boolean = true, rleThreshold: Int = 16,
      maxBlock: Int = 4096, skippablePrefix: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    if (skippablePrefix > 0) {
      w32(SkippableBase + 7L)
      w32(skippablePrefix.toLong)
      var k = 0
      while (k < skippablePrefix) { out.write(k * 31 & 0xff); k += 1 }
    }
    w32(Magic & 0xffffffffL)
    // single-segment when the content size travels; else window descriptor
    val fcsFlag =
      if (!withContentSize) 0
      else if (data.length <= 255) 0 // 1-byte FCS via single-segment
      else if (data.length < 65536 + 256) 1
      else 2
    val singleSegment = withContentSize
    var fhd = (fcsFlag << 6) | (if (singleSegment) 0x20 else 0) |
      (if (checksum) 0x04 else 0)
    out.write(fhd)
    if (!singleSegment) out.write(0x58) // window descriptor: 10 + 11 = 2MB-ish
    if (withContentSize) {
      val fcsLen = fcsFlag match {
        case 0 => 1; case 1 => 2; case _ => 4
      }
      val v = if (fcsFlag == 1) data.length - 256 else data.length
      var k = 0
      while (k < fcsLen) { out.write((v >> (8 * k)) & 0xff); k += 1 }
    }
    // tokenize into RLE runs and raw chunks
    final case class Blk(rle: Boolean, from: Int, size: Int)
    val blocks = scala.collection.mutable.ArrayBuffer[Blk]()
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < (1 << 20) &&
        data(i + run) == data(i)) run += 1
      if (run >= rleThreshold) { blocks += Blk(rle = true, i, run); i += run }
      else {
        // extend a raw chunk until the next long run or the cap
        var j = i + 1
        var ok = true
        while (ok && j < data.length && j - i < maxBlock) {
          var r2 = 1
          while (j + r2 < data.length && r2 < rleThreshold &&
            data(j + r2) == data(j)) r2 += 1
          if (r2 >= rleThreshold) ok = false else j += 1
        }
        blocks += Blk(rle = false, i, j - i)
        i = j
      }
    }
    if (blocks.isEmpty) blocks += Blk(rle = false, 0, 0) // empty frame: one empty raw
    blocks.zipWithIndex.foreach { case (blk, ix) =>
      val lastBit = if (ix == blocks.length - 1) 1 else 0
      val btype = if (blk.rle) 1 else 0
      val hdr = lastBit | (btype << 1) | (blk.size << 3)
      out.write(hdr & 0xff); out.write((hdr >> 8) & 0xff); out.write((hdr >> 16) & 0xff)
      if (blk.rle) out.write(data(blk.from))
      else out.write(data, blk.from, blk.size)
    }
    if (checksum) w32(xxh64(data) & 0xffffffffL)
    out.toByteArray
  }
}
