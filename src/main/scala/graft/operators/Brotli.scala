package graft.operators

/** Brotli (RFC 7932) — the Content-Encoding a large share of modern
  * HTTP fetches arrive under (`Content-Encoding: br`, `.br` bodies);
  * until this round those rows quarantined by name
  * (`unsupported_encoding_br`). Decode side is FROM SCRATCH, built
  * only from the public RFC:
  *
  *  - stream header (WBITS 10..24) and the three meta-block kinds
  *    (metadata/skip, uncompressed, compressed), with the RFC's
  *    zero-padding rules enforced at every byte-boundary jump;
  *  - prefix codes: the simple form (1-4 symbols, both 4-symbol tree
  *    shapes, the sorting rules), and the complex form — the fixed
  *    code-length-code, repeat codes 16/17 with brotli's compounding
  *    repeat-count rule, and EXACT Kraft completeness accounting at
  *    both levels (over- or under-subscribed codes reject, except the
  *    RFC's single-symbol escape);
  *  - the block-switch machinery for all three categories (type trees
  *    with the previous/increment special symbols, the 26-symbol count
  *    code), literal context modes (LSB6/MSB6/UTF8/Signed via the
  *    extracted RFC 7.1 lookup table), and both context maps with
  *    run-length encoding and inverse move-to-front;
  *  - insert&copy command decoding (the 704-symbol two-axis code),
  *    distance codes with the 4-slot ring buffer (initial 4,11,15,16),
  *    its 16 short codes, NDIRECT/NPOSTFIX parametrization, and the
  *    push-rules the RFC mandates (no push on code 0, implicit reuse,
  *    or dictionary hits);
  *  - the STATIC DICTIONARY (RFC Appendix A, shipped as the runtime
  *    resource graft/brotli/dictionary.bin) with all 121 word
  *    transforms (Appendix B) including the UTF-8-aware ferment rule.
  *
  * Reject-don't-guess: truncation, reserved bits, bad window bits,
  * oversubscribed/incomplete codes, invalid distances or dictionary
  * references, meta-block length overruns, nonzero padding, and
  * trailing garbage all quarantine with named reasons; the output cap
  * is enforced BEFORE allocation grows past it (bomb guard). Interop
  * is pinned in BrotliSpec against frames produced by the REAL encoder
  * (the system libbrotli via tools/make_brotli_fixtures.py) across
  * qualities 0..11, windows 10..24, and content shapes incl.
  * multi-meta-block FLUSH streams — decode side here shares no code
  * with it.
  *
  * The ENCODE side is deliberately minimal but produces genuine
  * compressed-path streams: order-0 Huffman literals in single-command
  * meta-blocks (one insert covering the block, so the copy/distance
  * machinery is never entered), with uncompressed meta-blocks when
  * entropy coding cannot win. It exists so Spark-side fixtures (q240's
  * WARC bodies) can carry REAL `br` payloads without a native library
  * on the executors; `tools/verify_brotli_encoders.py` pins that the
  * system libbrotli decodes its output byte-exactly.
  */
object Brotli {

  final case class Rejected(reason: String)
  private final class Bail(val reason: String) extends RuntimeException(reason)
  private def bail(reason: String): Nothing = throw new Bail(reason)

  /** Decoded stream + the census facts a pre-flight report consumes,
    * plus machinery hit-rate counters (the Vp8 predictor-coverage
    * discipline: BrotliSpec asserts the real-encoder fixture set drives
    * every decoder subsystem, so none of them is dead code that only
    * LOOKS interop-verified). */
  final case class Decoded(
      content: Array[Byte],
      windowBits: Int,
      nMetaBlocks: Int,
      nCompressed: Int,
      nUncompressed: Int,
      nMetadata: Int,
      nDictWords: Int,
      maxBlockTypes: Int,
      maxLitTrees: Int,
      maxDistTrees: Int,
      nBlockSwitches: Int,
      usedImtf: Boolean,
      maxNpostfix: Int,
      maxNdirect: Int,
      usedSimpleCode: Boolean,
      maxCodeLen: Int)

  // ---- static dictionary (RFC 7932 Appendix A; runtime resource) ----

  private lazy val dictData: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/brotli/dictionary.bin")
    require(in != null, "graft/brotli/dictionary.bin missing from classpath")
    try in.readAllBytes() finally in.close()
  }
  private lazy val dictOffsets: Array[Int] = {
    // offset(len) = offset(len-1) + ((len-1) << bits(len-1))  (RFC sec. 8)
    val off = new Array[Int](26)
    var i = 1
    while (i <= 25) {
      val prevBits = BrotliTables.DictSizeBits(i - 1)
      off(i) = off(i - 1) + (if (prevBits == 0) 0 else (i - 1) << prevBits)
      i += 1
    }
    off
  }

  // ---- bit reader: LSB-first within bytes; prefix codes MSB-first ----

  private final class Bits(val b: Array[Byte]) {
    val total: Long = b.length.toLong * 8
    var pos = 0L
    def read1(): Int = {
      if (pos >= total) bail("truncated_brotli")
      val v = (b((pos >> 3).toInt) >> (pos & 7).toInt) & 1
      pos += 1
      v
    }
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= read1() << i; i += 1 }
      v
    }
    def readLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v |= read1().toLong << i; i += 1 }
      v
    }
    /** Bit at pos+k, or 0 past the end (the caller re-checks bounds when
      * it advances). */
    def peek(k: Int): Int = {
      val p = pos + k
      if (p >= total) 0
      else (b((p >> 3).toInt) >> (p & 7).toInt) & 1
    }
    /** The next `n <= 8` stream bits assembled as an MSB-first
      * prefix-code key (bit 0 of the stream lands in the key's top
      * bit), zero-padded past the end — the root-table fast path's
      * index. Bulk extraction: two bytes gathered, low 8 stream bits
      * bit-reversed via the table. */
    def peekCode(n: Int): Int = {
      val byteIx = (pos >> 3).toInt
      val sh = (pos & 7).toInt
      var v = 0
      if (byteIx < b.length) v = (b(byteIx) & 0xff) >>> sh
      if (byteIx + 1 < b.length) v |= (b(byteIx + 1) & 0xff) << (8 - sh)
      Rev8(v & 0xff) >>> (8 - n)
    }
    def advance(n: Int): Unit = {
      if (pos + n > total) bail("truncated_brotli")
      pos += n
    }
    /** Jump to the next byte boundary; the skipped bits must be zero
      * (RFC padding rule). */
    def alignZero(): Unit =
      while ((pos & 7) != 0) if (read1() != 0) bail("brotli_padding")
    def byteIndex: Int = (pos >> 3).toInt
    def skipBytes(n: Long): Unit = {
      if ((pos >> 3) + n > b.length) bail("truncated_brotli")
      pos += n * 8
    }
    def atEnd: Boolean = pos >= total
  }

  // ---- canonical prefix codes ----

  private val MaxCodeLen = 15
  /** 8-bit reversal (stream bits are LSB-first, prefix keys MSB-first). */
  private val Rev8: Array[Int] = Array.tabulate(256) { v =>
    var r = 0
    var i = 0
    while (i < 8) { r = (r << 1) | ((v >> i) & 1); i += 1 }
    r
  }

  /** Canonical prefix decoder; `single` >= 0 marks a 0-bit code. A
    * root lookup table over the first min(maxLen, 8) code bits resolves
    * the common short codes in one step; longer codes continue the
    * canonical walk from the root depth. */
  private final class Prefix(
      val count: Array[Int],
      val firstCode: Array[Int],
      val offset: Array[Int],
      val syms: Array[Int],
      val single: Int) {
    private var rootBits = 0
    private var rootSym: Array[Int] = null
    private var rootLen: Array[Byte] = null
    if (single < 0) {
      var maxLen = MaxCodeLen
      while (maxLen > 1 && count(maxLen) == 0) maxLen -= 1
      rootBits = math.min(maxLen, 8)
      rootSym = new Array[Int](1 << rootBits)
      rootLen = new Array[Byte](1 << rootBits)
      var len = 1
      while (len <= rootBits) {
        var i = 0
        while (i < count(len)) {
          val code = firstCode(len) + i
          val base = code << (rootBits - len)
          var k = 0
          while (k < (1 << (rootBits - len))) {
            rootSym(base + k) = syms(offset(len) + i)
            rootLen(base + k) = len.toByte
            k += 1
          }
          i += 1
        }
        len += 1
      }
    }
    def decode(bits: Bits): Int = {
      if (single >= 0) return single
      val key = bits.peekCode(rootBits)
      val l = rootLen(key)
      if (l > 0) {
        bits.advance(l)
        return rootSym(key)
      }
      // long code: the root bits are a strict prefix; continue the walk
      bits.advance(rootBits)
      var code = key
      var len = rootBits
      while (len < MaxCodeLen) {
        code = (code << 1) | bits.read1()
        len += 1
        val c = count(len)
        if (c > 0 && code - firstCode(len) < c)
          return syms(offset(len) + code - firstCode(len))
      }
      bail("brotli_invalid_prefix_code")
    }
  }

  /** Build from (symbol, length) pairs; ties broken by the order given
    * (callers pass canonical symbol order). Assumes the code is exactly
    * complete or a single symbol (callers verify via space accounting). */
  private def buildPrefix(symLen: Array[(Int, Int)]): Prefix = {
    val nz = symLen.filter(_._2 > 0)
    if (nz.length == 1) return new Prefix(null, null, null, null, nz(0)._1)
    val count = new Array[Int](MaxCodeLen + 1)
    nz.foreach { case (_, l) => count(l) += 1 }
    val firstCode = new Array[Int](MaxCodeLen + 1)
    val offset = new Array[Int](MaxCodeLen + 1)
    var code = 0
    var total = 0
    var len = 1
    while (len <= MaxCodeLen) {
      firstCode(len) = code
      offset(len) = total
      code = (code + count(len)) << 1
      total += count(len)
      len += 1
    }
    val syms = new Array[Int](nz.length)
    val fill = offset.clone()
    val sorted = nz.sortBy(_._2) // stable: keeps tie order within a length
    var i = 0
    while (i < sorted.length) {
      val l = sorted(i)._2
      syms(fill(l)) = sorted(i)._1
      fill(l) += 1
      i += 1
    }
    new Prefix(count, firstCode, offset, syms, -1)
  }

  /** Per-stream machinery counters (see [[Decoded]]). */
  private final class Stats {
    var maxBlockTypes = 1
    var maxLitTrees = 1
    var maxDistTrees = 1
    var nBlockSwitches = 0
    var usedImtf = false
    var maxNpostfix = 0
    var maxNdirect = 0
    var usedSimpleCode = false
    var maxCodeLen = 0
  }

  // fixed code for the code-length-code lengths (RFC 7932 sec. 3.5):
  // 4-bit LSB-first lookup -> (bits consumed, code length value)
  private val ClcLen = Array(2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)
  private val ClcVal = Array(0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)
  private val ClcOrder =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read a prefix code for `alphabetSize` symbols (RFC sec. 3.4/3.5). */
  private def readPrefixCode(bits: Bits, alphabetSize: Int,
      stats: Stats): Prefix = {
    val hskip = bits.read(2)
    if (hskip == 1) {
      stats.usedSimpleCode = true
      // simple code: 1-4 symbols listed explicitly
      val nsym = bits.read(2) + 1
      val abits =
        math.max(1, 32 - Integer.numberOfLeadingZeros(alphabetSize - 1))
      val s = Array.fill(nsym)(bits.read(abits))
      s.foreach(v => if (v >= alphabetSize) bail("brotli_bad_simple_symbol"))
      if (s.distinct.length != nsym) bail("brotli_dup_simple_symbol")
      nsym match {
        case 1 => buildPrefix(Array((s(0), 1)))
        case 2 =>
          val o = s.sorted
          buildPrefix(Array((o(0), 1), (o(1), 1)))
        case 3 =>
          val rest = Array(s(1), s(2)).sorted
          buildPrefix(Array((s(0), 1), (rest(0), 2), (rest(1), 2)))
        case _ =>
          if (bits.read1() == 1) { // tree-select: lengths 1,2,3,3
            val rest = Array(s(2), s(3)).sorted
            buildPrefix(Array((s(0), 1), (s(1), 2), (rest(0), 3), (rest(1), 3)))
          } else buildPrefix(s.sorted.map(v => (v, 2)))
      }
    } else {
      // complex code: code-length-code lengths (skipping the first hskip
      // entries of the special ordering), then symbol lengths w/ repeats
      val clcLens = new Array[Int](18)
      var space = 32
      var numCodes = 0
      var lastClc = -1
      var i = hskip
      while (i < 18 && space > 0) {
        val key = bits.peek(0) | (bits.peek(1) << 1) |
          (bits.peek(2) << 2) | (bits.peek(3) << 3)
        bits.advance(ClcLen(key))
        val v = ClcVal(key)
        clcLens(ClcOrder(i)) = v
        if (v != 0) {
          space -= 32 >> v
          numCodes += 1
          lastClc = ClcOrder(i)
        }
        i += 1
      }
      if (space < 0) bail("brotli_oversubscribed_clc")
      if (space > 0 && numCodes != 1) bail("brotli_incomplete_clc")
      val clc =
        if (numCodes == 1) buildPrefix(Array((lastClc, 1)))
        else buildPrefix((0 until 18).map(j => (j, clcLens(j))).toArray)

      val lens = new Array[Int](alphabetSize)
      var sym = 0
      var prevLen = 8 // the RFC's initial repeat length
      var repeat = 0
      var repeatLen = 0
      var space2 = 32768
      var nz = 0
      var lastNzSym = -1
      while (sym < alphabetSize && space2 > 0) {
        val code = clc.decode(bits)
        if (code < 16) {
          lens(sym) = code
          if (code != 0) {
            prevLen = code
            space2 -= 32768 >> code
            nz += 1; lastNzSym = sym
          }
          sym += 1
          repeat = 0
        } else {
          val extraBits = if (code == 16) 2 else 3
          val newLen = if (code == 16) prevLen else 0
          if (repeatLen != newLen) { repeat = 0; repeatLen = newLen }
          val oldRepeat = repeat
          if (repeat > 0) repeat = (repeat - 2) << extraBits
          repeat += bits.read(extraBits) + 3
          val delta = repeat - oldRepeat
          if (sym + delta > alphabetSize) bail("brotli_repeat_overflow")
          var j = 0
          while (j < delta) {
            lens(sym) = repeatLen
            if (repeatLen != 0) { nz += 1; lastNzSym = sym }
            sym += 1
            j += 1
          }
          if (repeatLen != 0) space2 -= delta << (15 - repeatLen)
        }
      }
      if (space2 < 0) bail("brotli_oversubscribed_code")
      if (space2 > 0 && nz != 1) bail("brotli_incomplete_code")
      if (nz == 0) bail("brotli_empty_code")
      stats.maxCodeLen = math.max(stats.maxCodeLen, lens.max)
      if (nz == 1) buildPrefix(Array((lastNzSym, 1)))
      else buildPrefix((0 until alphabetSize).map(j => (j, lens(j))).toArray)
    }
  }

  // ---- variable-length count codes (RFC sec. 9.2) ----

  /** NBLTYPES / NTREES: 1, 2, or (1<<n)+1+extra for n in 1..7. */
  private def readVarLenCount(bits: Bits): Int =
    if (bits.read1() == 0) 1
    else {
      val n = bits.read(3)
      if (n == 0) 2
      else (1 << n) + 1 + bits.read(n)
    }

  // block count code: 26 symbols -> (offset, extra bits)
  private val BlockLenOffset = Array(
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  private val BlockLenBits = Array(
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 6, 6, 7, 8,
    9, 10, 11, 12, 13, 24)

  private def readBlockLength(tree: Prefix, bits: Bits): Int = {
    val s = tree.decode(bits)
    if (s >= 26) bail("brotli_bad_block_count")
    BlockLenOffset(s) + bits.read(BlockLenBits(s))
  }

  // insert / copy length codes (RFC sec. 5)
  private val InsertOffset = Array(
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98, 130, 194,
    322, 578, 1090, 2114, 6210, 22594)
  private val InsertBits = Array(
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9, 10,
    12, 14, 24)
  private val CopyOffset = Array(
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54, 70, 102,
    134, 198, 326, 582, 1094, 2118)
  private val CopyBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 7, 8, 9,
    10, 24)
  // insert-and-copy cell tables (RFC sec. 5): cells 2..10
  private val InsertRangeLut = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  private val CopyRangeLut = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  // ---- context maps ----

  private def readContextMap(bits: Bits, numTrees: Int,
      size: Int, stats: Stats): Array[Byte] = {
    val map = new Array[Byte](size)
    if (numTrees == 1) return map
    val rleMax = if (bits.read1() == 1) bits.read(4) + 1 else 0
    val tree = readPrefixCode(bits, numTrees + rleMax, stats)
    var i = 0
    while (i < size) {
      val s = tree.decode(bits)
      if (s == 0) { map(i) = 0; i += 1 }
      else if (s <= rleMax) {
        val reps = (1 << s) + bits.read(s)
        if (i + reps > size) bail("brotli_context_map_overflow")
        i += reps // zero run
      } else {
        map(i) = (s - rleMax).toByte
        i += 1
      }
    }
    if (bits.read1() == 1) {
      stats.usedImtf = true
      // inverse move-to-front
      val mtf = Array.tabulate(256)(_.toByte)
      var j = 0
      while (j < size) {
        val idx = map(j) & 0xff
        val v = mtf(idx)
        var k = idx
        while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
        mtf(0) = v
        map(j) = v
        j += 1
      }
    }
    map.foreach(v => if ((v & 0xff) >= numTrees) bail("brotli_bad_context_map"))
    map
  }

  // ---- block-category state ----

  private final class BlockState(bits: Bits, val nTypes: Int,
      stats: Stats) {
    private var typeTree: Prefix = null
    private var countTree: Prefix = null
    var btype = 0
    var remaining = 1 << 28 // effectively infinite for nTypes == 1
    private var last = 0
    private var secondLast = 1
    if (nTypes >= 2) {
      typeTree = readPrefixCode(bits, nTypes + 2, stats)
      countTree = readPrefixCode(bits, 26, stats)
      remaining = readBlockLength(countTree, bits)
    }
    def switchIfNeeded(): Unit =
      if (remaining == 0) {
        if (nTypes < 2) bail("brotli_block_underflow")
        stats.nBlockSwitches += 1
        val s = typeTree.decode(bits)
        var nt =
          if (s == 0) secondLast
          else if (s == 1) last + 1
          else s - 2
        if (nt >= nTypes) nt -= nTypes
        secondLast = last
        last = nt
        btype = nt
        remaining = readBlockLength(countTree, bits)
      }
  }

  // ---- output buffer with bomb cap ----

  private final class Out(maxOut: Int) {
    var a = new Array[Byte](math.min(64 * 1024, math.max(64, maxOut)))
    var n = 0
    private def ensure(extra: Int): Unit = {
      if (n.toLong + extra > maxOut) bail("brotli_bomb")
      if (n + extra > a.length) {
        var cap = a.length.toLong
        while (cap < n.toLong + extra) cap = math.min(maxOut.toLong, cap * 2)
        a = java.util.Arrays.copyOf(a, cap.toInt)
      }
    }
    def byteAt(i: Int): Int = a(i) & 0xff
    def append(b: Byte): Unit = { ensure(1); a(n) = b; n += 1 }
    def append(src: Array[Byte], from: Int, len: Int): Unit = {
      ensure(len)
      System.arraycopy(src, from, a, n, len)
      n += len
    }
    def copyMatch(dist: Int, len: Int): Unit = {
      ensure(len)
      var i = 0
      while (i < len) { a(n) = a(n - dist); n += 1; i += 1 }
    }
    def toArray: Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  // ---- word transforms (RFC Appendix B) ----

  /** Ferment (uppercase) at `pos`, the RFC's UTF-8-aware rule; returns
    * the number of bytes consumed. */
  private def ferment(w: Array[Byte], pos: Int): Int = {
    val c = w(pos) & 0xff
    if (c < 192) {
      if (c >= 'a' && c <= 'z') w(pos) = (w(pos) ^ 32).toByte
      1
    } else if (c < 224) {
      if (pos + 1 < w.length) w(pos + 1) = (w(pos + 1) ^ 32).toByte
      2
    } else {
      if (pos + 2 < w.length) w(pos + 2) = (w(pos + 2) ^ 5).toByte
      3
    }
  }

  private def transformWord(word: Array[Byte],
      transformId: Int): Array[Byte] = {
    val (prefix, ty, suffix) = BrotliTables.Transforms(transformId)
    var w = word
    if (ty >= 12 && ty <= 20) { // omit first 1..9
      val cut = math.min(ty - 11, w.length)
      w = java.util.Arrays.copyOfRange(w, cut, w.length)
    } else if (ty >= 1 && ty <= 9) { // omit last 1..9
      w = java.util.Arrays.copyOfRange(w, 0, math.max(0, w.length - ty))
    } else if (ty == 10 || ty == 11) {
      w = w.clone()
      if (ty == 10) { if (w.length > 0) ferment(w, 0) }
      else {
        var i = 0
        while (i < w.length) i += ferment(w, i)
      }
    }
    val out = new Array[Byte](prefix.length + w.length + suffix.length)
    System.arraycopy(prefix, 0, out, 0, prefix.length)
    System.arraycopy(w, 0, out, prefix.length, w.length)
    System.arraycopy(suffix, 0, out, prefix.length + w.length, suffix.length)
    out
  }

  // ---- decoder ----

  /** Decode one complete brotli stream. Trailing bytes after the final
    * meta-block reject (`brotli_trailing_garbage`); output larger than
    * `maxOut` rejects (`brotli_bomb`) before the allocation grows. */
  def decode(b: Array[Byte],
      maxOut: Int = 1 << 24): Either[Rejected, Decoded] =
    try Right(run(b, maxOut))
    catch { case e: Bail => Left(Rejected(e.reason)) }

  private def run(b: Array[Byte], maxOut: Int): Decoded = {
    val bits = new Bits(b)
    // WBITS (RFC sec. 9.1)
    val wbits =
      if (bits.read1() == 0) 16
      else {
        val n = bits.read(3)
        if (n != 0) 17 + n
        else {
          val m = bits.read(3)
          if (m == 0) 17
          else if (m == 1) bail("brotli_bad_window_bits")
          else 8 + m
        }
      }
    val windowSize = (1 << wbits) - 16
    val out = new Out(maxOut)
    // distance ring buffer: last = 4, then 11, 15, 16 (RFC sec. 4)
    val distRb = Array(16, 15, 11, 4)
    val rbIdx = Array(3) // index of the most recently written slot
    var nMeta, nCompressed, nUncompressed, nMetadata, nDictWords = 0
    val stats = new Stats
    var isLast = false

    while (!isLast) {
      isLast = bits.read1() == 1
      val lastEmpty = isLast && bits.read1() == 1
      if (!lastEmpty) {
        val mnibbles = bits.read(2) match {
          case 3 => 0
          case v => v + 4
        }
        if (mnibbles == 0) {
          // metadata / skip block
          if (bits.read1() != 0) bail("brotli_reserved_bit")
          val mskipBytes = bits.read(2)
          val mskipLen =
            if (mskipBytes == 0) 0L
            else {
              val v = bits.readLong(8 * mskipBytes)
              if (mskipBytes > 1 && (v >> (8 * (mskipBytes - 1))) == 0)
                bail("brotli_nonminimal_skip")
              v + 1
            }
          bits.alignZero()
          bits.skipBytes(mskipLen)
          nMetadata += 1
          nMeta += 1
        } else {
          val mlen = {
            val v = bits.read(4 * mnibbles)
            if (mnibbles > 4 && (v >> (4 * (mnibbles - 1))) == 0)
              bail("brotli_nonminimal_mlen")
            v + 1
          }
          val isUncompressed = !isLast && bits.read1() == 1
          nMeta += 1
          if (isUncompressed) {
            bits.alignZero()
            val start = bits.byteIndex
            if (start + mlen > b.length) bail("truncated_brotli")
            out.append(b, start, mlen)
            bits.skipBytes(mlen.toLong)
            nUncompressed += 1
          } else {
            nCompressed += 1
            nDictWords +=
              decodeCompressedMetaBlock(bits, out, mlen, windowSize,
                distRb, rbIdx, stats)
          }
        }
      }
    }
    bits.alignZero()
    if (!bits.atEnd) bail("brotli_trailing_garbage")
    Decoded(out.toArray, wbits, nMeta, nCompressed, nUncompressed,
      nMetadata, nDictWords, stats.maxBlockTypes, stats.maxLitTrees,
      stats.maxDistTrees, stats.nBlockSwitches, stats.usedImtf,
      stats.maxNpostfix, stats.maxNdirect, stats.usedSimpleCode,
      stats.maxCodeLen)
  }

  private def decodeCompressedMetaBlock(bits: Bits, out: Out, mlen: Int,
      windowSize: Int, distRb: Array[Int], rbIdxBox: Array[Int],
      stats: Stats): Int = {
    // 1-3. block categories: literals, insert&copy, distances
    val blkL = new BlockState(bits, readVarLenCount(bits), stats)
    val blkI = new BlockState(bits, readVarLenCount(bits), stats)
    val blkD = new BlockState(bits, readVarLenCount(bits), stats)
    stats.maxBlockTypes = math.max(stats.maxBlockTypes,
      math.max(blkL.nTypes, math.max(blkI.nTypes, blkD.nTypes)))
    // 4. distance parameters
    val npostfix = bits.read(2)
    val ndirect = bits.read(4) << npostfix
    stats.maxNpostfix = math.max(stats.maxNpostfix, npostfix)
    stats.maxNdirect = math.max(stats.maxNdirect, ndirect)
    val postfixMask = (1 << npostfix) - 1
    // 5. context modes (2 bits per literal block type)
    val contextModes = Array.fill(blkL.nTypes)(bits.read(2))
    // 6-7. context maps
    val nTreesL = readVarLenCount(bits)
    val cmapL = readContextMap(bits, nTreesL, 64 * blkL.nTypes, stats)
    val nTreesD = readVarLenCount(bits)
    val cmapD = readContextMap(bits, nTreesD, 4 * blkD.nTypes, stats)
    stats.maxLitTrees = math.max(stats.maxLitTrees, nTreesL)
    stats.maxDistTrees = math.max(stats.maxDistTrees, nTreesD)
    // 8-10. prefix code arrays
    val litTrees = Array.fill(nTreesL)(readPrefixCode(bits, 256, stats))
    val cmdTrees = Array.fill(blkI.nTypes)(readPrefixCode(bits, 704, stats))
    val distAlphabet = 16 + ndirect + (48 << npostfix)
    val distTrees =
      Array.fill(nTreesD)(readPrefixCode(bits, distAlphabet, stats))

    val lut = BrotliTables.ContextLut
    var remaining = mlen
    var nDictWords = 0
    var rbIdx = rbIdxBox(0)

    def rb(k: Int): Int = distRb((rbIdx - k) & 3)
    def pushDistance(d: Int): Unit = {
      rbIdx = (rbIdx + 1) & 3
      distRb(rbIdx) = d
    }

    while (remaining > 0) {
      blkI.switchIfNeeded()
      blkI.remaining -= 1
      val cmd = cmdTrees(blkI.btype).decode(bits)
      val cell = cmd >> 6
      var implicitDist = false
      var insertCode = 0
      var copyCode = 0
      if (cell < 2) {
        implicitDist = true
        insertCode = (cmd >> 3) & 7
        copyCode = (cell << 3) + (cmd & 7)
      } else {
        insertCode = InsertRangeLut(cell - 2) + ((cmd >> 3) & 7)
        copyCode = CopyRangeLut(cell - 2) + (cmd & 7)
      }
      val insertLen =
        InsertOffset(insertCode) + bits.read(InsertBits(insertCode))
      val copyLen = CopyOffset(copyCode) + bits.read(CopyBits(copyCode))
      if (insertLen > remaining) bail("brotli_metablock_overflow")

      // literals
      var i = 0
      while (i < insertLen) {
        blkL.switchIfNeeded()
        blkL.remaining -= 1
        val mode = contextModes(blkL.btype)
        val p1 = if (out.n > 0) out.byteAt(out.n - 1) else 0
        val p2 = if (out.n > 1) out.byteAt(out.n - 2) else 0
        val ctx = (lut((mode << 9) + p1) | lut((mode << 9) + 256 + p2)) & 0xff
        val tree = litTrees(cmapL((blkL.btype << 6) + ctx) & 0xff)
        out.append(tree.decode(bits).toByte)
        i += 1
      }
      remaining -= insertLen
      if (remaining > 0) {
        val maxDistance = math.min(out.n, windowSize)
        var distance = 0L
        var pushAfter = false
        if (implicitDist) {
          distance = rb(0)
        } else {
          blkD.switchIfNeeded()
          blkD.remaining -= 1
          val dctx = math.min(copyLen, 5) - 2
          val tree = distTrees(cmapD((blkD.btype << 2) + dctx) & 0xff)
          val dsym = tree.decode(bits)
          if (dsym < 16) {
            distance = dsym match {
              case 0 => rb(0)
              case 1 => rb(1)
              case 2 => rb(2)
              case 3 => rb(3)
              case 4 => rb(0) - 1
              case 5 => rb(0) + 1
              case 6 => rb(0) - 2
              case 7 => rb(0) + 2
              case 8 => rb(0) - 3
              case 9 => rb(0) + 3
              case 10 => rb(1) - 1
              case 11 => rb(1) + 1
              case 12 => rb(1) - 2
              case 13 => rb(1) + 2
              case 14 => rb(1) - 3
              case _ => rb(1) + 3
            }
            if (distance <= 0) bail("brotli_invalid_distance")
            pushAfter = dsym != 0
          } else if (dsym < 16 + ndirect) {
            distance = dsym - 16 + 1
            pushAfter = true
          } else {
            val d = dsym - ndirect - 16
            val hcode = d >>> npostfix
            val lcode = d & postfixMask
            val ndistbits = 1 + (hcode >> 1)
            val extra = bits.readLong(ndistbits)
            val offset = ((2L + (hcode & 1)) << ndistbits) - 4
            distance = ((offset + extra) << npostfix) + lcode + ndirect + 1
            pushAfter = true
          }
        }
        if (distance > maxDistance) {
          // static dictionary reference (RFC sec. 8)
          if (copyLen < 4 || copyLen > 24) bail("brotli_bad_dict_length")
          val shift = BrotliTables.DictSizeBits(copyLen)
          if (shift == 0) bail("brotli_bad_dict_length")
          val wordId = distance - maxDistance - 1
          val transformId = wordId >> shift
          if (transformId >= 121) bail("brotli_bad_dict_transform")
          val idx = (wordId & ((1 << shift) - 1)).toInt
          val off = dictOffsets(copyLen) + idx * copyLen
          val word =
            java.util.Arrays.copyOfRange(dictData, off, off + copyLen)
          val o = transformWord(word, transformId.toInt)
          if (o.length > remaining) bail("brotli_metablock_overflow")
          out.append(o, 0, o.length)
          remaining -= o.length
          nDictWords += 1
          // dictionary references never push to the distance ring buffer
        } else {
          if (copyLen > remaining) bail("brotli_metablock_overflow")
          out.copyMatch(distance.toInt, copyLen)
          remaining -= copyLen
          if (pushAfter) pushDistance(distance.toInt)
        }
      }
      // remaining == 0 after insert: the copy part of the final command
      // is not present (RFC sec. 9.3)
    }
    rbIdxBox(0) = rbIdx
    nDictWords
  }

  // ======================================================== encoder ====

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { buf.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    def alignZero(): Unit =
      if (nBits > 0) { buf.write(cur); cur = 0; nBits = 0 }
    def writeBytes(b: Array[Byte], from: Int, len: Int): Unit = {
      require(nBits == 0)
      buf.write(b, from, len)
    }
    def toArray: Array[Byte] = { alignZero(); buf.toByteArray }
  }

  /** Canonical length-limited Huffman lengths via package-merge:
    * exactly Kraft-complete for >= 2 used symbols. */
  private def packageMerge(freq: Array[Long], maxLen: Int): Array[Int] = {
    val leaves = freq.zipWithIndex.filter(_._1 > 0)
      .map { case (f, s) => (f, List(s)) }.sortBy(_._1)
    require(leaves.length >= 2 && leaves.length <= (1 << maxLen))
    var merged = leaves
    var level = 1
    while (level < maxLen) {
      val pairs = merged.grouped(2).filter(_.length == 2)
        .map(p => (p(0)._1 + p(1)._1, p(0)._2 ++ p(1)._2)).toArray
      merged = (pairs ++ leaves).sortBy(_._1)
      level += 1
    }
    val counts = new Array[Int](freq.length)
    merged.take(2 * leaves.length - 2)
      .foreach(_._2.foreach(s => counts(s) += 1))
    counts
  }

  /** Canonical code assignment; returns (reversed-bits, len) per symbol
    * ready for an LSB-first writer (prefix codes are MSB-first). */
  private def canonicalCodes(lens: Array[Int]): Array[(Int, Int)] = {
    val maxL = lens.max
    val count = new Array[Int](maxL + 1)
    lens.foreach(l => if (l > 0) count(l) += 1)
    val next = new Array[Int](maxL + 1)
    var code = 0
    var l = 1
    while (l <= maxL) {
      next(l) = code
      code = (code + count(l)) << 1
      l += 1
    }
    lens.map { len =>
      if (len == 0) (0, 0)
      else {
        val c = next(len)
        next(len) += 1
        var r = 0
        var i = 0
        while (i < len) { r = (r << 1) | ((c >> i) & 1); i += 1 }
        (r, len)
      }
    }
  }

  // fixed CLC-length code, by code-length value 0..5: (bits, len)
  private val FixedClcBits = Array(0, 7, 3, 2, 1, 15)
  private val FixedClcLen = Array(2, 4, 3, 2, 2, 4)

  private def writePrefixCode(w: BitWriter, lens: Array[Int]): Unit = {
    // complex form, hskip = 0, no repeat codes (fixture-grade encoder)
    val lastNz = lens.lastIndexWhere(_ > 0)
    val clFreq = new Array[Long](18)
    (0 to lastNz).foreach(i => clFreq(lens(i)) += 1)
    val clLens = new Array[Int](18)
    if (clFreq.count(_ > 0) == 1) {
      // lone code-length symbol: give it and a never-used partner 1-bit
      // codes to keep the CLC exactly complete
      val lone = clFreq.indexWhere(_ > 0)
      clLens(lone) = 1
      clLens(if (lone == 0) 1 else 0) = 1
    } else {
      val pm = packageMerge(clFreq, 5)
      System.arraycopy(pm, 0, clLens, 0, 18)
    }
    w.write(0, 2) // hskip = 0
    // the decoder stops reading CLC entries the moment the code is
    // complete (space == 0) — the writer must stop at the same entry
    var clcSpace = 32
    var oi = 0
    while (oi < 18 && clcSpace > 0) {
      val l = clLens(ClcOrder(oi))
      w.write(FixedClcBits(l), FixedClcLen(l))
      if (l != 0) clcSpace -= 32 >> l
      oi += 1
    }
    val clCodes = canonicalCodes(clLens)
    (0 to lastNz).foreach { i =>
      val (code, len) = clCodes(lens(i))
      w.write(code, len)
    }
  }

  private def writeWbits(w: BitWriter, wbits: Int): Unit =
    if (wbits == 16) w.write(0, 1)
    else if (wbits == 17) { w.write(1, 1); w.write(0, 3); w.write(0, 3) }
    else if (wbits >= 18 && wbits <= 24) {
      w.write(1, 1); w.write(wbits - 17, 3)
    } else if (wbits >= 10 && wbits <= 15) {
      w.write(1, 1); w.write(0, 3); w.write(wbits - 8, 3)
    } else throw new IllegalArgumentException(s"wbits $wbits")

  /** Minimal-but-genuine brotli encoder: order-0 Huffman literals in
    * single-command compressed meta-blocks (uncompressed meta-blocks
    * when entropy coding cannot win). Valid RFC 7932 output — pinned
    * against the system libbrotli by tools/verify_brotli_encoders.py. */
  def encode(data: Array[Byte], wbits: Int = 22): Array[Byte] = {
    val w = new BitWriter
    writeWbits(w, wbits)
    if (data.isEmpty) {
      w.write(1, 1) // ISLAST
      w.write(1, 1) // ISLASTEMPTY
      return w.toArray
    }
    val MaxBlock = 1 << 22
    var off = 0
    while (off < data.length) {
      val len = math.min(MaxBlock, data.length - off)
      writeMetaBlock(w, data, off, len, last = off + len == data.length)
      off += len
    }
    w.toArray
  }

  private def writeMetaBlock(w: BitWriter, data: Array[Byte], off: Int,
      len: Int, last: Boolean): Unit = {
    val freq = new Array[Long](256)
    var i = off
    while (i < off + len) { freq(data(i) & 0xff) += 1; i += 1 }
    val distinct = freq.count(_ > 0)
    val lens = if (distinct >= 5) packageMerge(freq, 15) else null
    val huffBits =
      if (lens == null) 0L
      else (0 until 256).map(s => freq(s) * lens(s)).sum
    // uncompressed only exists for non-last meta-blocks
    val entropyWins =
      distinct <= 4 || huffBits / 8 + 512 < len || last

    w.write(if (last) 1 else 0, 1) // ISLAST
    if (last) w.write(0, 1)        // not ISLASTEMPTY
    val nibbles = if (len <= (1 << 16)) 4 else if (len <= (1 << 20)) 5 else 6
    w.write(nibbles - 4, 2)
    w.write(len - 1, 4 * nibbles)
    if (!entropyWins) {
      w.write(1, 1) // ISUNCOMPRESSED
      w.alignZero()
      w.writeBytes(data, off, len)
      return
    }
    if (!last) w.write(0, 1) // not uncompressed
    // compressed meta-block, single literal-only command:
    w.write(0, 1) // NBLTYPESL = 1
    w.write(0, 1) // NBLTYPESI = 1
    w.write(0, 1) // NBLTYPESD = 1
    w.write(0, 2) // NPOSTFIX = 0
    w.write(0, 4) // NDIRECT = 0
    w.write(0, 2) // context mode LSB6 (the context map is trivial anyway)
    w.write(0, 1) // NTREESL = 1
    w.write(0, 1) // NTREESD = 1
    // literal prefix code
    val symCodes: Array[(Int, Int)] =
      if (distinct == 1) {
        val sym = freq.indexWhere(_ > 0)
        w.write(1, 2) // hskip = 1: simple code
        w.write(0, 2) // NSYM - 1 = 0
        w.write(sym, 8)
        null // 0-bit code: no literal bits at all
      } else if (distinct <= 4) {
        val syms = freq.zipWithIndex.filter(_._1 > 0).map(_._2)
          .sortBy(s => (-freq(s), s))
        w.write(1, 2)
        w.write(syms.length - 1, 2)
        syms.foreach(s => w.write(s, 8))
        if (syms.length == 4) w.write(0, 1) // flat 2,2,2,2
        val simpleLens = syms.length match {
          case 2 => Array(1, 1)
          case 3 => Array(1, 2, 2)
          case _ => Array(2, 2, 2, 2)
        }
        // replicate the decoder's canonical ordering to assign codes
        val lens2 = new Array[Int](256)
        syms.zip(simpleLens).foreach { case (s, l) => lens2(s) = l }
        canonicalCodesInDecoderOrder(lens2)
      } else {
        writePrefixCode(w, lens)
        canonicalCodes(lens)
      }
    // command prefix code: simple, single symbol (10-bit alphabet 704)
    w.write(1, 2)
    w.write(0, 2)
    w.write(commandSymbolForInsert(len), 10)
    // distance prefix code: simple, single symbol 0 (alphabet 64)
    w.write(1, 2)
    w.write(0, 2)
    w.write(0, 6)
    // the one command: insert = len; the copy part is never reached
    val ic = insertCodeFor(len)
    w.write(len - InsertOffset(ic), InsertBits(ic))
    if (symCodes != null) {
      var j = off
      while (j < off + len) {
        val (c, l) = symCodes(data(j) & 0xff)
        w.write(c, l)
        j += 1
      }
    }
    if (last) w.alignZero()
  }

  /** Canonical codes where ties within a length follow SYMBOL VALUE
    * (the decoder's order for simple codes after its sorting rules). */
  private def canonicalCodesInDecoderOrder(lens: Array[Int]): Array[(Int, Int)] =
    canonicalCodes(lens) // symbol-index iteration already orders by value

  /** Smallest insert code whose range contains `n`. */
  private def insertCodeFor(n: Int): Int = {
    var c = InsertOffset.length - 1
    while (c > 0 && InsertOffset(c) > n) c -= 1
    c
  }

  /** Command symbol for (insert code, copy code 0); prefers the
    * implicit-distance cells so no distance symbol is ever coded. */
  private def commandSymbolForInsert(len: Int): Int = {
    val ic = insertCodeFor(len)
    if (ic < 8) ic << 3        // cell 0: implicit last-distance
    else if (ic < 16) 256 + ((ic - 8) << 3)
    else 448 + ((ic - 16) << 3)
  }
}
