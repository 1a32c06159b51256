package graft.operators

/** bzip2 decoder, from scratch — the BWT+MTF+Huffman archive coding
  * `.tar.bz2` bundles and the odd `Content-Encoding: bzip2` server
  * ride. Format per the public bzip2 stream layout (the reference
  * implementation's documented behavior; interop pinned BOTH
  * directions against the real codec — commons-compress on the
  * classpath writes the spec fixtures and tools/fuzz_bzip2_diff.py
  * sweeps the parameter space through CPython's libbz2 binding):
  *
  *   stream  = 'BZh' level('1'..'9') block* footer
  *   block   = magic 0x314159265359, CRC32 (bzip2 flavor: MSB-first
  *             0x04C11DB7, init/xorout 0xFFFFFFFF), randomized bit
  *             (deprecated — rejected by name), 24-bit origPtr,
  *             2-level symbol-used bitmap, 2..6 Huffman groups with
  *             delta-coded lengths 1..20, unary MTF-coded selectors
  *             switching groups every 50 symbols, then the symbol
  *             stream: RUNA/RUNB zero-run pairs (bijective base 2),
  *             MTF values, EOB.
  *   layers  = Huffman → MTF (+zero runs) → inverse BWT (origPtr) →
  *             RLE1 (4 equal bytes + count) → block bytes.
  *   footer  = magic 0x177245385090, stream CRC (rotl1-combined
  *             block CRCs), pad to byte; streams may CONCATENATE
  *             (pbzip2 output) — all are decoded.
  *
  * Reject-don't-guess with named reasons; the output cap is enforced
  * DURING RLE1 expansion (a tiny block can declare huge runs — the
  * bomb lives in the last layer). Per-row byte work downstream, no
  * shuffle.
  */
object Bzip2 {

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  /** bzip2's CRC32: polynomial 0x04C11DB7 fed MSB-first (the
    * bit-reversed cousin of zlib's reflected CRC). */
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) {
        c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04C11DB7 else c << 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private final class BitIn(b: Array[Byte]) {
    var pos = 0 // bit position
    def bits(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val byteAt = pos >>> 3
        if (byteAt >= b.length) bail("truncated_bzip2")
        v = (v << 1) | ((b(byteAt) >> (7 - (pos & 7))) & 1)
        pos += 1
        k += 1
      }
      v
    }
    def bit(): Int = bits(1)
    def bitsLong(n: Int): Long = {
      var v = 0L
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def aligned: Boolean = (pos & 7) == 0
    def atEnd: Boolean = (pos >>> 3) >= b.length
    /** After a footer: skip pad bits to the byte boundary. */
    def align(): Unit = pos = (pos + 7) & ~7
  }

  private val BlockMagic = 0x314159265359L
  private val FooterMagic = 0x177245385090L
  private val MaxGroups = 6
  private val GroupRunLength = 50
  private val MaxHuffLen = 20

  /** Decode a (possibly multi-stream) bzip2 blob. `maxOut` caps the
    * total decoded size, enforced before allocation outruns it. */
  def decode(blob: Array[Byte], maxOut: Int = 1 << 26): Either[Rejected, Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      val in = new BitIn(blob)
      if (in.atEnd) bail("truncated_bzip2")
      while (!in.atEnd) {
        decodeStream(in, out, maxOut)
        // pad to byte boundary between concatenated streams
        in.align()
      }
      Right(out.toByteArray)
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  private def decodeStream(in: BitIn, out: java.io.ByteArrayOutputStream,
      maxOut: Int): Unit = {
    if (in.bits(8) != 'B' || in.bits(8) != 'Z' || in.bits(8) != 'h')
      bail("bad_magic")
    val level = in.bits(8) - '0'
    if (level < 1 || level > 9) bail("bad_level")
    val maxBlock = level * 100000
    var streamCrc = 0
    var sawFooter = false
    while (!sawFooter) {
      val magic = in.bitsLong(48)
      if (magic == FooterMagic) {
        val want = in.bitsLong(32).toInt
        if (want != streamCrc) bail("stream_crc_mismatch")
        sawFooter = true
      } else if (magic == BlockMagic) {
        val blockCrc = decodeBlock(in, out, maxBlock, maxOut)
        streamCrc = ((streamCrc << 1) | (streamCrc >>> 31)) ^ blockCrc
      } else bail("bad_block_magic")
    }
  }

  /** One block; returns its verified CRC. */
  private def decodeBlock(in: BitIn, out: java.io.ByteArrayOutputStream,
      maxBlock: Int, maxOut: Int): Int = {
    val wantCrc = in.bitsLong(32).toInt
    if (in.bit() != 0) bail("randomized_unsupported")
    val origPtr = in.bits(24)

    // 2-level symbol map: which byte values occur in the block
    val used = new Array[Boolean](256)
    var nUsed = 0
    val ranges = in.bits(16)
    var r = 0
    while (r < 16) {
      if ((ranges & (0x8000 >>> r)) != 0) {
        val fine = in.bits(16)
        var k = 0
        while (k < 16) {
          if ((fine & (0x8000 >>> k)) != 0) { used(r * 16 + k) = true; nUsed += 1 }
          k += 1
        }
      }
      r += 1
    }
    if (nUsed == 0) bail("empty_symbol_map")
    val seqToByte = new Array[Byte](nUsed)
    var bi = 0
    var si = 0
    while (bi < 256) { if (used(bi)) { seqToByte(si) = bi.toByte; si += 1 }; bi += 1 }
    val alphaSize = nUsed + 2

    val nGroups = in.bits(3)
    if (nGroups < 2 || nGroups > MaxGroups) bail("bad_group_count")
    val nSelectors = in.bits(15)
    if (nSelectors < 1) bail("bad_selector_count")
    // selectors: unary-coded MTF over the group list
    val selectorMtf = new Array[Int](nSelectors)
    var sl = 0
    while (sl < nSelectors) {
      var j = 0
      while (in.bit() == 1) {
        j += 1
        if (j >= nGroups) bail("bad_selector")
      }
      selectorMtf(sl) = j
      sl += 1
    }
    val pos = Array.tabulate(nGroups)(identity)
    val selectors = new Array[Int](nSelectors)
    sl = 0
    while (sl < nSelectors) {
      val v = selectorMtf(sl)
      val tmp = pos(v)
      var k = v
      while (k > 0) { pos(k) = pos(k - 1); k -= 1 }
      pos(0) = tmp
      selectors(sl) = tmp
      sl += 1
    }

    // per-group delta-coded code lengths
    val lens = Array.ofDim[Int](nGroups, alphaSize)
    var g = 0
    while (g < nGroups) {
      var cur = in.bits(5)
      var sym = 0
      while (sym < alphaSize) {
        var continue = true
        while (continue) {
          if (cur < 1 || cur > MaxHuffLen) bail("bad_huffman_len")
          if (in.bit() == 0) continue = false
          else { if (in.bit() == 0) cur += 1 else cur -= 1 }
        }
        lens(g)(sym) = cur
        sym += 1
      }
      g += 1
    }

    // canonical decode tables, the reference decoder's limit/base/perm
    val limit = Array.ofDim[Int](nGroups, MaxHuffLen + 2)
    val base = Array.ofDim[Int](nGroups, MaxHuffLen + 2)
    val perm = Array.ofDim[Int](nGroups, alphaSize)
    val minLens = new Array[Int](nGroups)
    g = 0
    while (g < nGroups) {
      var minLen = MaxHuffLen
      var maxLen = 1
      var sym = 0
      while (sym < alphaSize) {
        if (lens(g)(sym) > maxLen) maxLen = lens(g)(sym)
        if (lens(g)(sym) < minLen) minLen = lens(g)(sym)
        sym += 1
      }
      var pp = 0
      var l = minLen
      while (l <= maxLen) {
        sym = 0
        while (sym < alphaSize) {
          if (lens(g)(sym) == l) { perm(g)(pp) = sym; pp += 1 }
          sym += 1
        }
        l += 1
      }
      val cnt = new Array[Int](MaxHuffLen + 2)
      sym = 0
      while (sym < alphaSize) { cnt(lens(g)(sym) + 1) += 1; sym += 1 }
      var i = 1
      while (i < cnt.length) { cnt(i) += cnt(i - 1); i += 1 }
      var vec = 0
      l = minLen
      while (l <= maxLen) {
        vec += cnt(l + 1) - cnt(l)
        limit(g)(l) = vec - 1
        vec <<= 1
        l += 1
      }
      l = minLen + 1
      while (l <= maxLen) {
        base(g)(l) = ((limit(g)(l - 1) + 1) << 1) - cnt(l)
        l += 1
      }
      // over-subscribed / incomplete tables decode garbage: insist the
      // code space is exactly full (Kraft equality — after the final
      // shift, vec must be 2^(maxLen+1))
      if (vec != (1 << (maxLen + 1))) bail("bad_huffman_table")
      base(g)(minLen) = 0 - cnt(minLen)
      minLens(g) = minLen
      g += 1
    }

    // symbol stream -> MTF/RLE2 decode into the BWT column
    val bwt = new Array[Byte](maxBlock)
    var nblock = 0
    val mtf = new Array[Byte](nUsed)
    System.arraycopy(seqToByte, 0, mtf, 0, nUsed)
    var groupNo = -1
    var groupPos = 0
    var curG = 0
    def nextSym(): Int = {
      if (groupPos == 0) {
        groupNo += 1
        if (groupNo >= nSelectors) bail("selector_underrun")
        groupPos = GroupRunLength
        curG = selectors(groupNo)
      }
      groupPos -= 1
      var zn = minLens(curG)
      var zvec = in.bits(zn)
      while (zvec > limit(curG)(zn)) {
        zn += 1
        if (zn > MaxHuffLen) bail("bad_symbol")
        zvec = (zvec << 1) | in.bit()
      }
      val idx = zvec - base(curG)(zn)
      if (idx < 0 || idx >= alphaSize) bail("bad_symbol")
      perm(curG)(idx)
    }
    val eob = alphaSize - 1
    var run = 0L
    var runBit = 0
    var sym = nextSym()
    while (sym != eob) {
      if (sym <= 1) { // RUNA/RUNB: bijective base-2 zero-run length
        run += (sym + 1).toLong << runBit
        runBit += 1
        if (run > maxBlock) bail("block_overflow")
      } else {
        if (run > 0) {
          if (nblock + run > maxBlock) bail("block_overflow")
          java.util.Arrays.fill(bwt, nblock, nblock + run.toInt, mtf(0))
          nblock += run.toInt
          run = 0; runBit = 0
        }
        // MTF value sym-1 (1-based beyond the run pair)
        val v = sym - 1
        if (v >= nUsed) bail("bad_symbol")
        val b = mtf(v)
        var k = v
        while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
        mtf(0) = b
        if (nblock >= maxBlock) bail("block_overflow")
        bwt(nblock) = b
        nblock += 1
      }
      sym = nextSym()
    }
    if (run > 0) {
      if (nblock + run > maxBlock) bail("block_overflow")
      java.util.Arrays.fill(bwt, nblock, nblock + run.toInt, mtf(0))
      nblock += run.toInt
      run = 0
    }
    if (nblock == 0) bail("empty_block")
    if (origPtr >= nblock) bail("bad_origptr")

    // inverse BWT via the next-index vector
    val cftab = new Array[Int](257)
    var i = 0
    while (i < nblock) { cftab((bwt(i) & 0xff) + 1) += 1; i += 1 }
    i = 1
    while (i < 257) { cftab(i) += cftab(i - 1); i += 1 }
    val tt = new Array[Int](nblock)
    i = 0
    while (i < nblock) {
      val b = bwt(i) & 0xff
      tt(cftab(b)) = i
      cftab(b) += 1
      i += 1
    }

    // walk + RLE1 decode + CRC, single pass
    var crc = 0xFFFFFFFF
    def put(b: Byte): Unit = {
      if (out.size() >= maxOut) bail("bzip2_bomb")
      out.write(b)
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ (b & 0xff)) & 0xff)
    }
    var p = tt(origPtr)
    var emitted = 0
    var runByte = -1
    var runLen = 0
    while (emitted < nblock) {
      val b = bwt(p)
      p = tt(p)
      emitted += 1
      if (runLen == 4) {
        // this byte is the RLE1 count: runByte repeats (count) more
        val extra = b & 0xff
        if (out.size() + extra > maxOut) bail("bzip2_bomb")
        var k = 0
        while (k < extra) { put(runByte.toByte); k += 1 }
        runLen = 0
        runByte = -1
      } else {
        if ((b & 0xff) == runByte) runLen += 1
        else { runByte = b & 0xff; runLen = 1 }
        put(b)
      }
    }
    if (runLen == 4) bail("truncated_rle_run") // count byte must exist
    crc = ~crc
    if (crc != wantCrc) bail("block_crc_mismatch")
    crc
  }
}
