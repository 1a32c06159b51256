package graft.operators

/** LZ4 Frame format decoder, from scratch — the data-lake payload
  * coding beside zstd/snappy (the public lz4_Frame_format.md +
  * lz4_Block_format.md grammar; interop pinned against the
  * on-classpath reference codec lz4-java by Lz4SnappySpec and the
  * tools/fuzz_lz4_snappy_diff.py sweep — the zstd-jni pattern, zero
  * ctypes).
  *
  * Frame: magic 0x184D2204 LE; FLG (version 01, block-independence,
  * block-checksum, content-size, content-checksum, dict-id flags;
  * reserved bits must be 0); BD (block max size 64 KB..4 MB, reserved
  * bits 0); optional 8-byte content size; header checksum byte =
  * (xxh32(descriptor) >> 8) & 0xFF. Then data blocks — 4-byte LE
  * length with bit 31 flagging a STORED (uncompressed) block, each
  * optionally followed by its xxh32 — until the 0-length EndMark,
  * then the optional content xxh32. Skippable frames
  * (0x184D2A50..5F) skip; frames may concatenate. Dictionary frames
  * reject by NAME (the id is out-of-band pairing this engine has no
  * source for).
  *
  * Block: the LZ4 sequence grammar — token (4-bit literal length +
  * 4-bit match length, 15 = extend by 255-bytes), literals, 2-byte LE
  * offset (0 is malformed), match length + 4, overlap-correct copy.
  * Linked (non-independent) blocks may reach into PRIOR blocks'
  * output; independent blocks are confined to their own.
  *
  * Reject-don't-guess with named reasons; the output cap is enforced
  * before allocation. Per-row byte work downstream, no shuffle.
  */
object Lz4 {

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // ---- xxHash32 (public algorithm; xxh64's 32-bit sibling) ----
  private val P1 = 0x9E3779B1
  private val P2 = 0x85EBCA77
  private val P3 = 0xC2B2AE3D
  private val P4 = 0x27D4EB2F
  private val P5 = 0x165667B1

  private[operators] def xxh32(b: Array[Byte], off: Int, len: Int,
      seed: Int): Int = {
    def u32(i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    var i = off
    val end = off + len
    var h: Int = 0
    if (len >= 16) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = end - 16
      while (i <= limit) {
        v1 = Integer.rotateLeft(v1 + u32(i) * P2, 13) * P1
        v2 = Integer.rotateLeft(v2 + u32(i + 4) * P2, 13) * P1
        v3 = Integer.rotateLeft(v3 + u32(i + 8) * P2, 13) * P1
        v4 = Integer.rotateLeft(v4 + u32(i + 12) * P2, 13) * P1
        i += 16
      }
      h = Integer.rotateLeft(v1, 1) + Integer.rotateLeft(v2, 7) +
        Integer.rotateLeft(v3, 12) + Integer.rotateLeft(v4, 18)
    } else h = seed + P5
    h += len
    while (i + 4 <= end) {
      h = Integer.rotateLeft(h + u32(i) * P3, 17) * P4
      i += 4
    }
    while (i < end) {
      h = Integer.rotateLeft(h + (b(i) & 0xff) * P5, 11) * P1
      i += 1
    }
    h ^= h >>> 15
    h *= P2
    h ^= h >>> 13
    h *= P3
    h ^= h >>> 16
    h
  }

  private val Magic = 0x184D2204
  private val SkippableBase = 0x184D2A50

  /** Decode a (possibly multi-frame) LZ4 Frame blob. */
  def decode(blob: Array[Byte], maxOut: Int = 1 << 26): Either[Rejected, Array[Byte]] =
    try {
      def u32(i: Int): Int = {
        if (i + 4 > blob.length) bail("truncated_lz4")
        (blob(i) & 0xff) | ((blob(i + 1) & 0xff) << 8) |
          ((blob(i + 2) & 0xff) << 16) | ((blob(i + 3) & 0xff) << 24)
      }
      val out = new java.io.ByteArrayOutputStream()
      var outBuf = new Array[Byte](64 * 1024)
      var outN = 0
      def ensure(extra: Int): Unit = {
        if (outN + extra > maxOut) bail("lz4_bomb")
        if (outN + extra > outBuf.length) {
          var cap = outBuf.length
          while (cap < outN + extra) cap <<= 1
          outBuf = java.util.Arrays.copyOf(outBuf, math.min(cap, maxOut))
        }
      }
      var i = 0
      if (blob.length < 4) bail("truncated_lz4")
      while (i < blob.length) {
        val magic = u32(i); i += 4
        if ((magic & 0xfffffff0) == SkippableBase) {
          val n = u32(i); i += 4
          if (n < 0 || i + n > blob.length) bail("truncated_lz4")
          i += n
        } else if (magic == Magic) {
          val flg = { if (i >= blob.length) bail("truncated_lz4"); blob(i) & 0xff }
          val bd = { if (i + 1 >= blob.length) bail("truncated_lz4"); blob(i + 1) & 0xff }
          if ((flg >> 6) != 1) bail("bad_version")
          if ((flg & 0x02) != 0) bail("reserved_flg_bits")
          val blockIndep = (flg & 0x20) != 0
          val blockChecksum = (flg & 0x10) != 0
          val hasContentSize = (flg & 0x08) != 0
          val hasContentChecksum = (flg & 0x04) != 0
          val hasDictId = (flg & 0x01) != 0
          if ((bd & 0x8f) != 0) bail("reserved_bd_bits")
          val bmsCode = (bd >> 4) & 7
          if (bmsCode < 4 || bmsCode > 7) bail("bad_block_max_size")
          val blockMax = 1 << (8 + 2 * bmsCode) // 4->64KB .. 7->4MB
          var descLen = 2
          var contentSize = -1L
          if (hasContentSize) {
            if (i + 2 + 8 > blob.length) bail("truncated_lz4")
            var v = 0L
            var k = 0
            while (k < 8) { v |= (blob(i + 2 + k) & 0xffL) << (8 * k); k += 1 }
            contentSize = v
            descLen += 8
          }
          if (hasDictId) bail("dictionary_frame")
          if (i + descLen >= blob.length) bail("truncated_lz4")
          val hc = blob(i + descLen) & 0xff
          if (((xxh32(blob, i, descLen, 0) >> 8) & 0xff) != hc)
            bail("header_checksum_mismatch")
          i += descLen + 1
          val frameStart = outN
          var endMark = false
          while (!endMark) {
            val raw = u32(i); i += 4
            if (raw == 0) endMark = true
            else {
              val stored = (raw & 0x80000000) != 0
              val bsize = raw & 0x7fffffff
              if (bsize > blockMax) bail("block_too_large")
              if (i + bsize > blob.length) bail("truncated_lz4")
              if (stored) {
                ensure(bsize)
                System.arraycopy(blob, i, outBuf, outN, bsize)
                outN += bsize
              } else {
                val windowStart = if (blockIndep) outN else frameStart
                val preN = outN
                outN = decodeBlock(blob, i, bsize, windowStart,
                  ensure _, () => outN, n => outN = n, () => outBuf)
                // frame spec: a block's UNCOMPRESSED size is bounded by
                // the descriptor's block maximum
                if (outN - preN > blockMax) bail("block_too_large")
              }
              if (blockChecksum) {
                val want = u32(i + bsize)
                if (xxh32(blob, i, bsize, 0) != want)
                  bail("block_checksum_mismatch")
                i += 4
              }
              i += bsize
            }
          }
          if (contentSize >= 0 && (outN - frameStart).toLong != contentSize)
            bail("content_size_mismatch")
          if (hasContentChecksum) {
            val want = u32(i); i += 4
            if (xxh32(outBuf, frameStart, outN - frameStart, 0) != want)
              bail("content_checksum_mismatch")
          }
        } else bail("bad_magic")
      }
      out.write(outBuf, 0, outN)
      Right(out.toByteArray)
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  /** One RAW LZ4 block outside the frame format — the shape ORC's
    * compressed-stream chunks carry. Fresh window per block. */
  private[operators] def rawDecode(src: Array[Byte], off: Int, len: Int,
      maxOut: Int): Either[String, Array[Byte]] =
    try {
      var outBuf = new Array[Byte](math.max(64, math.min(maxOut, 64 * 1024)))
      var outN = 0
      def ensure(extra: Int): Unit = {
        if (outN + extra > maxOut) bail("lz4_bomb")
        if (outN + extra > outBuf.length) {
          var cap = outBuf.length
          while (cap < outN + extra) cap <<= 1
          outBuf = java.util.Arrays.copyOf(outBuf, math.min(cap, maxOut))
        }
      }
      outN = decodeBlock(src, off, len, 0, ensure _,
        () => outN, n => outN = n, () => outBuf)
      Right(java.util.Arrays.copyOf(outBuf, outN))
    } catch { case e: Bail => Left(e.reason) }

  /** One compressed block of the LZ4 sequence grammar; returns the new
    * output length. Matches may reach back to `windowStart` (the frame
    * start for linked blocks, the block start for independent ones). */
  private def decodeBlock(src: Array[Byte], soff: Int, slen: Int,
      windowStart: Int, ensure: Int => Unit,
      getN: () => Int, setN: Int => Unit,
      getBuf: () => Array[Byte]): Int = {
    var i = soff
    val end = soff + slen
    var done = false
    while (!done) {
      if (i >= end) bail("truncated_block")
      val token = src(i) & 0xff; i += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var b = 255
        while (b == 255) {
          if (i >= end) bail("truncated_block")
          b = src(i) & 0xff; i += 1
          litLen += b
          if (litLen < 0) bail("bad_literal_length")
        }
      }
      if (i + litLen > end) bail("truncated_block")
      ensure(litLen)
      System.arraycopy(src, i, getBuf(), getN(), litLen)
      setN(getN() + litLen)
      i += litLen
      if (i == end) done = true // last sequence: literals only
      else {
        if (i + 2 > end) bail("truncated_block")
        val offset = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8)
        i += 2
        if (offset == 0) bail("bad_offset")
        var matchLen = (token & 0xf) + 4
        if ((token & 0xf) == 15) {
          var b = 255
          while (b == 255) {
            if (i >= end) bail("truncated_block")
            b = src(i) & 0xff; i += 1
            matchLen += b
            if (matchLen < 0) bail("bad_match_length")
          }
        }
        val n0 = getN()
        if (n0 - offset < windowStart) bail("offset_out_of_window")
        ensure(matchLen)
        val buf = getBuf()
        var n = n0
        var k = 0
        while (k < matchLen) { buf(n) = buf(n - offset); n += 1; k += 1 }
        setN(n)
      }
    }
    getN()
  }
}
