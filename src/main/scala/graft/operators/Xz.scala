package graft.operators

/** `.xz` container decoder over the from-scratch [[Lzma2]] layer —
  * closes the `.tar.xz` seam beside `.tar.gz`/`.tar.bz2`. Grammar per
  * the public xz file-format specification:
  *
  *   stream  = header magic (FD'7zXZ'00) + stream flags (check type:
  *             none/CRC32/CRC64/SHA-256) + CRC32(flags)
  *   block   = header (size byte, filter flags, optional VLI
  *             compressed/uncompressed sizes, filter list, zero
  *             padding, CRC32) + LZMA2 data + zero padding to 4 +
  *             check over the UNCOMPRESSED data
  *   index   = 0x00 indicator + record count + (unpadded size,
  *             uncompressed size) VLI pairs + padding + CRC32 —
  *             verified against the blocks actually walked
  *   footer  = CRC32(backward size + flags) + backward size
  *             (= index size) + the SAME stream flags + 'YZ'
  *
  * Streams may concatenate with 4-aligned zero stream padding. The
  * LZMA2 filter (0x21) decodes, as does a single pre-filter ahead of
  * it (see [[Bcj]]): the x86/ARM/ARM-Thumb/PowerPC/SPARC/ARM64/RISC-V
  * branch converters, IA64's bundle-slot
  * converter, and delta — EVERY chain `xz -F <filter>` produces.
  * RISC-V, the last member, was extracted black-box from liblzma
  * (no xz source on this system) and is pinned by the same
  * differential sweep as the rest. CRC64 is the
  * ECMA-182 reflected polynomial, implemented here; CRC32 is the
  * JDK's; SHA-256 is MessageDigest. Reject-don't-guess with named
  * reasons; the output cap rides [[Lzma2]]'s in-decode enforcement.
  */
object Xz {

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // CRC64-ECMA (reflected), the xz check id 0x04
  private val Crc64Table: Array[Long] = {
    val poly = 0xC96C5795D7870F42L
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) {
      var c = i.toLong
      var k = 0
      while (k < 8) {
        c = if ((c & 1L) != 0) (c >>> 1) ^ poly else c >>> 1
        k += 1
      }
      t(i) = c
      i += 1
    }
    t
  }

  private[operators] def crc64(b: Array[Byte], off: Int, len: Int): Long = {
    var c = -1L
    var i = off
    while (i < off + len) {
      c = (c >>> 8) ^ Crc64Table(((c ^ b(i)) & 0xff).toInt)
      i += 1
    }
    ~c
  }

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  private val HeaderMagic =
    Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0)

  /** Decode a (possibly multi-stream) .xz blob. */
  def decode(blob: Array[Byte], maxOut: Int = 1 << 26): Either[Rejected, Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      if (blob.length < 32) bail("truncated_xz")
      var sawStream = false
      while (i < blob.length) {
        // stream padding between streams: 4-aligned zero bytes
        if (sawStream && blob(i) == 0) {
          val start = i
          while (i < blob.length && blob(i) == 0) i += 1
          if ((i - start) % 4 != 0) bail("bad_stream_padding")
          if (i >= blob.length) return Right(out.toByteArray)
        }
        i = decodeStream(blob, i, out, maxOut)
        sawStream = true
      }
      Right(out.toByteArray)
    } catch {
      case e: Bail => Left(Rejected(e.reason))
      case _: ArrayIndexOutOfBoundsException => Left(Rejected("truncated_xz"))
    }

  private def u32le(b: Array[Byte], p: Int): Long = {
    if (p + 4 > b.length) bail("truncated_xz")
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  }

  /** One stream starting at `start`; returns the offset past its
    * footer. */
  private def decodeStream(b: Array[Byte], start: Int,
      out: java.io.ByteArrayOutputStream, maxOut: Int): Int = {
    var i = start
    if (i + 12 > b.length) bail("truncated_xz")
    var k = 0
    while (k < 6) {
      if (b(i + k) != HeaderMagic(k)) bail("bad_magic")
      k += 1
    }
    i += 6
    if (b(i) != 0) bail("reserved_stream_flags")
    val check = b(i + 1) & 0xff
    if (check != 0x00 && check != 0x01 && check != 0x04 && check != 0x0A)
      bail(f"check_unsupported_0x$check%02x")
    if (crc32(b, i, 2) != u32le(b, i + 2)) bail("header_crc_mismatch")
    val flagsAt = i
    i += 6

    def vli(): Long = {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        if (i >= b.length) bail("truncated_xz")
        val x = b(i) & 0xff; i += 1
        if (shift == 63 && (x & 0xFE) != 0) bail("bad_vli")
        v |= (x & 0x7fL) << shift
        shift += 7
        more = (x & 0x80) != 0
        if (more && shift >= 63) bail("bad_vli")
      }
      v
    }

    // blocks until the index indicator
    val records = Seq.newBuilder[(Long, Long)] // (unpadded, uncompressed)
    var indexAt = -1
    while (indexAt < 0) {
      if (i >= b.length) bail("truncated_xz")
      val first = b(i) & 0xff
      if (first == 0) indexAt = i
      else {
        val blockStart = i
        val headerSize = (first + 1) * 4
        if (i + headerSize > b.length) bail("truncated_xz")
        if (crc32(b, i, headerSize - 4) != u32le(b, i + headerSize - 4))
          bail("block_header_crc_mismatch")
        val flags = b(i + 1) & 0xff
        if ((flags & 0x3C) != 0) bail("reserved_block_flags")
        val nFilters = (flags & 3) + 1
        val hasCompSize = (flags & 0x40) != 0
        val hasUncompSize = (flags & 0x80) != 0
        val headerEnd = i + headerSize - 4
        i += 2
        val declaredComp = if (hasCompSize) vli() else -1L
        val declaredUncomp = if (hasUncompSize) vli() else -1L
        // filter list, in ENCODE order: LZMA2 must be last; ONE
        // pre-filter ahead of it decodes — the x86/ARM/ARM-Thumb/PPC/
        // SPARC/ARM64/IA64/RISC-V converters and delta (the chains
        // real `xz -F <filter>` archives carry, each differentially
        // pinned in XzSpec + the liblzma sweep; RISC-V's semantics
        // were extracted black-box from liblzma — Bcj.riscvDecode)
        val bcjAlignment = Map(0x04L -> 1, 0x05L -> 4, 0x06L -> 16,
          0x07L -> 4, 0x08L -> 2, 0x09L -> 4, 0x0AL -> 4, 0x0BL -> 2)
        var lzma2Props = -1
        var preFilter = -1L
        var preStart = 0L
        var deltaDist = 0
        var f = 0
        while (f < nFilters) {
          val id = vli()
          val propsSize = vli()
          if (i + propsSize > headerEnd) bail("bad_block_header")
          if (id == 0x21) {
            if (f != nFilters - 1) bail("lzma2_not_last_filter")
            if (propsSize != 1) bail("bad_lzma2_props")
            lzma2Props = b(i) & 0xff
            if ((lzma2Props & 0xC0) != 0 || (lzma2Props & 0x3F) > 40)
              bail("bad_lzma2_dictsize")
          } else if (bcjAlignment.contains(id)) {
            if (f != 0 || preFilter >= 0) bail("bad_filter_chain")
            // optional 4-byte LE start offset, alignment-validated
            if (propsSize != 0 && propsSize != 4) bail("bad_bcj_props")
            if (propsSize == 4) {
              preStart = u32le(b, i)
              if (preStart % bcjAlignment(id) != 0) bail("bad_bcj_props")
            }
            preFilter = id
          } else if (id == 0x03) { // delta
            if (f != 0 || preFilter >= 0) bail("bad_filter_chain")
            if (propsSize != 1) bail("bad_delta_props")
            deltaDist = (b(i) & 0xff) + 1
            preFilter = id
          } else {
            bail(f"filter_unsupported_0x$id%02x")
          }
          i += propsSize.toInt
          f += 1
        }
        if (lzma2Props < 0) bail("missing_lzma2_filter")
        // header padding must be zeros
        while (i < headerEnd) {
          if (b(i) != 0) bail("bad_header_padding")
          i += 1
        }
        i = headerEnd + 4 // past CRC
        // LZMA2 data: find its end by decoding; the declared compressed
        // size (when present) bounds it, else scan to the index is not
        // possible — xz REQUIRES neither, so decode tracks consumption
        val dataStart = i
        val maxData =
          if (declaredComp >= 0) {
            if (dataStart + declaredComp > b.length) bail("truncated_xz")
            declaredComp.toInt
          } else b.length - dataStart
        val before = out.size()
        val budget = (maxOut - before).toInt
        val (content, consumed) =
          decodeLzma2Tracked(b, dataStart, maxData, budget)
        if (declaredComp >= 0 && consumed != declaredComp)
          bail("compressed_size_mismatch")
        // decode filters reverse in anti-encode order: LZMA2 already
        // ran; the pre-filter restores the original bytes the block
        // check and sizes are defined over
        preFilter match {
          case 0x03 => Bcj.deltaDecode(content, deltaDist)
          case 0x04 => Bcj.x86Decode(content, preStart)
          case 0x05 => Bcj.ppcDecode(content, preStart)
          case 0x06 => Bcj.ia64Decode(content, preStart)
          case 0x07 => Bcj.armDecode(content, preStart)
          case 0x08 => Bcj.armThumbDecode(content, preStart)
          case 0x09 => Bcj.sparcDecode(content, preStart)
          case 0x0A => Bcj.arm64Decode(content, preStart)
          case 0x0B => Bcj.riscvDecode(content, preStart)
          case _ => ()
        }
        if (declaredUncomp >= 0 && content.length.toLong != declaredUncomp)
          bail("uncompressed_size_mismatch")
        out.write(content)
        i = dataStart + consumed
        // block padding to 4-byte alignment (zeros)
        while ((i - blockStart) % 4 != 0) {
          if (i >= b.length) bail("truncated_xz")
          if (b(i) != 0) bail("bad_block_padding")
          i += 1
        }
        // check over the uncompressed data
        val checkSize = check match {
          case 0x00 => 0; case 0x01 => 4; case 0x04 => 8; case _ => 32
        }
        if (i + checkSize > b.length) bail("truncated_xz")
        check match {
          case 0x01 =>
            if (crc32(content, 0, content.length) != u32le(b, i))
              bail("block_check_mismatch")
          case 0x04 =>
            var want = 0L
            var k2 = 0
            while (k2 < 8) { want |= (b(i + k2) & 0xffL) << (8 * k2); k2 += 1 }
            if (crc64(content, 0, content.length) != want)
              bail("block_check_mismatch")
          case 0x0A =>
            val got = java.security.MessageDigest.getInstance("SHA-256")
              .digest(content)
            var k2 = 0
            var same = true
            while (k2 < 32) { if (got(k2) != b(i + k2)) same = false; k2 += 1 }
            if (!same) bail("block_check_mismatch")
          case _ => ()
        }
        i += checkSize
        // unpadded size = header + actual compressed + check (spec:
        // block padding excluded)
        records += (((headerSize + consumed + checkSize).toLong,
          content.length.toLong))
      }
    }
    // index
    val indexStart = i
    i += 1 // indicator
    val nRecords = vli()
    if (nRecords != records.result().length)
      bail("index_record_count_mismatch")
    records.result().foreach { case (unpadded, uncomp) =>
      val iu = vli()
      val ic = vli()
      if (iu != unpadded) bail("index_unpadded_size_mismatch")
      if (ic != uncomp) bail("index_uncompressed_size_mismatch")
    }
    while ((i - indexStart) % 4 != 0) {
      if (i >= b.length) bail("truncated_xz")
      if (b(i) != 0) bail("bad_index_padding")
      i += 1
    }
    if (crc32(b, indexStart, i - indexStart) != u32le(b, i))
      bail("index_crc_mismatch")
    i += 4
    val indexSize = (i - indexStart).toLong
    // footer: CRC32(backward+flags), backward size, flags, 'YZ'
    if (i + 12 > b.length) bail("truncated_xz")
    if (crc32(b, i + 4, 6) != u32le(b, i)) bail("footer_crc_mismatch")
    val backward = (u32le(b, i + 4) + 1) * 4
    if (backward != indexSize) bail("backward_size_mismatch")
    if (b(i + 8) != b(flagsAt) || b(i + 9) != b(flagsAt + 1))
      bail("footer_flags_mismatch")
    if (b(i + 10) != 'Y' || b(i + 11) != 'Z') bail("bad_footer_magic")
    i + 12
  }

  /** Decode LZMA2 chunks tracking exact input consumption. */
  private def decodeLzma2Tracked(b: Array[Byte], off: Int, maxLen: Int,
      maxOut: Int): (Array[Byte], Int) = {
    // walk the chunk headers to find the end-of-stream marker, then
    // hand the exact range to Lzma2.decode
    var i = off
    val end = off + maxLen
    var done = false
    while (!done) {
      if (i >= end) bail("truncated_lzma2")
      val control = b(i) & 0xff
      if (control == 0x00) { i += 1; done = true }
      else if (control == 0x01 || control == 0x02) {
        if (i + 3 > end) bail("truncated_lzma2")
        val size = (((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)) + 1
        i += 3 + size
        if (i > end) bail("truncated_lzma2")
      } else if ((control & 0x80) != 0) {
        val resetCode = (control >> 5) & 3
        val hdr = if (resetCode >= 2) 6 else 5
        if (i + hdr > end) bail("truncated_lzma2")
        val packed = (((b(i + 3) & 0xff) << 8) | (b(i + 4) & 0xff)) + 1
        i += hdr + packed
        if (i > end) bail("truncated_lzma2")
      } else bail("bad_lzma2_control")
    }
    val consumed = i - off
    Lzma2.decode(b, off, consumed, maxOut) match {
      case Right(content) => (content, consumed)
      case Left(reason) => bail(reason)
    }
  }
}
