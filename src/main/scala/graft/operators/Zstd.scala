package graft.operators

/** Zstandard frame format (RFC 8878) — the container modern corpora and
  * CDC pipelines ship in (Common Crawl index shards, .jsonl.zst dumps).
  * Two layers live here:
  *
  *  - the FRAME/BLOCK WALK: magic, frame-header descriptor
  *    (content-size/single-segment/checksum/dictionary-id flags), window
  *    descriptor, dictionary id, frame content size, the 3-byte block
  *    headers (last/type/size), skippable frames (0x184D2A5x), and the
  *    XXH64-low32 content checksum — the cheap metadata-first pass run
  *    before deciding what to decompress (the q209/q212 pattern);
  *  - STORED-MODE DECODE: Raw and RLE blocks reconstruct content
  *    exactly (both are fully specified without the entropy layer), and
  *    the checksum VERIFIES via a from-scratch XXH64. Compressed blocks
  *    (the FSE/Huffman entropy layer) reject by name — the disclosed
  *    seam, same honesty contract as every codec here.
  *
  * Reject-don't-guess: bad magic, reserved block type, truncated
  * headers/payloads, content-size or checksum mismatches, and
  * dictionary-referencing frames (undecodable without the dictionary)
  * all quarantine with named reasons.
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

  // ---- frame walk + stored-mode decode ----

  /** Per-frame census row. */
  final case class FrameInfo(
      skippable: Boolean,
      singleSegment: Boolean,
      hasChecksum: Boolean,
      contentSize: Long, // -1 when the header omits it
      windowLog: Int, // -1 for single-segment / skippable
      nBlocks: Int, nRaw: Int, nRle: Int,
      content: Array[Byte]) // empty for skippable frames

  private val Magic = 0xFD2FB528
  private val SkippableBase = 0x184D2A50

  /** Walk a (possibly multi-frame) zstd stream: per-frame metadata plus
    * the reconstructed content of stored-mode frames. */
  def decode(b: Array[Byte]): Either[Rejected, Seq[FrameInfo]] =
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
          if (!singleSegment) {
            if (i >= b.length) bail("truncated_header")
            val wd = b(i) & 0xff; i += 1
            windowLog = 10 + (wd >> 3) // mantissa refines, exponent sizes
          }
          val didLen = didFlag match {
            case 0 => 0; case 1 => 1; case 2 => 2; case _ => 4
          }
          if (didLen > 0) {
            // frames needing an external dictionary are undecodable here
            bail("dictionary_frame")
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
          val content = new java.io.ByteArrayOutputStream()
          var last = false
          var nBlocks = 0; var nRaw = 0; var nRle = 0
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
                content.write(b, i, bsize)
                i += bsize
                nRaw += 1
              case 1 => // RLE: one byte repeated bsize times
                if (i >= b.length) bail("truncated_block")
                val v = b(i); i += 1
                var k = 0
                while (k < bsize) { content.write(v); k += 1 }
                nRle += 1
              case 2 => bail("compressed_block_unsupported")
              case _ => bail("reserved_block_type")
            }
            if (content.size() > (1 << 26)) bail("oversized")
          }
          val data = content.toByteArray
          if (contentSize >= 0 && data.length != contentSize)
            bail("content_size_mismatch")
          if (hasChecksum) {
            if (i + 4 > b.length) bail("truncated_checksum")
            val want = u32l(b, i); i += 4
            if ((xxh64(data) & 0xffffffffL) != want) bail("checksum_mismatch")
          }
          out += FrameInfo(skippable = false, singleSegment, hasChecksum,
            contentSize, windowLog, nBlocks, nRaw, nRle, data)
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
