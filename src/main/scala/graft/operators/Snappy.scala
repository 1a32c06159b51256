package graft.operators

/** Snappy framing-format decoder, from scratch — the other data-lake
  * payload coding beside LZ4/zstd (the public framing_format.txt +
  * format_description.txt grammar; interop pinned against the
  * on-classpath reference codec snappy-java by Lz4SnappySpec and the
  * tools/fuzz_lz4_snappy_diff.py sweep).
  *
  * Framing: the stream identifier chunk (0xFF, length 6, "sNaPpY")
  * must come first and may repeat (stream concatenation); then chunks
  * of 1-byte type + 3-byte LE length — 0x00 compressed (4-byte masked
  * CRC32C of the UNCOMPRESSED data + a raw snappy block whose
  * uncompressed size is capped at 65536 per the spec), 0x01
  * uncompressed (masked CRC32C + raw bytes, same cap), 0xFE padding,
  * 0x80..0xFD reserved-skippable (skipped), 0x02..0x7F
  * reserved-UNSKIPPABLE (reject by name, per spec). The CRC mask is
  * ((crc >>> 15) | (crc << 17)) + 0xA282EAD8 over CRC32C
  * (Castagnoli — the JDK ships it).
  *
  * Raw block: varint uncompressed length, then tagged elements — tag
  * low 2 bits: 00 literal (6-bit length, 60..63 switch to 1..4 extra
  * LE length bytes), 01 one-byte-offset copy (len 4..11, 11-bit
  * offset), 10 two-byte-LE-offset copy, 11 four-byte-LE-offset copy;
  * offset 0 or reaching before the block start is malformed; output
  * must land EXACTLY on the declared length.
  *
  * Reject-don't-guess with named reasons; output cap enforced before
  * allocation. Per-row byte work downstream, no shuffle.
  */
object Snappy {

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private def maskedCrc32c(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xA282EAD8
  }

  private val MaxChunkData = 65536 // spec: uncompressed chunk cap

  /** Decode a snappy FRAMED stream. */
  def decode(blob: Array[Byte], maxOut: Int = 1 << 26): Either[Rejected, Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      if (blob.length < 10) bail("truncated_snappy")
      var sawHeader = false
      while (i < blob.length) {
        if (i + 4 > blob.length) bail("truncated_snappy")
        val tpe = blob(i) & 0xff
        val len = (blob(i + 1) & 0xff) | ((blob(i + 2) & 0xff) << 8) |
          ((blob(i + 3) & 0xff) << 16)
        i += 4
        if (i + len > blob.length) bail("truncated_snappy")
        tpe match {
          case 0xFF => // stream identifier
            if (len != 6 || blob(i) != 's' || blob(i + 1) != 'N' ||
              blob(i + 2) != 'a' || blob(i + 3) != 'P' ||
              blob(i + 4) != 'p' || blob(i + 5) != 'Y')
              bail("bad_stream_identifier")
            sawHeader = true
          case 0x00 => // compressed data
            if (!sawHeader) bail("missing_stream_identifier")
            if (len < 4) bail("truncated_snappy")
            val want = (blob(i) & 0xff) | ((blob(i + 1) & 0xff) << 8) |
              ((blob(i + 2) & 0xff) << 16) | ((blob(i + 3) & 0xff) << 24)
            val data = rawDecode(blob, i + 4, len - 4, MaxChunkData)
            if (out.size() + data.length > maxOut) bail("snappy_bomb")
            if (maskedCrc32c(data, 0, data.length) != want)
              bail("crc_mismatch")
            out.write(data)
          case 0x01 => // uncompressed data
            if (!sawHeader) bail("missing_stream_identifier")
            if (len < 4) bail("truncated_snappy")
            val want = (blob(i) & 0xff) | ((blob(i + 1) & 0xff) << 8) |
              ((blob(i + 2) & 0xff) << 16) | ((blob(i + 3) & 0xff) << 24)
            val n = len - 4
            if (n > MaxChunkData) bail("chunk_too_large")
            if (out.size() + n > maxOut) bail("snappy_bomb")
            if (maskedCrc32c(blob, i + 4, n) != want) bail("crc_mismatch")
            out.write(blob, i + 4, n)
          case 0xFE => () // padding
          case t if t >= 0x80 && t <= 0xFD => () // reserved skippable
          case t => bail(f"unskippable_chunk_0x$t%02x")
        }
        i += len
      }
      if (!sawHeader) bail("missing_stream_identifier")
      Right(out.toByteArray)
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  /** [[rawDecode]] behind an Either — for callers outside the framed
    * path (ORC compressed-stream chunks) that must not see the
    * internal control-flow exception. */
  private[operators] def rawDecodeSafe(src: Array[Byte], off: Int,
      len: Int, maxLen: Int): Either[String, Array[Byte]] =
    try Right(rawDecode(src, off, len, maxLen))
    catch { case e: Bail => Left(e.reason) }

  /** Decode one RAW snappy block (the format_description.txt grammar),
    * strictly: declared length respected exactly, offsets validated. */
  private[operators] def rawDecode(src: Array[Byte], off: Int, len: Int,
      maxLen: Int): Array[Byte] = {
    var i = off
    val end = off + len
    // varint uncompressed length
    var expected = 0L
    var shift = 0
    var more = true
    while (more) {
      if (i >= end || shift > 28) bail("bad_varint")
      val b = src(i) & 0xff; i += 1
      expected |= (b & 0x7fL) << shift
      shift += 7
      more = (b & 0x80) != 0
    }
    if (expected > maxLen) bail("chunk_too_large")
    val out = new Array[Byte](expected.toInt)
    var n = 0
    while (i < end) {
      val tag = src(i) & 0xff; i += 1
      (tag & 3) match {
        case 0 => // literal
          var litLen = tag >>> 2
          if (litLen >= 60) {
            val extra = litLen - 59 // 1..4 length bytes, LE
            if (i + extra > end) bail("truncated_block")
            litLen = 0
            var k = 0
            while (k < extra) { litLen |= (src(i + k) & 0xff) << (8 * k); k += 1 }
            // reject BEFORE the +1: 0x7FFFFFFF would pass a <0 check and
            // then overflow to Int.MinValue, turning both bounds checks
            // below into always-true negative comparisons. A literal can
            // never exceed the declared output size (itself capped at
            // maxLen), so anything at or past that is hostile.
            if (litLen < 0 || litLen >= maxLen) bail("bad_literal_length")
            i += extra
          }
          litLen += 1
          if (i + litLen > end || n + litLen > out.length)
            bail("bad_literal_length")
          System.arraycopy(src, i, out, n, litLen)
          i += litLen; n += litLen
        case c => // copy
          var matchLen = 0
          var offset = 0
          if (c == 1) {
            if (i >= end) bail("truncated_block")
            matchLen = 4 + ((tag >>> 2) & 7)
            offset = ((tag >>> 5) << 8) | (src(i) & 0xff)
            i += 1
          } else if (c == 2) {
            if (i + 2 > end) bail("truncated_block")
            matchLen = 1 + (tag >>> 2)
            offset = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8)
            i += 2
          } else {
            if (i + 4 > end) bail("truncated_block")
            matchLen = 1 + (tag >>> 2)
            offset = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
              ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
            i += 4
          }
          if (offset <= 0 || offset > n) bail("bad_offset")
          if (n + matchLen > out.length) bail("bad_match_length")
          var k = 0
          while (k < matchLen) { out(n) = out(n - offset); n += 1; k += 1 }
      }
    }
    if (n != out.length) bail("length_mismatch")
    out
  }
}
