package graft.operators

/** MPEG audio (MP3) frame-header walk — container metadata without
  * audio decode: frame count, sample rate, channel mode, exact duration,
  * and the bitrate envelope (CBR vs VBR), from headers alone.
  *
  * A web crawl's audio column is mostly MP3; the expensive question
  * ("is this 3 seconds or 3 hours, mono or stereo, 32 or 320 kbps")
  * is answered by the 4-byte frame headers without touching the
  * Huffman-coded payload — the same cheap-metadata-first discipline as
  * the EXIF walk for JPEG (`operators/Exif.scala`). Grammar from the
  * public MPEG-1/2 audio spec (ISO/IEC 11172-3 / 13818-3 header layout)
  * and the de-facto ID3 container conventions:
  *
  *  - optional ID3v2 prefix: "ID3" + version(2) + flags(1) +
  *    syncsafe 28-bit size(4) of the tag body (header's 10 bytes not
  *    included) — skipped, size reported;
  *  - frames: 11-bit sync (all ones), version (2b: 3=MPEG1, 2=MPEG2,
  *    0=MPEG2.5, 1=reserved), layer (2b: 1=Layer III, 2=II, 3=I,
  *    0=reserved), protection (1b, 1 = no CRC16), bitrate index (4b,
  *    0=free and 15=bad both rejected), sample-rate index (2b,
  *    3=reserved), padding (1b), private (1b), channel mode (2b,
  *    3=mono), then mode-ext/copyright/original/emphasis;
  *  - Layer III frame length = 144 * bitrate / sampleRate + padding
  *    bytes (MPEG1) or 72 * bitrate / sampleRate + padding (MPEG2/2.5,
  *    whose Layer III frames carry 576 samples, not 1152);
  *  - optional trailing ID3v1 block: exactly 128 bytes starting "TAG".
  *
  * Reject-don't-guess (the `operators/Warc.scala` contract): any
  * malformed header, reserved field value, frame overrunning the
  * buffer, or unrecognized trailing bytes quarantines the whole record
  * (None) rather than guessing a resync point — a crawl pipeline wants
  * corrupt media in a quarantine column, not silently truncated stats.
  * Per-record decode, embarrassingly parallel over a DataFrame of blobs;
  * no state, no driver involvement.
  */
object Mp3 {

  /** kbps by bitrate index, Layer III. Index 0 (free) and 15 (bad) are
    * rejected before lookup. */
  private val BitrateMpeg1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateMpeg2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SampleRateMpeg1 = Array(44100, 48000, 32000)
  private val SampleRateMpeg2 = Array(22050, 24000, 16000)
  private val SampleRateMpeg25 = Array(11025, 12000, 8000)

  final case class Info(
      nFrames: Long,
      sampleRate: Int,
      channels: Int,
      durationMs: Long,
      brMinKbps: Int,
      brMaxKbps: Int,
      isVbr: Boolean,
      id3v2Bytes: Long,
      totalBytes: Long)

  /** Build one Layer III frame header + deterministic dummy payload —
    * fixture/encoder twin of [[info]], used by specs and the oracle
    * query so the walk is replayed against constructed ground truth.
    * `version` is the header field value (3=MPEG1, 2=MPEG2). */
  def frame(
      version: Int, bitrateIdx: Int, srIdx: Int, padding: Int,
      channelMode: Int, seed: Long): Array[Byte] = {
    require(version == 3 || version == 2, s"unsupported version $version")
    val kbps = (if (version == 3) BitrateMpeg1 else BitrateMpeg2)(bitrateIdx)
    val sr = (if (version == 3) SampleRateMpeg1 else SampleRateMpeg2)(srIdx)
    val len = (if (version == 3) 144000 else 72000) * kbps / sr + padding
    val b = new Array[Byte](len)
    b(0) = 0xFF.toByte
    // 3 sync bits + version(2) + layer(01 = III) + protection(1 = none)
    b(1) = (0xE0 | (version << 3) | (1 << 1) | 1).toByte
    b(2) = ((bitrateIdx << 4) | (srIdx << 2) | (padding << 1)).toByte
    b(3) = (channelMode << 6).toByte
    var i = 4
    while (i < len) { b(i) = ((seed * 31 + i * 7) % 251).toByte; i += 1 }
    b
  }

  /** An ID3v2 header + zeroed tag body of `bodySize` bytes. */
  def id3v2(bodySize: Int): Array[Byte] = {
    require(bodySize >= 0 && bodySize < (1 << 28), s"bad ID3v2 size $bodySize")
    val b = new Array[Byte](10 + bodySize)
    b(0) = 'I'; b(1) = 'D'; b(2) = '3'; b(3) = 4; b(4) = 0; b(5) = 0
    b(6) = ((bodySize >> 21) & 0x7F).toByte
    b(7) = ((bodySize >> 14) & 0x7F).toByte
    b(8) = ((bodySize >> 7) & 0x7F).toByte
    b(9) = (bodySize & 0x7F).toByte
    b
  }

  /** A 128-byte ID3v1 trailer. */
  def id3v1: Array[Byte] = {
    val b = new Array[Byte](128)
    b(0) = 'T'; b(1) = 'A'; b(2) = 'G'
    b
  }

  /** Walk the stream; None quarantines the record. */
  def info(bytes: Array[Byte]): Option[Info] = {
    if (bytes == null || bytes.length < 4) return None
    var pos = 0
    var id3Bytes = 0L
    // ID3v2 prefix
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if ((bytes(5) & 0x10) != 0) return None // footer flag unsupported
      if (((bytes(6) | bytes(7) | bytes(8) | bytes(9)) & 0x80) != 0) return None
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      id3Bytes = 10L + size
      if (id3Bytes > bytes.length) return None
      pos = id3Bytes.toInt
    }

    var nFrames = 0L
    var sampleRate = -1
    var channels = -1
    var samplesTimes1000 = 0L // sum over frames of spf * 1000 (per-frame sr constant-checked)
    var brMin = Int.MaxValue
    var brMax = Int.MinValue

    while (pos < bytes.length) {
      val rem = bytes.length - pos
      if (rem == 128 && bytes(pos) == 'T' && bytes(pos + 1) == 'A' &&
          bytes(pos + 2) == 'G') {
        pos += 128 // ID3v1 trailer ends the stream
      } else {
        if (rem < 4) return None
        val b0 = bytes(pos) & 0xFF
        val b1 = bytes(pos + 1) & 0xFF
        val b2 = bytes(pos + 2) & 0xFF
        val b3 = bytes(pos + 3) & 0xFF
        if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return None
        val version = (b1 >> 3) & 3
        val layer = (b1 >> 1) & 3
        if (version == 1 || layer != 1) return None // reserved / not Layer III
        val brIdx = (b2 >> 4) & 0xF
        val srIdx = (b2 >> 2) & 3
        val padding = (b2 >> 1) & 1
        if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
        val kbps =
          (if (version == 3) BitrateMpeg1 else BitrateMpeg2)(brIdx)
        val sr = version match {
          case 3 => SampleRateMpeg1(srIdx)
          case 2 => SampleRateMpeg2(srIdx)
          case _ => SampleRateMpeg25(srIdx)
        }
        val mode = (b3 >> 6) & 3
        val ch = if (mode == 3) 1 else 2
        if (sampleRate == -1) { sampleRate = sr; channels = ch }
        // a mid-stream sample-rate or channel switch is a splice, not a
        // VBR stream — quarantine rather than average incompatible frames
        else if (sr != sampleRate || ch != channels) return None
        val spf = if (version == 3) 1152 else 576
        val len = (if (version == 3) 144000 else 72000) * kbps / sr + padding
        if (len < 4 || pos + len > bytes.length) return None
        nFrames += 1
        samplesTimes1000 += spf * 1000L
        if (kbps < brMin) brMin = kbps
        if (kbps > brMax) brMax = kbps
        pos += len
      }
    }
    if (nFrames == 0) None
    else Some(Info(nFrames, sampleRate, channels,
      samplesTimes1000 / sampleRate, brMin, brMax, brMin != brMax,
      id3Bytes, bytes.length.toLong))
  }
}
