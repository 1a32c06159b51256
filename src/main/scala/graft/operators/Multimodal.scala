package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling next to typed metadata. The Spark-side
  * machinery — schema, partition-sized batching, per-partition decode calls,
  * feature schema — is real. Image HEADER parsing (format + dimensions from
  * PNG/JPEG/GIF magic bytes) is real too, pure-JVM ([[HeaderDecoder]]);
  * full pixel decode would need codecs this container doesn't ship and
  * stays behind [[StubDecoder]].
  *
  * Scale notes: payloads stay in executor space end-to-end (no collect);
  * decode runs once per row inside `mapPartitions` so per-partition
  * decoder initialization (the expensive part with a real codec) is
  * amortized; `spark.sql.files.maxPartitionBytes` bounds the bytes a task
  * holds.
  */
object Multimodal {

  /** One media row: payload + metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (what a real decoder would produce per frame/clip). */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      format: String,
      n_bytes: Int,
      checksum: String,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Decoder contract. A production deployment plugs a codec (JNI/FFI) in
    * here; the stub derives deterministic pseudo-features from the bytes so
    * the distributed plumbing is testable without codecs.
    */
  trait MediaDecoder extends Serializable {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) // (width, height, frames)
  }

  /** Deterministic fake: "dimensions" derived from payload length and first
    * bytes. Replace with a real decoder outside this container.
    */
  object StubDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val len = payload.length
      val b0 = if (len > 0) payload(0) & 0xff else 0
      (64 + (b0 % 64), 64 + (len % 64), if (kind == "video") 1 + (len % 30) else 1)
    }
  }

  // ---- real header parsing (no codec deps) ----

  private def be32(p: Array[Byte], i: Int): Int =
    ((p(i) & 0xff) << 24) | ((p(i + 1) & 0xff) << 16) | ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
  private def be16(p: Array[Byte], i: Int): Int = ((p(i) & 0xff) << 8) | (p(i + 1) & 0xff)
  private def le16(p: Array[Byte], i: Int): Int = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)

  /** Sniff the container format from magic bytes. */
  def detectFormat(p: Array[Byte]): String =
    if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      "png"
    else if (p.length >= 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) "jpeg"
    else if (p.length >= 10 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') "gif"
    else if (p.length >= 16 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == 'F' && p(8) == 'W' && p(9) == 'E' && p(10) == 'B' && p(11) == 'P')
      "webp"
    else "unknown"

  /** (width, height) from the image header:
    *  - PNG: IHDR is always the first chunk — big-endian u32 at offsets
    *    16/20 (PNG spec §11.2.2).
    *  - GIF: logical screen descriptor — little-endian u16 at offsets 6/8.
    *  - JPEG: walk the marker segments to the first SOFn (C0-CF minus
    *    C4/C8/CC); height/width are big-endian u16 at payload offsets 3/5.
    */
  def imageDims(p: Array[Byte]): Option[(Int, Int)] = detectFormat(p) match {
    case "png" if p.length >= 24 => Some((be32(p, 16), be32(p, 20)))
    case "gif" => Some((le16(p, 6), le16(p, 8)))
    case "jpeg" => jpegDims(p)
    case "webp" => webpDims(p)
    case _ => None
  }

  /** WebP dims per chunk kind: VP8L packs 14-bit w-1/h-1 after the 0x2f
    * signature; lossy VP8 carries them in the key-frame header past the
    * start code; VP8X holds a 24-bit canvas size minus one. */
  private def webpDims(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 30) return None
    val kind = new String(p, 12, 4, "US-ASCII")
    kind match {
      case "VP8L" =>
        if ((p(20) & 0xff) != 0x2f) None
        else {
          val bits = (p(21) & 0xff) | ((p(22) & 0xff) << 8) |
            ((p(23) & 0xff) << 16) | ((p(24) & 0xff).toLong << 24).toInt
          Some((1 + (bits & 0x3fff), 1 + ((bits >> 14) & 0x3fff)))
        }
      case "VP8 " =>
        // frame tag(3) then 9d 01 2a then 16-bit w/h with scale bits
        if ((p(23) & 0xff) != 0x9d || (p(24) & 0xff) != 0x01 ||
          (p(25) & 0xff) != 0x2a) None
        else Some((((p(26) & 0xff) | ((p(27) & 0xff) << 8)) & 0x3fff,
          ((p(28) & 0xff) | ((p(29) & 0xff) << 8)) & 0x3fff))
      case "VP8X" =>
        def u24(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
          ((p(o + 2) & 0xff) << 16)
        Some((1 + u24(24), 1 + u24(27)))
      case _ => None
    }
  }

  private def jpegDims(p: Array[Byte]): Option[(Int, Int)] = {
    var i = 2 // past SOI
    // the SOF read touches indices i..i+8, so i+9 <= length suffices — a
    // strict < would reject a header ending exactly at the width bytes
    while (i + 9 <= p.length) {
      if ((p(i) & 0xff) != 0xff) return None
      val marker = p(i + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2 // standalone
      else {
        if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some((be16(p, i + 7), be16(p, i + 5)))
        i += 2 + be16(p, i + 2)
      }
    }
    None
  }

  /** The real header decoder: parsed dimensions, 1 frame for stills,
    * (0, 0, 0) for payloads without a recognized image header.
    */
  object HeaderDecoder extends MediaDecoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
      imageDims(payload) match {
        case Some((w, h)) => (w, h, 1)
        case None => (0, 0, 0)
      }
  }

  // ---- deterministic header builders (test fixtures / oracle parity) ----

  private def be32bytes(v: Int) =
    Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be16bytes(v: Int) = Array[Byte]((v >> 8).toByte, v.toByte)
  private def le16bytes(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  /** Minimal valid PNG header (29 bytes): signature + IHDR. */
  def pngHeader(w: Int, h: Int): Array[Byte] =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R') ++
      be32bytes(w) ++ be32bytes(h) ++ Array[Byte](8, 2, 0, 0, 0)

  /** Minimal JPEG header (39 bytes): SOI + JFIF APP0 + SOF0. */
  def jpegHeader(w: Int, h: Int): Array[Byte] =
    Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0x00, 0x10, 'J', 'F', 'I', 'F', 0x00,
      0x01, 0x02, 0x00, 0x00, 0x48, 0x00, 0x48, 0x00, 0x00,
      0xff.toByte, 0xc0.toByte, 0x00, 0x11, 0x08) ++
      be16bytes(h) ++ be16bytes(w) ++
      Array[Byte](0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)

  /** Minimal GIF89a header (13 bytes): signature + logical screen. */
  def gifHeader(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes ++ le16bytes(w) ++ le16bytes(h) ++ Array[Byte](0x00, 0x00, 0x00)

  /** Per-partition feature extraction. The decoder is constructed once per
    * partition (closure-captured object), mirroring real codec-handle reuse.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, f) = decoder.decode(r.kind, r.payload)
        md.reset()
        val sum = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, detectFormat(r.payload),
          r.payload.length, sum, w, h, f)
      }
    }
  }

  /** Build a media table from the documents fixture: payload = utf-8 bytes
    * of the text (a stand-in for real image bytes; the binary column type
    * and everything downstream is the real thing).
    */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "video").otherwise("image").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  // ---- audio: real WAV (RIFF) header parsing ----
  // Same class of realness as the image headers: the container format is
  // a published spec, the parse is pure JVM, and what a real pipeline
  // derives from it (sample rate, channels, bit depth, duration) falls
  // out of the fmt/data chunks without any codec.

  /** Audio metadata from a WAV header. `n_samples` = per-channel sample
    * frames; duration_ms = n_samples * 1000 / sample_rate. */
  final case class WavMeta(sample_rate: Int, channels: Int, bits: Int,
      n_samples: Long)

  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)

  /** Parse a RIFF/WAVE header: walk chunks to `fmt ` (PCM layout) and
    * `data` (payload size). None for non-WAV payloads or non-byte-aligned
    * sample depths; a data chunk declaring more bytes than the payload
    * holds is clamped, so n_samples counts samples actually present. */
  def wavMeta(p: Array[Byte]): Option[WavMeta] = {
    if (p.length < 44 ||
      !(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
      !(p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E')) return None
    var i = 12
    var rate = 0; var ch = 0; var bits = 0; var dataLen = -1L
    var seenFmt = false
    while (i + 8 <= p.length && (!seenFmt || dataLen < 0)) {
      val id = new String(p, i, 4, "US-ASCII")
      val len = le32(p, i + 4)
      id match {
        // FIRST fmt chunk wins, matching wavFormatCode's walk: a hostile
        // multi-fmt WAV (fmt tag=1, then fmt tag=7 bits=8 before data)
        // must not pass the wFormatTag==1 guard with the second chunk's
        // layout and decode companded bytes as offset-binary PCM
        case "fmt " if i + 24 <= p.length && !seenFmt =>
          seenFmt = true
          ch = le16(p, i + 10)
          rate = le32(p, i + 12).toInt
          bits = le16(p, i + 22)
        case "data" if dataLen < 0 =>
          // trust the header only as far as the payload goes: a truncated
          // file declares more data bytes than are present, and n_samples
          // must reflect bytes we could actually read, not the claim.
          // FIRST data chunk wins — the same chunk pcmStats decodes, so
          // n_samples and n_samples_total always count the same payload
          dataLen = math.min(len, math.max(0L, (p.length - i - 8).toLong))
        case _ => ()
      }
      // chunks are word-aligned: odd sizes carry a pad byte; a malformed
      // declared length (negative after truncation, or non-advancing)
      // ends the walk instead of looping or indexing out of range
      val next = i.toLong + 8L + len + (len & 1L)
      i = if (next <= i || next > Int.MaxValue) p.length else next.toInt
    }
    // sub-byte sample depths (4-bit ADPCM and friends) would make bits/8
    // zero and divide by it; this parser only claims byte-aligned PCM
    if (rate <= 0 || ch <= 0 || bits < 8 || bits % 8 != 0 || dataLen < 0) None
    else Some(WavMeta(rate, ch, bits, dataLen / (ch.toLong * (bits / 8))))
  }

  /** Minimal valid PCM WAV header + silent payload for `nSamples`
    * per-channel frames (fixture / oracle parity, like [[pngHeader]]). */
  def wavBytes(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * (bits / 8)
    val out = new Array[Byte](44 + dataLen)
    def put(i: Int, s: String): Unit = s.getBytes("US-ASCII").copyToArray(out, i)
    def putLe32(i: Int, v: Long): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    put(0, "RIFF"); putLe32(4, 36L + dataLen); put(8, "WAVE")
    put(12, "fmt "); putLe32(16, 16); putLe16(20, 1) // PCM
    putLe16(22, channels); putLe32(24, rate)
    putLe32(28, rate.toLong * channels * (bits / 8)) // byte rate
    putLe16(32, channels * (bits / 8)); putLe16(34, bits)
    put(36, "data"); putLe32(40, dataLen)
    out
  }

  /** PCM WAV with id-derived SAMPLES (not silence): frame i, channel c →
    * a(i,c) = (mediaId + 31i + 17c) mod 256 − 128, stored at the declared
    * depth (8-bit offset-binary; 16-bit signed little-endian scaled by
    * 256, so the full 16-bit range is exercised without overflow). The
    * id arithmetic is what lets the q87 oracle recompute every
    * amplitude without parsing a byte. */
  def wavTone(mediaId: Long, rate: Int, channels: Int, bits: Int,
      nSamples: Int): Array[Byte] = {
    require(bits == 8 || bits == 16, s"wavTone writes 8/16-bit PCM, got $bits")
    val out = wavBytes(rate, channels, bits, nSamples)
    var i = 0
    while (i < nSamples) {
      var c = 0
      while (c < channels) {
        val a = (((mediaId + 31L * i + 17L * c) % 256) - 128).toInt
        val off = 44 + (i * channels + c) * (bits / 8)
        if (bits == 8) out(off) = (a + 128).toByte
        else {
          val v = a * 256
          out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
        }
        c += 1
      }
      i += 1
    }
    out
  }

  /** Amplitude statistics of a decoded PCM payload. `n_samples_total`
    * counts samples across channels; mean/rms are raw f64 quotients of
    * exact integer sums (rounding is the caller's choice). */
  final case class PcmStats(n_samples_total: Long, peak: Int,
      mean_abs: Double, rms: Double)

  /** The fmt chunk's wFormatTag (1 = linear PCM, 6 = A-law, 7 = μ-law);
    * -1 when absent. */
  private def wavFormatCode(p: Array[Byte]): Int = {
    var i = 12
    while (i + 8 <= p.length) {
      val id = new String(p, i, 4, "US-ASCII")
      val len = le32(p, i + 4)
      if (id == "fmt " && i + 10 <= p.length) return le16(p, i + 8)
      val next = i.toLong + 8L + len + (len & 1L)
      i = if (next <= i || next > Int.MaxValue) p.length else next.toInt
    }
    -1
  }

  /** REAL sample decode: walk to the data chunk, decode each sample at
    * the fmt depth (8-bit unsigned offset-binary / 16-bit signed LE),
    * accumulate exact integer |a| and a² sums. None when [[wavMeta]]
    * rejects the payload or no data chunk exists. Linear PCM ONLY
    * (wFormatTag 1): a G.711 companded stream also has bits == 8, and
    * decoding its bytes as offset-binary would yield confident garbage —
    * [[g711Stats]] owns those. */
  def pcmStats(p: Array[Byte]): Option[PcmStats] = wavMeta(p)
    // only depths this decoder actually implements: treating a 24-bit
    // stream as 16-bit frames would yield garbage stats, not an error
    .filter(m => (m.bits == 8 || m.bits == 16) && wavFormatCode(p) == 1)
    .flatMap { m =>
    var i = 12
    var off = -1; var len = 0L
    while (i + 8 <= p.length && off < 0) {
      val id = new String(p, i, 4, "US-ASCII")
      val l = le32(p, i + 4)
      if (id == "data") { off = i + 8; len = math.min(l, (p.length - i - 8).toLong) }
      else {
        val next = i.toLong + 8L + l + (l & 1L)
        i = if (next <= i || next > Int.MaxValue) p.length else next.toInt
      }
    }
    if (off < 0) None
    else {
      val bytesPer = m.bits / 8
      val total = len / bytesPer
      var k = 0L
      var peak = 0; var sumAbs = 0L; var sumSq = 0L
      while (k < total) {
        val base = off + (k * bytesPer).toInt
        val a =
          if (m.bits == 8) (p(base) & 0xff) - 128
          else (p(base) & 0xff) | (p(base + 1).toInt << 8) // sign-extends
        val ab = math.abs(a)
        if (ab > peak) peak = ab
        sumAbs += ab
        sumSq += a.toLong * a
        k += 1
      }
      if (total == 0) Some(PcmStats(0L, 0, 0.0, 0.0))
      else Some(PcmStats(total, peak,
        sumAbs.toDouble / total, math.sqrt(sumSq.toDouble / total)))
    }
  }

  /** Linear-PCM samples as interleaved Int amplitudes at the same
    * integer scale [[pcmStats]] accumulates (8-bit offset-binary
    * recentred, 16-bit signed LE) — the decode surface windowed
    * operators ([[AudioActivity]]) build on. Same contract: linear PCM
    * only, None off-contract. */
  def pcmSamples(p: Array[Byte]): Option[(WavMeta, Array[Int])] = wavMeta(p)
    .filter(m => (m.bits == 8 || m.bits == 16 || m.bits == 24) &&
      wavFormatCode(p) == 1)
    .flatMap { m =>
      var i = 12
      var off = -1; var len = 0L
      while (i + 8 <= p.length && off < 0) {
        val id = new String(p, i, 4, "US-ASCII")
        val l = le32(p, i + 4)
        if (id == "data") { off = i + 8; len = math.min(l, (p.length - i - 8).toLong) }
        else {
          val next = i.toLong + 8L + l + (l & 1L)
          i = if (next <= i || next > Int.MaxValue) p.length else next.toInt
        }
      }
      if (off < 0) None
      else {
        val bytesPer = m.bits / 8
        val total = (len / bytesPer).toInt
        val out = new Array[Int](total)
        var k = 0
        while (k < total) {
          val base = off + k * bytesPer
          out(k) =
            if (m.bits == 8) (p(base) & 0xff) - 128
            else if (m.bits == 16)
              (p(base) & 0xff) | (p(base + 1).toInt << 8) // sign-extends
            else // 24-bit: three LE bytes, sign-extended via shift pair
              (((p(base) & 0xff) | ((p(base + 1) & 0xff) << 8) |
                ((p(base + 2) & 0xff) << 16)) << 8) >> 8
          k += 1
        }
        Some((m, out))
      }
    }

  /** G.711 expansion, CCITT reference forms (public spec): μ-law bytes
    * invert then expand as ((mant·8 + 132) << exp) − 132 signed; A-law
    * bytes XOR 0x55 then segment-expand. Both are pure integer maps, so
    * an oracle replays them exactly. */
  def mulawToLinear(b: Int): Int = {
    val u = (~b) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  def alawToLinear(b: Int): Int = {
    val a = b ^ 0x55
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** Amplitude stats for G.711 companded WAV (wFormatTag 6 = A-law,
    * 7 = μ-law, 8-bit): expand each byte to 13/14-bit linear, then the
    * same exact-integer accumulation as [[pcmStats]]. None for anything
    * else — including linear PCM, which [[pcmStats]] owns. */
  def g711Stats(p: Array[Byte]): Option[PcmStats] = {
    val code = wavFormatCode(p)
    if (code != 6 && code != 7) return None
    wavMeta(p).filter(_.bits == 8).flatMap { _ =>
      var i = 12
      var off = -1; var len = 0L
      while (i + 8 <= p.length && off < 0) {
        val id = new String(p, i, 4, "US-ASCII")
        val l = le32(p, i + 4)
        if (id == "data") { off = i + 8; len = math.min(l, (p.length - i - 8).toLong) }
        else {
          val next = i.toLong + 8L + l + (l & 1L)
          i = if (next <= i || next > Int.MaxValue) p.length else next.toInt
        }
      }
      if (off < 0) None
      else {
        var k = 0L
        var peak = 0; var sumAbs = 0L; var sumSq = 0L
        while (k < len) {
          val b = p(off + k.toInt) & 0xff
          val a = if (code == 7) mulawToLinear(b) else alawToLinear(b)
          val ab = math.abs(a)
          if (ab > peak) peak = ab
          sumAbs += ab
          sumSq += a.toLong * a
          k += 1
        }
        if (len == 0) Some(PcmStats(0L, 0, 0.0, 0.0))
        else Some(PcmStats(len, peak,
          sumAbs.toDouble / len, math.sqrt(sumSq.toDouble / len)))
      }
    }
  }

  /** G.711 WAV fixture: format code 6/7, mono-or-stereo, encoded bytes
    * straight from id arithmetic b(j) = (mediaId + 29j) mod 256 — the
    * oracle replays the expansion formula per byte. */
  def wavG711(mediaId: Long, rate: Int, channels: Int, code: Int,
      nSamples: Int): Array[Byte] = {
    require(code == 6 || code == 7, s"G.711 format code must be 6 or 7, got $code")
    val out = wavBytes(rate, channels, 8, nSamples)
    // rewrite the fmt tag from PCM to the companded code
    out(20) = code.toByte
    val dataLen = nSamples * channels
    var j = 0
    while (j < dataLen) {
      out(44 + j) = ((mediaId + 29L * j) % 256).toByte
      j += 1
    }
    out
  }

  /** IMA-ADPCM WAV fixtures (doc_id % 3 == 2): mono 16-bit source
    * samples s(i) = ((mediaId*7 + 31i) mod 4001 − 2000) · 8 — wide
    * swings that drive the step index up and down — encoded at
    * blockAlign 36 (65 samples/block), so most fixtures span a block
    * boundary and the header-reseed path executes. The codec is LOSSY;
    * the q123 oracle replays the encoder+decoder state machine exactly
    * (all-integer), not the source samples. */
  def adpcmFilesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val n = 40 + (id % 100).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 7 + 31L * i) % 4001).toInt - 2000) * 8)
        MediaRow(id, "audio", Adpcm.encode(samples, rate = 8000))
      })
  }

  /** Decode IMA-ADPCM WAVs to amplitude stats over the RECONSTRUCTED
    * samples (quarantine semantics on any off-contract payload). */
  def extractAdpcmStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Adpcm.decode(r.payload).iterator.map { case (_, samples) =>
        var peak = 0; var sumAbs = 0L
        samples.foreach { a =>
          val ab = math.abs(a)
          if (ab > peak) peak = ab
          sumAbs += ab
        }
        (r.media_id, samples.length.toLong, peak, sumAbs)
      }
    }).toDF("media_id", "n_samples", "peak", "sum_abs")
  }

  /** Per-partition G.711 stat extraction (quarantine semantics). */
  def extractG711Stats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      g711Stats(r.payload).iterator.map(s =>
        (r.media_id, s.n_samples_total, s.peak, s.mean_abs, s.rms))
    }).toDF("media_id", "n_samples_total", "peak", "mean_abs", "rms")
  }

  /** Per-partition PCM amplitude extraction; undecodable payloads yield
    * no rows (quarantine-sink semantics, unlike the keep-zeros metadata
    * path — stats of nothing are not zeros). */
  def extractPcmStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      pcmStats(r.payload).iterator.map(s =>
        (r.media_id, s.n_samples_total, s.peak, s.mean_abs, s.rms))
    }).toDF("media_id", "n_samples_total", "peak", "mean_abs", "rms")
  }

  /** Per-partition audio metadata extraction — the audio twin of
    * [[extractFeatures]]; undecodable payloads keep zeros rather than
    * dropping (metadata queries want the row; filters come after). */
  def extractAudioMeta(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val m = wavMeta(r.payload)
      (r.media_id, r.payload.length,
        m.map(_.sample_rate).getOrElse(0), m.map(_.channels).getOrElse(0),
        m.map(_.bits).getOrElse(0), m.map(_.n_samples).getOrElse(0L),
        m.map(x => x.n_samples * 1000L / x.sample_rate).getOrElse(0L))
    }).toDF("media_id", "n_bytes", "sample_rate", "channels", "bits",
      "n_samples", "duration_ms")
  }

  // ---- frame sampling / resize over a raw video container ----
  // A real pipeline decodes video with a codec; the container format here
  // ("RAWV": magic + be16 w/h/frameCount + frameCount dense w*h grayscale
  // planes) is the deterministic stand-in, but everything downstream of
  // the byte level — binary columns through explode-shaped mapPartitions,
  // per-frame rows, nearest-neighbor pixel math, partition-bounded memory
  // — is exactly the machinery real frame extraction runs on.

  /** One extracted frame: dense `w*h` grayscale bytes, row-major. */
  final case class FrameRow(media_id: Long, frame_idx: Int, w: Int, h: Int,
      px: Array[Byte])

  private val RawvMagic = "RAWV".getBytes("US-ASCII")

  /** Deterministic raw-video payload: pixel(f, y, x) =
    * (mediaId + 31f + 7y + x) mod 256 — reproducible from the id alone,
    * which is what lets an external oracle replay sampling + resize.
    */
  def rawVideo(mediaId: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new Array[Byte](10 + w * h * frames)
    System.arraycopy(RawvMagic, 0, out, 0, 4)
    out(4) = (w >> 8).toByte; out(5) = w.toByte
    out(6) = (h >> 8).toByte; out(7) = h.toByte
    out(8) = (frames >> 8).toByte; out(9) = frames.toByte
    var f = 0
    var i = 10
    while (f < frames) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(i) = ((mediaId + 31L * f + 7L * y + x) % 256).toByte
          i += 1; x += 1
        }
        y += 1
      }
      f += 1
    }
    out
  }

  /** (w, h, frames) from a RAWV header; None for any other payload. */
  def rawVideoDims(p: Array[Byte]): Option[(Int, Int, Int)] =
    if (p.length >= 10 && p.startsWith(RawvMagic))
      Some((be16(p, 4), be16(p, 6), be16(p, 8)))
    else None

  /** Every videos-fixture doc (doc_id % 3 == 0) as a small RAWV clip with
    * id-derived dims: w = 4 + id%5, h = 3 + id%4, frames = 1 + id%7.
    */
  def videosFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        MediaRow(id, "video",
          rawVideo(id, 4 + (id % 5).toInt, 3 + (id % 4).toInt, 1 + (id % 7).toInt))
      })
  }

  // ---- AVI: a REAL video container (RIFF, like WAV) ----
  // Retires the RAWV stand-in for the container-walk layer: RIFF/'AVI '
  // with a spec-shaped hdrl (avih + strl/strh/strf BITMAPINFOHEADER +
  // 256-entry grayscale palette) and uncompressed 8-bit DIB frames in
  // LIST movi ('00db' chunks, bottom-up rows padded to 4 bytes) — the
  // layout any stock AVI tool emits for uncompressed grayscale. The
  // PIXELS are still id-derived (the feature-extraction seam stays
  // honestly labeled), but parsing is a genuine nested-RIFF walk with
  // header/stride/bit-depth validation, not a magic-number prefix.

  private def le32bytes(v: Int): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)

  private def aviStride(w: Int): Int = (w + 3) & ~3

  /** Encode grayscale frames (top-down row-major, one Array per frame)
    * as an uncompressed 8-bit AVI. */
  def aviGray(w: Int, h: Int, frames: Seq[Array[Byte]], fps: Int = 25): Array[Byte] = {
    require(w >= 1 && h >= 1 && frames.nonEmpty && frames.forall(_.length == w * h),
      s"need non-empty ${w}x$h frames")
    val stride = aviStride(w)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32bytes(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ body)
    val frameBytes = stride * h
    val avih = le32bytes(1000000 / fps) ++ le32bytes(frameBytes * fps) ++
      le32bytes(0) ++ le32bytes(0) ++ le32bytes(frames.length) ++
      le32bytes(0) ++ le32bytes(1) ++ le32bytes(frameBytes) ++
      le32bytes(w) ++ le32bytes(h) ++ Array.fill[Byte](16)(0)
    val strh = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
      le32bytes(0) ++ le16bytes(0) ++ le16bytes(0) ++ le32bytes(0) ++
      le32bytes(1) ++ le32bytes(fps) ++ le32bytes(0) ++
      le32bytes(frames.length) ++ le32bytes(frameBytes) ++ le32bytes(-1) ++
      le32bytes(0) ++ le16bytes(0) ++ le16bytes(0) ++ le16bytes(w) ++ le16bytes(h)
    val bmih = le32bytes(40) ++ le32bytes(w) ++ le32bytes(h) ++ le16bytes(1) ++
      le16bytes(8) ++ le32bytes(0) ++ le32bytes(frameBytes) ++
      le32bytes(0) ++ le32bytes(0) ++ le32bytes(256) ++ le32bytes(0)
    val palette = Array.tabulate[Byte](256 * 4)(i =>
      if (i % 4 == 3) 0 else (i / 4).toByte) // gray RGBQUADs
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", bmih ++ palette)))
    val movi = list("movi", frames.map { f =>
      val dib = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) { // bottom-up, stride-padded
        System.arraycopy(f, (h - 1 - y) * w, dib, y * stride, w)
        y += 1
      }
      chunk("00db", dib)
    }.reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32bytes(body.length) ++ body
  }

  /** Decode an uncompressed 8-bit grayscale AVI: nested RIFF walk
    * (hdrl → avih dims, strf bit depth/compression; movi → '00db'
    * frames), stride un-padding, bottom-up flip. None for anything out
    * of contract — compressed streams ('00dc' / biCompression != 0),
    * depths other than 8, top-down DIBs, truncated chunks, hostile
    * dims. Returns (w, h, frames top-down row-major). */
  def aviGrayFrames(p: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] =
    aviFramesWalk(p, mjpeg = false)

  /** Decode an MJPEG AVI — each movi '00dc' chunk a standalone baseline
    * grayscale JPEG (the composition of the AVI chunk walk with
    * [[Jpeg.decodeGray]]; the format real crawl data carries when AVI
    * isn't raw DIBs). Contract, reject-don't-guess: strf must declare
    * biCompression 'MJPG' at 8 bpp; every frame must decode and match
    * the avih canvas; uncompressed '00db' chunks, a failing frame, a
    * frame-count/header mismatch, or total decoded pixels past the 2^26
    * allocation cap (JPEG expands ~100-500x, so the cap must fire
    * BEFORE each frame's decode — the Gif.decodeFrames contract) → None.
    * Returns (w, h, frames top-down row-major). */
  def aviMjpegFrames(p: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] =
    aviFramesWalk(p, mjpeg = true)

  private val MjpgFourcc = 0x47504A4DL // 'MJPG' little-endian

  private def aviFramesWalk(
      p: Array[Byte], mjpeg: Boolean): Option[(Int, Int, Seq[Array[Byte]])] = {
    if (p.length < 12 || !(p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F') ||
      !(p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' ')) return None
    var w = 0; var h = 0; var declaredFrames = -1L
    var depthOk = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk [from, until) as a sequence of RIFF chunks
    def walk(from: Int, until: Int, inMovi: Boolean): Boolean = {
      var i = from
      while (i + 8 <= until) {
        val id = new String(p, i, 4, "US-ASCII")
        val lenL = le32(p, i + 4) // unsigned 32-bit: Long
        if (lenL < 0 || i + 8L + lenL > until) return false // truncated/hostile
        val len = lenL.toInt
        id match {
          case "LIST" =>
            if (len < 4) return false
            val tpe = new String(p, i + 8, 4, "US-ASCII")
            if (!walk(i + 12, i + 8 + len, inMovi || tpe == "movi")) return false
          case "avih" if len >= 56 =>
            declaredFrames = le32(p, i + 8 + 16)
            val wL = le32(p, i + 8 + 32); val hL = le32(p, i + 8 + 36)
            // hostile-dims cap, same budget as the image decoders
            if (wL <= 0 || hL <= 0 || wL * hL > (1L << 26)) return false
            w = wL.toInt; h = hL.toInt
          case "strf" if len >= 40 =>
            val bitCount = (p(i + 8 + 14) & 0xff) | ((p(i + 8 + 15) & 0xff) << 8)
            val compression = le32(p, i + 8 + 16)
            val biHeight = le32(p, i + 8 + 8) // signed would mean top-down
            if (bitCount != 8 || biHeight > Int.MaxValue) return false
            if (compression != (if (mjpeg) MjpgFourcc else 0L)) return false
            depthOk = true
          case "00dc" if !mjpeg => return false // compressed frames out of contract
          case "00dc" if inMovi => // mjpeg: a standalone baseline JPEG
            if (w <= 0 || !depthOk) return false // frames before headers
            // TOTAL-pixel allocation cap, checked before the decode
            if ((frames.length + 1).toLong * w * h > (1L << 26)) return false
            val jpeg = java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len)
            Jpeg.decodeGray(jpeg) match {
              case Some((jw, jh, px)) if jw == w && jh == h => frames += px
              case _ => return false // corrupt or off-canvas frame
            }
          case "00db" if mjpeg => return false // raw DIBs out of contract
          case "00db" if inMovi =>
            if (w <= 0 || !depthOk) return false // frames before headers
            val stride = aviStride(w)
            if (len < stride * h) return false
            val f = new Array[Byte](w * h)
            var y = 0
            while (y < h) { // un-pad and flip to top-down
              System.arraycopy(p, i + 8 + y * stride, f, (h - 1 - y) * w, w)
              y += 1
            }
            frames += f
          case _ => () // strh/idx1/ancillary: skip
        }
        val next = i.toLong + 8L + len + (len & 1) // word alignment (WAV walk)
        if (next <= i || next > Int.MaxValue) return false
        i = next.toInt
      }
      true
    }
    if (!walk(12, p.length, inMovi = false)) return None
    if (w <= 0 || !depthOk || frames.isEmpty) return None
    // a frame count disagreeing with the header is a malformed file,
    // not a best-effort decode
    if (declaredFrames >= 0 && frames.length != declaredFrames) return None
    Some((w, h, frames.toSeq))
  }

  /** Encode grayscale frames as an MJPEG AVI: same RIFF scaffolding as
    * [[aviGray]], but strh/strf declare the 'MJPG' handler and each movi
    * frame is a '00dc' chunk holding [[Jpeg.encodeGray]]'s baseline
    * stream (top-down — no DIB flip, JPEG rows are already top-down). */
  def aviMjpeg(w: Int, h: Int, frames: Seq[Array[Byte]], fps: Int = 25): Array[Byte] = {
    require(w >= 1 && h >= 1 && frames.nonEmpty && frames.forall(_.length == w * h),
      s"need non-empty ${w}x$h frames")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32bytes(body.length) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    def list(tpe: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", tpe.getBytes("US-ASCII") ++ body)
    val jpegs = frames.map(f => Jpeg.encodeGray(w, h, f))
    val maxBytes = jpegs.map(_.length).max
    val avih = le32bytes(1000000 / fps) ++ le32bytes(maxBytes * fps) ++
      le32bytes(0) ++ le32bytes(0) ++ le32bytes(frames.length) ++
      le32bytes(0) ++ le32bytes(1) ++ le32bytes(maxBytes) ++
      le32bytes(w) ++ le32bytes(h) ++ Array.fill[Byte](16)(0)
    val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      le32bytes(0) ++ le16bytes(0) ++ le16bytes(0) ++ le32bytes(0) ++
      le32bytes(1) ++ le32bytes(fps) ++ le32bytes(0) ++
      le32bytes(frames.length) ++ le32bytes(maxBytes) ++ le32bytes(-1) ++
      le32bytes(0) ++ le16bytes(0) ++ le16bytes(0) ++ le16bytes(w) ++ le16bytes(h)
    val bmih = le32bytes(40) ++ le32bytes(w) ++ le32bytes(h) ++ le16bytes(1) ++
      le16bytes(8) ++ le32bytes(MjpgFourcc.toInt) ++ le32bytes(0) ++
      le32bytes(0) ++ le32bytes(0) ++ le32bytes(0) ++ le32bytes(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", bmih)))
    val movi = list("movi", jpegs.map(j => chunk("00dc", j)).reduce(_ ++ _))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32bytes(body.length) ++ body
  }

  /** AVI clips as per-frame rows, ready for [[resizeNearest]] — the real
    * container path beside the RAWV [[sampleFrames]]; every `everyN`-th
    * frame, undecodable payloads yield no rows. One clip's frames are
    * materialized per task (clips are bounded by the ingest chunker in a
    * production pipeline; a streaming chunk-offset walk is the next
    * refinement if clip sizes outgrow task memory). */
  def sampleAviFrames(media: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { v =>
      aviGrayFrames(v.payload).iterator.flatMap { case (w, h, fs) =>
        (0 until fs.length by everyN).iterator.map(f =>
          FrameRow(v.media_id, f, w, h, fs(f)))
      }
    })
  }

  /** [[videosFromDocuments]]'s pixel arithmetic inside a REAL container:
    * the same id-derived dims and pixel(f, y, x) = (id + 31f + 7y + x)
    * mod 256, so the q96 oracle is q77's VERBATIM — only the container
    * (and therefore the whole parse path) differs. */
  def aviFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val n = 1 + (id % 7).toInt
        val frames = (0 until n).map(f => Array.tabulate(w * h) { k =>
          ((id + 31L * f + 7L * (k / w) + (k % w)) % 256).toByte
        })
        MediaRow(id, "video", aviGray(w, h, frames))
      })
  }

  /** Sample every `everyN`-th frame (0, N, 2N, …) of each clip into
    * per-frame rows. Iterator-composed flatMap: a task holds one payload
    * plus one emitted frame at a time, never a clip's full frame list —
    * the shape that keeps 100 GB of video per partition out of task
    * memory. Non-RAWV payloads yield no rows (a real pipeline routes
    * undecodable media to a quarantine sink instead).
    */
  def sampleFrames(videos: Dataset[MediaRow], everyN: Int): Dataset[FrameRow] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import videos.sparkSession.implicits._
    videos.mapPartitions(_.flatMap { v =>
      rawVideoDims(v.payload).iterator.flatMap { case (w, h, frames) =>
        (0 until frames by everyN).iterator.map { f =>
          val px = new Array[Byte](w * h)
          System.arraycopy(v.payload, 10 + f * w * h, px, 0, w * h)
          FrameRow(v.media_id, f, w, h, px)
        }
      }
    })
  }

  /** Nearest-neighbor resize to `ow` x `oh`: out(y, x) = in(y*h/oh, x*w/ow)
    * — the integer-ratio sampling every thumbnailer starts from, and fully
    * real here (no codec needed on dense grayscale planes).
    */
  def resizeNearest(frames: Dataset[FrameRow], ow: Int, oh: Int): Dataset[FrameRow] = {
    require(ow >= 1 && oh >= 1, s"target dims must be >= 1, got ${ow}x$oh")
    import frames.sparkSession.implicits._
    frames.mapPartitions(_.map { fr =>
      val out = new Array[Byte](ow * oh)
      var y = 0
      while (y < oh) {
        val iy = y * fr.h / oh
        var x = 0
        while (x < ow) {
          out(y * ow + x) = fr.px(iy * fr.w + x * fr.w / ow)
          x += 1
        }
        y += 1
      }
      FrameRow(fr.media_id, fr.frame_idx, ow, oh, out)
    })
  }

  /** Undo an EXIF orientation (tag 0x0112, values 1..8) on a grayscale
    * plane — the normalization a thumbnail pipeline MUST apply before
    * any visual dedup or hashing, or the same photo stored rotated
    * hashes to eight different signatures. Pure integer pixel
    * permutation (1 identity, 2/4 flips, 3 rotate-180, 5/7 transposes,
    * 6/8 rotate-90s; 5-8 swap the dims), exact and oracle-replayable.
    * Returns (outW, outH, pixels). */
  def applyOrientation(w: Int, h: Int, px: Array[Byte], orientation: Int)
      : (Int, Int, Array[Byte]) = {
    require(orientation >= 1 && orientation <= 8, s"orientation $orientation")
    require(px.length == w * h, s"need $w*$h pixels")
    val swap = orientation >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Byte](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        val (sx, sy) = orientation match {
          case 1 => (ox, oy)
          case 2 => (w - 1 - ox, oy) // mirror horizontal
          case 3 => (w - 1 - ox, h - 1 - oy) // rotate 180
          case 4 => (ox, h - 1 - oy) // mirror vertical
          case 5 => (oy, ox) // transpose
          case 6 => (oy, h - 1 - ox) // stored is 90° CW of visual
          case 7 => (w - 1 - oy, h - 1 - ox) // transverse
          case _ => (w - 1 - oy, ox) // 8: stored is 90° CCW of visual
        }
        out(oy * ow + ox) = px(sy * w + sx)
        ox += 1
      }
      oy += 1
    }
    (ow, oh, out)
  }

  // ---- PNG: REAL pixel decode for one public format ----
  // Unlike the generic StubDecoder, this is a complete 8-bit-grayscale
  // PNG codec in pure JVM (PNG spec, RFC 2083): zlib via java.util.zip,
  // per-chunk CRC32s verified, and all five scanline filters
  // reconstructed. The encoder deliberately cycles filters row-by-row so
  // a decoder that shortcuts reconstruction cannot round-trip — the q83
  // oracle recomputes resized-pixel checksums from the id arithmetic, so
  // a single wrong reconstructed byte anywhere breaks the hash.

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG/RFC-2083 Paeth predictor: nearest of left/up/upper-left to
    * left + up - upperLeft, ties resolved a, b, c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Filter + deflate + frame `data` (h rows of w pixels at `bpp` bytes
    * each) into a PNG of the given color type. Row y uses filter y%5, so
    * every filter (None/Sub/Up/Average/Paeth) appears in any image of 5+
    * rows; PNG filters operate on BYTES with the "left" neighbor `bpp`
    * bytes back (PNG spec §6.6), which is what makes this one loop serve
    * grayscale (bpp 1), truecolor (bpp 3), and palette indices (bpp 1). */
  /** Filter `h` rows of `rowBytes` packed bytes with the row-cycling
    * filter choice (y % 5 — every filter appears in any 5+-row image),
    * at byte stride `bpp`. Shared by the sequential encoder and each
    * Adam7 pass (a pass filters INDEPENDENTLY: its first row has no
    * "up" neighbor, per PNG spec §8.2). */
  private def filterScanlines(rowBytes: Int, h: Int, bpp: Int,
      data: Array[Byte]): Array[Byte] = {
    val raw = new Array[Byte]((rowBytes + 1) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (rowBytes + 1)) = f.toByte
      var x = 0
      while (x < rowBytes) {
        val cur = data(y * rowBytes + x) & 0xff
        val left = if (x >= bpp) data(y * rowBytes + x - bpp) & 0xff else 0
        val up = if (y > 0) data((y - 1) * rowBytes + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) data((y - 1) * rowBytes + x - bpp) & 0xff else 0
        val filt = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (rowBytes + 1) + 1 + x) = (filt & 0xff).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  private def zlibDeflate(raw: Array[Byte]): Array[Byte] = {
    val deflater = new java.util.zip.Deflater()
    val idatBuf = new java.io.ByteArrayOutputStream()
    try {
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](4096)
      while (!deflater.finished())
        idatBuf.write(buf, 0, deflater.deflate(buf))
    } finally deflater.end()
    idatBuf.toByteArray
  }

  private def pngAssemble(w: Int, h: Int, colorType: Int, depth: Int,
      interlace: Int, plte: Array[Byte], idat: Array[Byte]): Array[Byte] = {
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      be32bytes(data.length) ++ t ++ data ++ be32bytes(crc.getValue.toInt)
    }
    val ihdr = be32bytes(w) ++ be32bytes(h) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0, interlace.toByte)
    PngSig ++ chunk("IHDR", ihdr) ++
      (if (plte == null) Array.emptyByteArray else chunk("PLTE", plte)) ++
      chunk("IDAT", idat) ++
      chunk("IEND", Array.emptyByteArray)
  }

  private def pngEncode(w: Int, h: Int, colorType: Int, bpp: Int,
      data: Array[Byte], plte: Array[Byte], depth: Int = 8): Array[Byte] = {
    // depth < 8 (palette only): `data` is already bit-packed per row and
    // filters operate at 1-byte stride (PNG 4.5.4: bpp rounds up to 1)
    val rowBytes = if (depth == 8) w * bpp else (w * depth + 7) / 8
    require(w >= 1 && h >= 1 && data.length == rowBytes * h,
      s"need $rowBytes*$h=${rowBytes * h} bytes, got ${data.length}")
    val raw = filterScanlines(rowBytes, h, bpp, data)
    pngAssemble(w, h, colorType, depth, 0, plte, zlibDeflate(raw))
  }

  /** Adam7 pass geometry (PNG spec §8.2): (x0, y0, dx, dy, passW, passH)
    * for the seven passes, EMPTY passes dropped — a pass whose reduced
    * image has zero width or height contributes no scanlines at all,
    * which is the off-by-one every small-image interlace bug lives in. */
  private def adam7Passes(w: Int, h: Int): Seq[(Int, Int, Int, Int, Int, Int)] =
    Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)).map { case (x0, y0, dx, dy) =>
      val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
      (x0, y0, dx, dy, pw, ph)
    }.filter(p => p._5 > 0 && p._6 > 0)

  /** Adam7-interlaced PNG encoder. `data` is UNPACKED row-major pixels —
    * `bpp` bytes per pixel for depth 8 (1 gray / 3 RGB / 1 palette
    * index), one index byte per pixel for sub-8 palette depths. Each
    * pass is extracted, (re)packed at the pass's own width, and filtered
    * independently; the seven passes' scanlines concatenate into ONE
    * zlib stream (spec §8.2 — not one stream per pass). */
  private def pngEncodeAdam7(w: Int, h: Int, colorType: Int, bpp: Int,
      data: Array[Byte], plte: Array[Byte], depth: Int = 8): Array[Byte] = {
    require(w >= 1 && h >= 1 && data.length == w * h * bpp,
      s"need unpacked $w*$h*$bpp bytes, got ${data.length}")
    val rawAll = new java.io.ByteArrayOutputStream()
    for ((x0, y0, dx, dy, pw, ph) <- adam7Passes(w, h)) {
      val prb = if (depth == 8) pw * bpp else (pw * depth + 7) / 8
      val pdata = new Array[Byte](prb * ph)
      var j = 0
      while (j < ph) {
        var i = 0
        while (i < pw) {
          val fy = y0 + j * dy; val fx = x0 + i * dx
          if (depth == 8) {
            var c = 0
            while (c < bpp) {
              pdata(j * prb + i * bpp + c) = data((fy * w + fx) * bpp + c)
              c += 1
            }
          } else {
            val bit = i * depth
            pdata(j * prb + (bit >> 3)) =
              (pdata(j * prb + (bit >> 3)) |
                ((data(fy * w + fx) & 0xff) << (8 - depth - (bit & 7)))).toByte
          }
          i += 1
        }
        j += 1
      }
      rawAll.write(filterScanlines(prb, ph, bpp, pdata))
    }
    pngAssemble(w, h, colorType, depth, 1, plte,
      zlibDeflate(rawAll.toByteArray))
  }

  /** Adam7-interlaced grayscale PNG (the q161 fixture encoder). */
  def pngGrayAdam7(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    pngEncodeAdam7(w, h, colorType = 0, bpp = 1, px, null)

  /** Adam7-interlaced truecolor PNG from interleaved RGB bytes. */
  def pngRgbAdam7(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    pngEncodeAdam7(w, h, colorType = 2, bpp = 3, rgb, null)

  /** Adam7-interlaced palette PNG: one UNPACKED index per pixel at any
    * supported depth (1/2/4/8) — each pass bit-packs at its own width,
    * so pass-row pad bits differ from the sequential encode's. */
  def pngIndexedAdam7(w: Int, h: Int, idx: Array[Byte],
      palette: Array[Byte], depth: Int = 8): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 256 * 3, s"palette must be 1-256 RGB triples")
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8,
      s"palette bit depth must be 1/2/4/8, got $depth")
    val n = palette.length / 3
    require(n <= (1 << depth), s"$n palette entries need more than $depth bits")
    require(idx.forall(b => (b & 0xff) < n), s"index out of palette range $n")
    pngEncodeAdam7(w, h, colorType = 3, bpp = 1, idx, palette, depth)
  }

  /** Encode a dense row-major grayscale plane as a REAL PNG (bit depth 8,
    * color type 0): zlib-deflated scanlines, CRC'd chunks. */
  def pngGray(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    pngEncode(w, h, colorType = 0, bpp = 1, px, null)

  /** Truecolor (color type 2) PNG from interleaved RGB bytes
    * (3 per pixel, row-major). */
  def pngRgb(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    pngEncode(w, h, colorType = 2, bpp = 3, rgb, null)

  /** Palette (color type 3) PNG: one index PER PIXEL (unpacked, whatever
    * the depth) + a PLTE chunk of RGB triples. Every index must address a
    * palette entry. `depth` 1/2/4 bit-packs indices MSB-first within each
    * scanline byte (PNG 7.2) — what small-palette encoders emit; rows pad
    * to a byte boundary. */
  def pngIndexed(w: Int, h: Int, idx: Array[Byte], palette: Array[Byte],
      depth: Int = 8): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 256 * 3, s"palette must be 1-256 RGB triples")
    require(depth == 1 || depth == 2 || depth == 4 || depth == 8,
      s"palette bit depth must be 1/2/4/8, got $depth")
    val n = palette.length / 3
    require(n <= (1 << depth), s"$n palette entries need more than $depth bits")
    require(idx.forall(b => (b & 0xff) < n), s"index out of palette range $n")
    if (depth == 8) pngEncode(w, h, colorType = 3, bpp = 1, idx, palette)
    else {
      require(idx.length == w * h, s"need $w*$h indices, got ${idx.length}")
      val rowBytes = (w * depth + 7) / 8
      val packed = new Array[Byte](rowBytes * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bit = x * depth
          packed(y * rowBytes + (bit >> 3)) =
            (packed(y * rowBytes + (bit >> 3)) |
              ((idx(y * w + x) & 0xff) << (8 - depth - (bit & 7)))).toByte
          x += 1
        }
        y += 1
      }
      pngEncode(w, h, colorType = 3, bpp = 1, packed, palette, depth)
    }
  }

  /** A decoded PNG: `channels` is 1 (grayscale) or 3 (RGB — truecolor,
    * or palette expanded through its PLTE); `px` is row-major with
    * channels interleaved. `color_type` preserves the source encoding
    * (0 gray / 2 truecolor / 3 palette). */
  final case class PngImage(w: Int, h: Int, color_type: Int, channels: Int,
      px: Array[Byte])

  /** Decode a PNG of color type 0 (grayscale, 8-bit), 2 (truecolor,
    * 8-bit), or 3 (palette, bit depth 1/2/4/8): signature check, chunk
    * walk with CRC verification, concatenated IDATs inflated, all five
    * filters reconstructed at the color type's byte stride, sub-8-bit
    * scanlines unpacked MSB-first, palette indices expanded through
    * PLTE. Interlace method 1 (Adam7) is decoded: each of the seven
    * passes reconstructs its filters independently (a pass's first row
    * has no "up" neighbor) and scatters to its positions; sub-8 passes
    * re-pack at the PASS width, so pad bits differ from the sequential
    * layout. None for anything else — wrong signature, unsupported
    * depth/interlace method, CRC mismatch, truncated/corrupt deflate
    * stream, missing PLTE, or an index addressing past the palette. */
  def pngDecode(p: Array[Byte]): Option[PngImage] = {
    if (p.length < 8 || !p.startsWith(PngSig)) return None
    var i = 8
    var w = 0; var h = 0; var colorType = -1; var depth = 8
    var interlace = 0
    var plte: Array[Byte] = null
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (i + 12 > p.length) return None // truncated chunk frame
      val len = be32(p, i)
      val tpe = new String(p, i + 4, 4, "US-ASCII")
      if (len < 0 || i + 12 + len > p.length) return None
      val crc = new java.util.zip.CRC32()
      crc.update(p, i + 4, 4 + len)
      val stored = (be32(p, i + 8 + len).toLong) & 0xffffffffL
      if (crc.getValue != stored) return None
      tpe match {
        case "IHDR" =>
          seenIhdr = true
          w = be32(p, i + 8); h = be32(p, i + 12)
          colorType = p(i + 17) & 0xff
          depth = p(i + 16) & 0xff
          interlace = p(i + 20) & 0xff
          // bit depth 8 (palette also 1/2/4 — small-palette packing),
          // color type 0/2/3, deflate, adaptive filtering, interlace
          // method 0 (none) or 1 (Adam7) — everything else is out of
          // contract
          val depthOk = depth == 8 || (colorType == 3 &&
            (depth == 1 || depth == 2 || depth == 4))
          if (w <= 0 || h <= 0 || len != 13 || !depthOk ||
            (colorType != 0 && colorType != 2 && colorType != 3) ||
            p(i + 18) != 0 || p(i + 19) != 0 ||
            (interlace != 0 && interlace != 1)) return None
        case "PLTE" =>
          // spec: length divisible by 3, 1-256 entries, before IDAT
          if (len % 3 != 0 || len < 3 || len > 256 * 3 ||
            idat.size() > 0) return None
          plte = java.util.Arrays.copyOfRange(p, i + 8, i + 8 + len)
        case "IDAT" => idat.write(p, i + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunks pass through
      }
      i += 12 + len
    }
    // hostile-header guard: a syntactically valid (CRC-correct) IHDR can
    // still declare absurd dimensions; cap the decode buffer so one bad
    // payload can't allocate gigabytes inside an executor task. 64M px
    // is far beyond any thumbnail-pipeline input; real inputs that large
    // belong on a dedicated path.
    if (!seenIhdr || w.toLong * h > (1L << 26)) return None
    if (colorType == 3 && plte == null) return None // palette needs PLTE
    val bpp = if (colorType == 2) 3 else 1
    val rowBytes = if (depth == 8) w * bpp else (w * depth + 7) / 8
    val passes =
      if (interlace == 1) adam7Passes(w, h) else Seq((0, 0, 1, 1, w, h))
    def passRowBytes(pw: Int) = if (depth == 8) pw * bpp else (pw * depth + 7) / 8
    val rawLen = passes.map { case (_, _, _, _, pw, ph) =>
      (passRowBytes(pw) + 1) * ph
    }.sum
    val raw = new Array[Byte](rawLen)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // reconstruct each pass's scanlines independently (sequential = one
    // full-size pass), then scatter pass pixels to their Adam7 positions.
    // `unpacked` holds one UNPACKED pixel per position: bpp bytes for
    // depth 8, one palette index byte for sub-8 depths.
    val unpacked = new Array[Byte](w * h * bpp)
    var rawOff = 0
    for ((x0, y0, dx, dy, pw, ph) <- passes) {
      val prb = passRowBytes(pw)
      val rows = new Array[Byte](prb * ph)
      var y = 0
      while (y < ph) {
        val f = raw(rawOff + y * (prb + 1)) & 0xff
        if (f > 4) return None
        var x = 0
        while (x < prb) {
          val cur = raw(rawOff + y * (prb + 1) + 1 + x) & 0xff
          val left = if (x >= bpp) rows(y * prb + x - bpp) & 0xff else 0
          val up = if (y > 0) rows((y - 1) * prb + x) & 0xff else 0
          val ul = if (x >= bpp && y > 0) rows((y - 1) * prb + x - bpp) & 0xff else 0
          val recon = f match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case _ => cur + paeth(left, up, ul)
          }
          rows(y * prb + x) = (recon & 0xff).toByte
          x += 1
        }
        y += 1
      }
      rawOff += (prb + 1) * ph
      var j = 0
      while (j < ph) {
        var i2 = 0
        while (i2 < pw) {
          val fy = y0 + j * dy; val fx = x0 + i2 * dx
          if (depth == 8) {
            var c = 0
            while (c < bpp) {
              unpacked((fy * w + fx) * bpp + c) = rows(j * prb + i2 * bpp + c)
              c += 1
            }
          } else {
            // sub-8-bit pass scanlines: MSB-first fields at the PASS
            // width (each pass re-packs; pad bits per pass row)
            val bit = i2 * depth
            unpacked(fy * w + fx) = (((rows(j * prb + (bit >> 3)) & 0xff)
              >> (8 - depth - (bit & 7))) & ((1 << depth) - 1)).toByte
          }
          i2 += 1
        }
        j += 1
      }
    }
    val out = unpacked
    if (colorType == 3) {
      val idxArr = out
      // expand indices through the palette into interleaved RGB; an
      // index past the palette is a corrupt file, not a decodable image
      val n = plte.length / 3
      val rgb = new Array[Byte](w * h * 3)
      var k = 0
      while (k < idxArr.length) {
        val idx = idxArr(k) & 0xff
        if (idx >= n) return None
        rgb(k * 3) = plte(idx * 3)
        rgb(k * 3 + 1) = plte(idx * 3 + 1)
        rgb(k * 3 + 2) = plte(idx * 3 + 2)
        k += 1
      }
      Some(PngImage(w, h, colorType, 3, rgb))
    } else
      Some(PngImage(w, h, colorType, bpp, out))
  }

  /** Decode an 8-bit GRAYSCALE PNG (the original q83 contract): any
    * other color type is out of contract here — use [[pngDecode]].
    * Returns (w, h, row-major pixels). */
  def pngDecodeGray(p: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    pngDecode(p).collect { case img if img.color_type == 0 =>
      (img.w, img.h, img.px)
    }

  /** PNG stills as frame rows (frame_idx 0), ready for [[resizeNearest]];
    * undecodable payloads yield no rows (quarantine-sink semantics, like
    * [[sampleFrames]]). */
  def decodePngFrames(media: Dataset[MediaRow]): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      pngDecodeGray(r.payload).iterator.map { case (w, h, px) =>
        FrameRow(r.media_id, 0, w, h, px)
      }
    })
  }

  /** Baseline JPEG stills as frame rows (frame_idx 0) — the [[Jpeg]]
    * codec's Spark plumbing, mirroring [[decodePngFrames]]; undecodable
    * payloads yield no rows. */
  def decodeJpegFrames(media: Dataset[MediaRow]): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Jpeg.decodeGray(r.payload).iterator.map { case (w, h, px) =>
        FrameRow(r.media_id, 0, w, h, px)
      }
    })
  }

  /** Block-flat baseline-JPEG fixtures (doc_id % 3 == 1): w is 8 or 16,
    * h is 8/16/24, and every 8x8 block holds the constant
    * (id + 5·bx + 9·by) mod 256. Flat blocks survive the lossy DCT
    * pipeline EXACTLY under the codec's DC quant step of 8 (see [[Jpeg]]
    * scaladoc), so the q93 oracle recomputes every decoded pixel from id
    * arithmetic while the decoder still runs real Huffman + IDCT over a
    * genuinely entropy-coded stream. */
  def jpegImagesFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 1).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 * (1 + (id % 2).toInt)
        val h = 8 * (1 + (id % 3).toInt)
        val px = Array.tabulate(w * h) { k =>
          val bx = (k % w) / 8; val by = (k / w) / 8
          ((id + 5L * bx + 9L * by) % 256).toByte
        }
        MediaRow(id, "image", Jpeg.encodeGray(w, h, px))
      })
  }

  /** Block-flat MJPEG-in-AVI fixtures (doc_id % 3 == 2): JPEG-legal dims
    * (multiples of 8), 1-4 frames per clip, every 8x8 block of frame f
    * holding (id + 5·bx + 9·by + 11·f) mod 256 — q93's exact-through-
    * the-lossy-pipeline pattern with a per-frame shift, so the oracle
    * replays every decoded pixel of every frame from id arithmetic
    * while the decoder runs the real chunk walk + Huffman + IDCT per
    * frame. */
  def mjpegFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 * (1 + (id % 2).toInt)
        val h = 8 * (1 + (id % 3).toInt)
        val n = 1 + (id % 4).toInt
        val frames = (0 until n).map(f => Array.tabulate(w * h) { k =>
          val bx = (k % w) / 8; val by = (k / w) / 8
          ((id + 5L * bx + 9L * by + 11L * f) % 256).toByte
        })
        MediaRow(id, "video", aviMjpeg(w, h, frames))
      })
  }

  /** Per-frame pixel stats of MJPEG clips — undecodable payloads yield
    * no rows (the quarantine contract: a production pipeline routes them
    * to a reject sink, it never guesses pixels). */
  def decodeMjpegFrameStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      aviMjpegFrames(r.payload).iterator.flatMap { case (_, _, fs) =>
        fs.iterator.zipWithIndex.map { case (px, f) =>
          (r.media_id, f, px.length,
            px.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
        }
      }
    }).toDF("media_id", "frame_idx", "n_px", "px_checksum")
  }

  /** The q93 grayscale fixtures re-encoded WITH restart markers: DRI
    * interval 1 + (id % 3) MCUs, so the per-image streams cover markers
    * every block, every 2, and every 3 — including images where the
    * interval does not divide the MCU count and ones long enough to wrap
    * the RST0..RST7 cycle. Pixels are identical to q93's by
    * construction (restarts change framing, not content), so q114
    * shares q93's pixel-replay oracle verbatim. */
  def jpegRestartImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 1).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 * (1 + (id % 2).toInt)
        val h = 8 * (1 + (id % 3).toInt)
        val px = Array.tabulate(w * h) { k =>
          val bx = (k % w) / 8; val by = (k / w) / 8
          ((id + 5L * bx + 9L * by) % 256).toByte
        }
        MediaRow(id, "image",
          Jpeg.encodeGray(w, h, px, restartInterval = 1 + (id % 3).toInt))
      })
  }

  /** Palette-indexed GIF fixtures (doc_id % 3 == 0): arbitrary (non-
    * aligned) dimensions, an 8-color id-derived palette, and an
    * id-arithmetic index pattern. LZW is lossless, so the q111 oracle
    * replays every pixel exactly with no fixed-point constraints — while
    * the decoder runs real variable-width LZW over entropy-coded
    * sub-blocks. */
  def gifImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 20).toInt
        val h = 4 + (id % 15).toInt
        val palette = Array.tabulate(8) { c =>
          (((id * 17 + 29L * c) % 256).toInt << 16) |
            (((id * 23 + 31L * c) % 256).toInt << 8) |
            ((id * 13 + 37L * c) % 256).toInt
        }
        val idx = Array.tabulate(w * h) { k =>
          ((id + 3L * (k % w) + 7L * (k / w)) % 8).toByte
        }
        MediaRow(id, "image", Gif.encodeIndexed(w, h, palette, idx))
      })
  }

  /** GIF decode to per-image RGB channel sums (same aggregate as the
    * JPEG/PNG stats). Undecodable payloads yield no rows. */
  /** q111's GIF fixtures stored INTERLACED (flag 0x40, four-pass row
    * order). Interlace is pure framing — the decoder's un-permuted
    * output is pixel-identical to the sequential encode — so q116 shares
    * q111's pixel-replay oracle verbatim; a decoder that skips the
    * de-interlace scrambles rows and breaks the per-channel sums only
    * when the pattern varies by row, which (id + 3x + 7y) does. */
  def gifInterlacedImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 20).toInt
        val h = 4 + (id % 15).toInt
        val palette = Array.tabulate(8) { c =>
          (((id * 17 + 29L * c) % 256).toInt << 16) |
            (((id * 23 + 31L * c) % 256).toInt << 8) |
            ((id * 13 + 37L * c) % 256).toInt
        }
        val idx = Array.tabulate(w * h) { k =>
          ((id + 3L * (k % w) + 7L * (k / w)) % 8).toByte
        }
        MediaRow(id, "image", Gif.encodeIndexed(w, h, palette, idx,
          interlaced = true))
      })
  }

  /** Sub-8-bit palette PNG fixtures (doc_id % 3 == 0): bit depth cycles
    * 1/2/4 with (id/3) % 3, the palette fills all 2^depth entries, and
    * index(y, x) = (id + 3x + 7y) mod 2^depth — every scanline carries
    * pad bits whenever w*depth isn't byte-aligned, so the MSB-first
    * unpacking and the 1-byte filter stride are both load-bearing. */
  def pngSub8ImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val depth = Seq(1, 2, 4)(((id / 3) % 3).toInt)
        val nPal = 1 << depth
        val pal = new Array[Byte](nPal * 3)
        var j = 0
        while (j < nPal) {
          pal(j * 3) = ((id * 17 + 29L * j) % 256).toByte
          pal(j * 3 + 1) = ((id * 23 + 31L * j) % 256).toByte
          pal(j * 3 + 2) = ((id * 13 + 37L * j) % 256).toByte
          j += 1
        }
        val idx = Array.tabulate(w * h) { k =>
          ((id + 3L * (k % w) + 7L * (k / w)) % nPal).toByte
        }
        MediaRow(id, "image", pngIndexed(w, h, idx, pal, depth))
      })
  }

  /** Adam7-interlaced grayscale PNG fixtures (doc_id % 3 == 1): dims
    * sweep 1..21 × 1..16 with the id, so SMALL images exercise the
    * empty-pass geometry (a 1×1 image has only pass 1; width 2 skips
    * passes 2/4; height 1 skips 3/5/7) while larger ones hit all seven.
    * pixel(y, x) = (id + 3x + 7y) mod 256 varies by row AND column, so
    * a decoder that mis-places any pass's pixels breaks the q161
    * checksum; q161's oracle replays the sums from the id arithmetic,
    * exactly the q83 pattern. */
  def pngAdam7ImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 1).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 1 + (id % 21).toInt
        val h = 1 + (id % 16).toInt
        val px = Array.tabulate(w * h)(i =>
          ((id + 3L * (i % w) + 7L * (i / w)) % 256).toByte)
        MediaRow(id, "image", pngGrayAdam7(w, h, px))
      })
  }

  /** EXIF-bearing JPEG fixtures (doc_id % 3 == 2): a baseline grayscale
    * JPEG with an APP1 Exif segment spliced after SOI — orientation,
    * make, and capture time all id-derived, and the TIFF byte order
    * ALTERNATES with the id (even → II, odd → MM), so both endian paths
    * carry half the oracle rows. Pixel decode must still succeed with
    * the APP1 present (the q162 row carries n_px to prove it). */
  def jpegExifImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 + 8 * (id % 3).toInt
        val h = 8 + 8 * (id % 2).toInt
        val px = Array.tabulate(w * h)(i =>
          ((id + 3L * (i % w) + 7L * (i / w)) % 256).toByte)
        val app1 = Exif.app1Exif(
          orientation = 1 + (id % 8).toInt,
          make = s"cam-${id % 5}",
          datetime = f"2024:${1 + (id % 12).toInt}%02d:${1 + (id % 28).toInt}%02d 10:30:00",
          littleEndian = id % 2 == 0)
        MediaRow(id, "image", Exif.withApp1(Jpeg.encodeGray(w, h, px), app1))
      })
  }

  /** Strip-organized TIFF fixtures (doc_id % 3 == 0): rows-per-strip
    * cycles 1..6 against heights 4..16, so most images span several
    * strips and the last strip is usually SHORT — the two walk bugs
    * (fixed-size strips, unchecked tail) a naive reader ships with. The
    * byte order alternates II/MM with the id, same as the EXIF
    * fixtures. Round 13: COMPRESSION rotates by id over none / LZW /
    * Adobe-deflate / PackBits with the horizontal-differencing
    * predictor on the LZW/deflate rows where id % 5 == 0 — the pixels
    * are unchanged, so q166's checksum oracle covers the compressed
    * walk verbatim (the decode path is pinned bit-exact against
    * libtiff by TiffInteropSpec + tools/fuzz_tiff_diff.py). */
  def tiffImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 17).toInt
        val h = 4 + (id % 13).toInt
        val px = Array.tabulate(w * h)(i =>
          ((id + 3L * (i % w) + 7L * (i / w)) % 256).toByte)
        val compression = (id % 4).toInt match {
          case 0 => 1; case 1 => 5; case 2 => 8; case _ => 32773
        }
        val predictor =
          if (id % 5 == 0 && (compression == 5 || compression == 8)) 2 else 1
        MediaRow(id, "image", Tiff.encodeGray(w, h, px,
          rowsPerStrip = 1 + (id % 6).toInt, littleEndian = id % 2 == 0,
          compression = compression, predictor = predictor))
      })
  }

  /** WARC blobs synthesized from the documents table: docs shard into
    * blobs of up to 8 by doc_id DIV 8, each blob led by a `warcinfo`
    * record and holding one `response` record per doc (URI, date, and
    * body all derived from the row, so the q118 oracle replays every
    * field from the documents table alone). Bodies are the docs' UTF-8
    * bytes — Content-Length is OCTETS, which is exactly the
    * chars-vs-bytes seam the multilingual fixture exercises. */
  def warcFilesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select((col("doc_id") / 8).cast("long").as("blob_id"),
        col("doc_id").cast("long").as("doc_id"), col("text"))
      .groupBy("blob_id")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
        .as("docs"))
      .map { row =>
        val blobId = row.getLong(0)
        val out = new java.io.ByteArrayOutputStream()
        out.write(Warc.writeRecord("warcinfo", null,
          "2024-01-01T00:00:00Z",
          s"software: graft-fixture\r\nblob: $blobId".getBytes("UTF-8")))
        row.getSeq[org.apache.spark.sql.Row](1).foreach { d =>
          val id = d.getLong(0)
          out.write(Warc.writeRecord("response",
            s"http://example.com/doc/$id",
            f"2024-01-${1 + id % 28}%02dT00:00:00Z",
            d.getString(1).getBytes("UTF-8")))
        }
        MediaRow(blobId, "warc", out.toByteArray)
      }
  }

  /** Parse WARC blobs to one row per record (quarantine semantics: an
    * off-grammar blob yields zero rows). Body is surfaced as UTF-8 text
    * plus its octet length — the md5 downstream hashes the raw bytes.
    * `gzipped = true` expects Common Crawl's `.warc.gz` framing —
    * concatenated per-record gzip members — and quarantines blobs whose
    * gzip layer is corrupt (bad magic, truncated member, CRC mismatch)
    * before the grammar even runs. */
  def extractWarcRecords(
      media: Dataset[MediaRow], gzipped: Boolean = false): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val raw =
        if (gzipped) Warc.gunzipAll(r.payload)
        else Some(r.payload)
      raw.flatMap(Warc.parse).toSeq.flatten.map { rec =>
        (rec.warc_type, rec.target_uri, rec.warc_date, rec.content_length,
          new String(rec.body, "UTF-8"))
      }
    }.toDF("warc_type", "target_uri", "warc_date", "n_bytes", "body")
  }

  /** As [[extractWarcRecords]], but the body stays RAW BYTES — the shape
    * charset sniffing needs (decoding is exactly the step under test
    * downstream; a premature UTF-8 cast would mojibake every legacy-
    * charset page before the sniffer ever saw it). */
  def extractWarcRecordBytes(
      media: Dataset[MediaRow], gzipped: Boolean = false): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val raw =
        if (gzipped) Warc.gunzipAll(r.payload)
        else Some(r.payload)
      raw.flatMap(Warc.parse).toSeq.flatten.map { rec =>
        (rec.warc_type, rec.target_uri, rec.warc_date, rec.content_length,
          rec.body)
      }
    }.toDF("warc_type", "target_uri", "warc_date", "n_bytes", "body")
  }

  /** Mixed-charset HTTP-response WARC fixture (q231/q232): each doc
    * becomes a full HTTP/1.1 response payload (status line,
    * Content-Type, CRLFCRLF, encoded body) inside a WARC response
    * record — the byte shape a real crawl delivers. Charset regimes are
    * planted by id formula so the oracle can replay every fate:
    *
    *   - doc_id % 11 == 7 (hostile): header DECLARES utf-8, body is
    *     latin-1 bytes (" café", 0xE9) → strict decode must reject;
    *   - else doc_id % 8 == 0: utf-8 via Content-Type header;
    *   - 1: windows-1252 via in-document meta prescan (header is bare
    *     text/html), body carries € (0x80) and ™ (0x99);
    *   - 2: iso-8859-1 via Content-Type header, body carries é and ±;
    *   - 3: UTF-16LE with BOM while the header WRONGLY declares
    *     iso-8859-1 — the BOM must outrank it;
    *   - 4: no declaration anywhere; the body is valid multi-byte UTF-8
    *     (" ünïcode"), accepted by strict validation;
    *   - 5: Shift-JIS via header (double-byte kana/kanji);
    *   - 6: GBK via meta prescan (double-byte hanzi);
    *   - 7: EUC-KR via header (double-byte hangul).
    */
  def httpWarcMixedCharsetFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    def encode(id: Long, text: String): (Array[Byte], String) =
      if (id % 11 == 7)
        ((text + " café").getBytes("ISO-8859-1"), "text/html; charset=utf-8")
      else (id % 8) match {
        case 0 => ((text + " héllo").getBytes("UTF-8"),
          "text/html; charset=utf-8")
        case 1 => (("<meta charset=windows-1252>" + text + " €uro™")
          .getBytes("windows-1252"), "text/html")
        case 2 => ((text + " café ±").getBytes("ISO-8859-1"),
          "text/plain; charset=ISO-8859-1")
        case 3 =>
          val b = (text + " snow☃").getBytes("UTF-16LE")
          val out = new Array[Byte](b.length + 2)
          out(0) = 0xFF.toByte; out(1) = 0xFE.toByte
          System.arraycopy(b, 0, out, 2, b.length)
          (out, "text/html; charset=iso-8859-1")
        case 4 => ((text + " ünïcode").getBytes("UTF-8"), "text/html")
        case 5 => ((text + " こんにちは").getBytes("Shift_JIS"),
          "text/html; charset=Shift_JIS")
        case 6 => (("<meta charset=gbk>" + text + " 中文测试").getBytes("GBK"),
          "text/html")
        case _ => ((text + " 한국어").getBytes("EUC-KR"),
          "text/plain; charset=euc-kr")
      }
    documents.select((col("doc_id") / 8).cast("long").as("blob_id"),
        col("doc_id").cast("long").as("doc_id"), col("text"))
      .groupBy("blob_id")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("text"))))
        .as("docs"))
      .map { row =>
        val blobId = row.getLong(0)
        val out = new java.io.ByteArrayOutputStream()
        row.getSeq[org.apache.spark.sql.Row](1).foreach { d =>
          val id = d.getLong(0)
          val (rawBody, ct) = encode(id, d.getString(1))
          // Content-Encoding layer (id-rotated): brotli / zstd / gzip /
          // zlib-deflate / raw-deflate members decode transparently
          // before the charset gate (the br rows carry REAL RFC 7932
          // streams from graft's own encoder — round 12; the zstd rows
          // REAL RFC 8878 streams from zstd-jni with the XXH64
          // checksum on — round 13, the RFC 9659 content coding);
          // truncated gzip and truncated zstd members exercise the
          // named rejections. Precedence mirrors the q231/q232/q240
          // oracles' CASE order exactly.
          def gz(b: Array[Byte]): Array[Byte] = {
            val bos = new java.io.ByteArrayOutputStream()
            val g = new java.util.zip.GZIPOutputStream(bos)
            g.write(b); g.close()
            bos.toByteArray
          }
          def defl(b: Array[Byte], raw: Boolean): Array[Byte] = {
            val df = new java.util.zip.Deflater(
              java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
            df.setInput(b); df.finish()
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](16 * 1024)
            while (!df.finished()) bos.write(buf, 0, df.deflate(buf))
            df.end()
            bos.toByteArray
          }
          def zstdC(b: Array[Byte]): Array[Byte] = {
            val ctx = new com.github.luben.zstd.ZstdCompressCtx()
            ctx.setLevel(3); ctx.setChecksum(true)
            try ctx.compress(b) finally ctx.close()
          }
          val (body, encHeader) =
            if (id % 29 == 17)
              // multi-coding chain: br applied first, gzip second
              // (RFC 9110 order) — the decoder undoes right-to-left
              (gz(Brotli.encode(rawBody)), "Content-Encoding: br, gzip\r\n")
            else if (id % 31 == 5)
              // zstd-in-chain, with mixed-case tokens: RFC 9110 §8.4.1
              // says codings are case-insensitive, so the gate must
              // decode 'Zstd, GZIP' exactly as 'zstd, gzip'
              (gz(zstdC(rawBody)), "Content-Encoding: Zstd, GZIP\r\n")
            else if (id % 13 == 11)
              (Brotli.encode(rawBody), "Content-Encoding: br\r\n")
            else if (id % 19 == 3)
              (zstdC(rawBody), "Content-Encoding: zstd\r\n")
            else if (id % 37 == 9) {
              // truncated zstd member: the XXH64 checksum is on, so
              // chopping the tail lands in truncated_checksum or
              // truncated_block — the named truncation fate either way
              val z = zstdC(rawBody)
              (java.util.Arrays.copyOf(z, math.max(4, z.length - 5)),
                "Content-Encoding: zstd\r\n")
            } else if (id % 17 == 13) {
              val g = gz(rawBody)
              (java.util.Arrays.copyOf(g, math.max(4, g.length - 5)),
                "Content-Encoding: gzip\r\n")
            } else if (id % 7 == 2) (gz(rawBody), "Content-Encoding: gzip\r\n")
            else if (id % 7 == 4)
              (defl(rawBody, raw = false), "Content-Encoding: deflate\r\n")
            else if (id % 23 == 21)
              (defl(rawBody, raw = true), "Content-Encoding: deflate\r\n")
            else if (id % 41 == 11) {
              // bzip2 via the real encoder (commons-compress) — decoded
              // by the from-scratch graft.operators.Bzip2 (round 13)
              val bos = new java.io.ByteArrayOutputStream()
              val z = new org.apache.commons.compress.compressors.bzip2
                .BZip2CompressorOutputStream(bos, 5)
              z.write(rawBody); z.close()
              (bos.toByteArray, "Content-Encoding: bzip2\r\n")
            } else (rawBody, "")
          val head = (s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n" + encHeader +
            s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1")
          val payload = new Array[Byte](head.length + body.length)
          System.arraycopy(head, 0, payload, 0, head.length)
          System.arraycopy(body, 0, payload, head.length, body.length)
          out.write(Warc.writeRecord("response",
            s"http://example.com/doc/$id",
            f"2024-01-${1 + id % 28}%02dT00:00:00Z", payload))
        }
        MediaRow(blobId, "warc", out.toByteArray)
      }
  }

  /** The q118 WARC blobs in Common Crawl's actual wire framing: each
    * record compressed as its OWN gzip member, members concatenated —
    * the layout that lets a reader seek to any record boundary. Parsed
    * output is identical to q118's, so q121 shares its oracle verbatim. */
  def warcGzFilesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    warcFilesFromDocuments(spark, documents).map { r =>
      // re-frame the blob: split back into records and gzip each one as
      // its own member (writeRecord framing is deterministic, so the
      // parse here cannot fail on our own output)
      val records = Warc.parse(r.payload).get
      val out = new java.io.ByteArrayOutputStream()
      records.foreach { rec =>
        out.write(Warc.gzipMember(Warc.writeRecord(
          rec.warc_type, rec.target_uri, rec.warc_date, rec.body)))
      }
      MediaRow(r.media_id, "warc.gz", out.toByteArray)
    }
  }

  /** ANIMATED GIF fixtures (doc_id % 3 == 0): 2-4 full-canvas frames
    * over one global palette, each frame's index pattern shifted by
    * 11·frame so a decoder that drops, reorders, or double-reads frames
    * breaks some frame's channel sums. Graphic-control extensions carry
    * per-frame delays — the extension-skip path runs between every
    * frame, not just at the head. */
  def gifAnimatedFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 20).toInt
        val h = 4 + (id % 15).toInt
        val palette = Array.tabulate(8) { c =>
          (((id * 17 + 29L * c) % 256).toInt << 16) |
            (((id * 23 + 31L * c) % 256).toInt << 8) |
            ((id * 13 + 37L * c) % 256).toInt
        }
        val frames = (0 until (2 + (id % 3).toInt)).map { f =>
          Array.tabulate(w * h) { k =>
            ((id + 3L * (k % w) + 7L * (k / w) + 11L * f) % 8).toByte
          }
        }
        MediaRow(id, "animation", Gif.encodeAnimated(w, h, palette, frames))
      })
  }

  /** Per-FRAME RGB stats of animated GIFs (quarantine semantics). */
  def decodeGifFrameStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Gif.decodeFrames(r.payload).toSeq.flatMap {
        case (w, h, palette, frames) =>
          frames.zipWithIndex.map { case (idx, fi) =>
            var rs = 0L; var gs = 0L; var bs = 0L
            var k = 0
            while (k < w * h) {
              val c = palette(idx(k) & 0xff)
              rs += (c >> 16) & 0xff; gs += (c >> 8) & 0xff; bs += c & 0xff
              k += 1
            }
            (r.media_id, fi, w * h, rs, gs, bs)
          }
      }
    }).toDF("media_id", "frame_idx", "n_px", "r_sum", "g_sum", "b_sum")
  }

  def decodeGifRgbStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Gif.decodeRgb(r.payload).iterator.map { case (w, h, rgb) =>
        var rs = 0L; var gs = 0L; var bs = 0L
        var k = 0
        while (k < w * h) {
          rs += rgb(3 * k) & 0xff
          gs += rgb(3 * k + 1) & 0xff
          bs += rgb(3 * k + 2) & 0xff
          k += 1
        }
        (r.media_id, w * h, rs, gs, bs)
      }
    }).toDF("media_id", "n_px", "r_sum", "g_sum", "b_sum")
  }

  /** MCU-flat baseline 4:2:0 color-JPEG fixtures (doc_id % 3 == 2):
    * w ∈ {16, 32}, h ∈ {16, 32, 48}; Y is flat per 8x8 block at
    * (id + 5·bx + 9·by) mod 256, chroma flat per 16x16 MCU at
    * (3id + 7·mx + 11·my) / (5id + 13·mx + 3·my) mod 256. Flat regions
    * survive subsampling + DCT + DC-quant-8 EXACTLY (see [[Jpeg]]), so
    * the q105 oracle recomputes every decoded RGB pixel from id
    * arithmetic plus the codec's fixed-point YCbCr→RGB — while the
    * decoder runs real multi-component Huffman, MCU interleave, and
    * upsampling over a genuinely entropy-coded stream. */
  /** q93's block-flat streams re-encoded PROGRESSIVE (q233): the same
    * pixel formulas, so q93's pixel-replay oracle applies verbatim —
    * flat blocks are DC-only spectra, exact through the lossy transform
    * at DC quant step 8 — while the decoder runs the full Annex-G
    * machinery: successive-approximation DC (two passes), banded AC
    * first scans whose all-zero bands become maximal cross-block EOB
    * runs, AC refinement passes, and (on even ids) restart markers
    * inside every progressive scan. */
  def jpegProgressiveImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 1).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 * (1 + (id % 2).toInt)
        val h = 8 * (1 + (id % 3).toInt)
        val px = Array.tabulate(w * h) { k =>
          val bx = (k % w) / 8; val by = (k / w) / 8
          ((id + 5L * bx + 9L * by) % 256).toByte
        }
        val ri = if (id % 2 == 0) 1 + (id % 3).toInt else 0
        MediaRow(id, "image",
          JpegProgressive.encodeGray(w, h, px, restartInterval = ri))
      })
  }

  /** q105's MCU-flat color streams re-encoded PROGRESSIVE (q234): same
    * pixel formulas and quant tables, so q105's RGB-replay oracle
    * applies verbatim; the decode runs interleaved progressive DC over
    * 4:2:0 geometry plus per-component non-interleaved AC scans. */
  def jpegProgressiveColorImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 * (1 + (id % 2).toInt)
        val h = 16 * (1 + (id % 3).toInt)
        def plane(f: (Int, Int) => Long) = Array.tabulate(w * h) { k =>
          (f(k % w, k / w) % 256).toByte
        }
        val yP = plane((x, y) => id + 5L * (x / 8) + 9L * (y / 8))
        val cbP = plane((x, y) => id * 3 + 7L * (x / 16) + 11L * (y / 16))
        val crP = plane((x, y) => id * 5 + 13L * (x / 16) + 3L * (y / 16))
        MediaRow(id, "image", JpegProgressive.encodeColor420(w, h, yP, cbP, crP))
      })
  }

  /** WebP-lossless (VP8L) fixtures (q235): id-arithmetic RGB planes at
    * arbitrary (non-aligned) dimensions, with the ENCODING FEATURE MIX
    * rotating by id (id % 7) so every decoder path runs against the
    * same pixel-replay oracle: plain+cache / no-LZ77+subtract-green /
    * predictor transform / cross-color transform / color-indexed
    * palette (its own reduced-color formula, oracle CASEd the same
    * way) / all three pixel transforms stacked / two-group meta prefix
    * codes. Lossless, so the oracle replays every channel sum exactly
    * (the GIF/PNG pattern, not the JPEG flat-block workaround). */
  def webpImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 20).toInt
        val h = 4 + (id % 15).toInt
        val mode = (id % 7).toInt
        val px =
          if (mode == 4) { // palette regime: few distinct colors
            val nColors = 2 + (id % 30).toInt
            Array.tabulate(w * h) { k =>
              val x = k % w; val y = k / w
              val ci = ((id + 3 * x + 7 * y) % nColors).toInt
              val r = ((id * 17 + 29 * ci) % 256).toInt
              val g = ((id * 23 + 31 * ci) % 256).toInt
              val b = ((id * 13 + 37 * ci) % 256).toInt
              (0xff << 24) | (r << 16) | (g << 8) | b
            }
          } else Array.tabulate(w * h) { k =>
            val x = k % w; val y = k / w
            val r = ((id * 17 + 29 * x + 3 * y) % 256).toInt
            val g = ((id * 23 + 31 * y + 5 * x) % 256).toInt
            val b = ((id * 13 + 37 * (x / 3) + 7 * (y / 2)) % 256).toInt
            (0xff << 24) | (r << 16) | (g << 8) | b
          }
        val blob = mode match {
          case 0 => Vp8l.encode(w, h, px, cacheBits = 4 + (id % 5).toInt)
          case 1 => Vp8l.encode(w, h, px, lz77 = false, subtractGreen = true)
          case 2 => Vp8l.encode(w, h, px, cacheBits = 3,
            predictorBits = 2 + (id % 4).toInt)
          case 3 => Vp8l.encode(w, h, px, colorBits = 3)
          case 4 => Vp8l.encode(w, h, px, palette = true, lz77 = false)
          case 5 => Vp8l.encode(w, h, px, cacheBits = 4, predictorBits = 3,
            colorBits = 4, subtractGreen = true)
          case _ => Vp8l.encode(w, h, px, cacheBits = 3, metaSplitBits = 2)
        }
        MediaRow(id, "image", blob)
      })
  }

  /** VP8L decode to per-image RGB channel sums (q111's aggregate shape);
    * rejects yield no rows. */
  def decodeWebpRgbStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Vp8l.decode(r.payload).toOption.iterator.map { case (w, h, px) =>
        var rs = 0L; var gs = 0L; var bs = 0L
        var k = 0
        while (k < w * h) {
          rs += (px(k) >> 16) & 0xff
          gs += (px(k) >> 8) & 0xff
          bs += px(k) & 0xff
          k += 1
        }
        (r.media_id, w * h, rs, gs, bs)
      }
    }).toDF("media_id", "n_px", "r_sum", "g_sum", "b_sum")
  }

  /** WebP-LOSSY (VP8) fixtures (q239): key frames from the exactness
    * encoder — DC-only residuals at quantizer 0, where dequant + IWHT +
    * IDCT are integer identities, so the decoder must reproduce the
    * per-macroblock target formulas BIT-FOR-BIT (Vp8.encode scaladoc).
    * Sizes include ragged (non-MB-multiple) crops; the token-partition
    * count rotates 1/2/4 and every fourth row exercises the segment
    * map. Full real-stream coverage (probability updates, loop filter,
    * every encoder-chosen mode) is pinned separately by Vp8InteropSpec
    * against libwebp-produced files. */
  def webpLossyImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 1).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 5).toInt * 16 + (id % 7).toInt
        val h = 16 + (id % 3).toInt * 16 + (id % 5).toInt
        val plain = Vp8.encode(w, h,
          (mx, my) => ((id * 7 + 29 * mx + 31 * my) % 256).toInt,
          (mx, my) => ((id * 11 + 13 * mx + 17 * my) % 256).toInt,
          (mx, my) => ((id * 5 + 19 * mx + 23 * my) % 256).toInt,
          nTokenParts = 1 << (id % 3).toInt,
          withSegmentation = id % 4 == 1)
        // every fifth row ships as VP8X + ALPH with a per-pixel alpha
        // formula, forward-filtered by id so every inverse filter
        // (none/horizontal/vertical/gradient) is oracle-gated
        val blob =
          if (id % 5 == 2) {
            val alpha = Array.tabulate[Byte](w * h) { k =>
              val px = k % w; val py = k / w
              ((id * 3 + 7 * px + 11 * py) % 256).toByte
            }
            Vp8.wrapWithAlpha(plain, alpha, w, h, filter = (id % 4).toInt)
          } else plain
        MediaRow(id, "image", blob)
      })
  }

  /** q244's fixture: lossy WebP with CONSTANT chroma planes — the shape
    * whose fancy upsampling is an exact pass-through (a 9/3/3/1 average
    * of a constant is the constant), so the SQL oracle can apply the
    * libwebp fixed-point matrix to (yFormula, cu, cv) directly. The
    * varying-chroma upsampler itself is pinned sample-exactly against
    * real libwebp RGBA dumps in WebpRgbSpec (the q239 split). Every
    * fifth row carries an ALPH plane so the A channel of the RGBA
    * output is oracle-gated too. */
  def webpLossyConstChromaFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 5).toInt * 16 + (id % 7).toInt
        val h = 16 + (id % 3).toInt * 16 + (id % 5).toInt
        val plain = Vp8.encode(w, h,
          (mx, my) => ((id * 7 + 29 * mx + 31 * my) % 256).toInt,
          (_, _) => ((id * 11 + 37) % 256).toInt,
          (_, _) => ((id * 19 + 53) % 256).toInt,
          nTokenParts = 1 << (id % 3).toInt)
        val blob =
          if (id % 5 == 2) {
            val alpha = Array.tabulate[Byte](w * h) { k =>
              val px = k % w; val py = k / w
              ((id * 3 + 7 * px + 11 * py) % 256).toByte
            }
            Vp8.wrapWithAlpha(plain, alpha, w, h, filter = (id % 4).toInt)
          } else plain
        MediaRow(id, "image", blob)
      })
  }

  /** Lossy WebP decode all the way to RGBA (the WebPDecodeRGBA-pinned
    * color space): per-image RGBA channel sums. Rejects yield no rows. */
  def decodeWebpRgbaStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Vp8.decode(r.payload).toOption.iterator.map { yuv =>
        val rgba = WebpRgb.toRgba(yuv)
        var rs = 0L; var gs = 0L; var bs = 0L; var as = 0L
        var k = 0
        while (k < rgba.length) {
          rs += rgba(k) & 0xff
          gs += rgba(k + 1) & 0xff
          bs += rgba(k + 2) & 0xff
          as += rgba(k + 3) & 0xff
          k += 4
        }
        (r.media_id, yuv.w * yuv.h, rs, gs, bs, as)
      }
    }).toDF("media_id", "n_px", "r_sum", "g_sum", "b_sum", "a_sum")
  }

  /** VP8 lossy decode to per-image YUV plane sums; rejects yield no
    * rows. Sums are over the CROPPED planes (luma w x h, chroma
    * ceil-half dims) — the oracle replays them from the target
    * formulas. */
  def decodeWebpLossyYuvStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Vp8.decode(r.payload).toOption.iterator.map { yuv =>
        var ys = 0L; var us = 0L; var vs = 0L
        var k = 0
        while (k < yuv.y.length) { ys += yuv.y(k) & 0xff; k += 1 }
        k = 0
        while (k < yuv.u.length) {
          us += yuv.u(k) & 0xff; vs += yuv.v(k) & 0xff; k += 1
        }
        // -1 distinguishes "no alpha plane" from an all-zero one
        val as = yuv.alpha.map(_.foldLeft(0L)((acc, b) => acc + (b & 0xff)))
          .getOrElse(-1L)
        (r.media_id, yuv.y.length, ys, us, vs, as)
      }
    }).toDF("media_id", "n_px", "y_sum", "u_sum", "v_sum", "a_sum")
  }

  def jpegColorImagesFromDocuments(
      spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 * (1 + (id % 2).toInt)
        val h = 16 * (1 + (id % 3).toInt)
        def plane(f: (Int, Int) => Long) = Array.tabulate(w * h) { k =>
          (f(k % w, k / w) % 256).toByte
        }
        val yP = plane((x, y) => id + 5L * (x / 8) + 9L * (y / 8))
        val cbP = plane((x, y) => id * 3 + 7L * (x / 16) + 11L * (y / 16))
        val crP = plane((x, y) => id * 5 + 13L * (x / 16) + 3L * (y / 16))
        MediaRow(id, "image", Jpeg.encodeColor420(w, h, yP, cbP, crP))
      })
  }

  /** Color-JPEG decode to per-image RGB channel sums (the brightness /
    * colorfulness aggregate). Undecodable or grayscale payloads yield no
    * rows. */
  def decodeJpegRgbStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      Jpeg.decodeRgb(r.payload).iterator.map { case (w, h, rgb) =>
        var rs = 0L; var gs = 0L; var bs = 0L
        var k = 0
        while (k < w * h) {
          rs += rgb(3 * k) & 0xff
          gs += rgb(3 * k + 1) & 0xff
          bs += rgb(3 * k + 2) & 0xff
          k += 1
        }
        (r.media_id, w * h, rs, gs, bs)
      }
    }).toDF("media_id", "n_px", "r_sum", "g_sum", "b_sum")
  }

  /** Color PNG decode (truecolor + palette) to per-image channel
    * statistics: pixel count and exact per-channel byte sums — the
    * aggregate a curation pipeline derives brightness/colorfulness
    * features from, and one the q92 oracle can replay from fixture
    * arithmetic. Undecodable or non-RGB payloads yield no rows. */
  def decodePngChannelStats(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      pngDecode(r.payload).iterator.collect {
        case img if img.channels == 3 =>
          var rs = 0L; var gs = 0L; var bs = 0L
          var k = 0
          while (k < img.px.length) {
            rs += img.px(k) & 0xff
            gs += img.px(k + 1) & 0xff
            bs += img.px(k + 2) & 0xff
            k += 3
          }
          (r.media_id, img.color_type, img.w * img.h, rs, gs, bs)
      }
    }).toDF("media_id", "color_type", "n_px", "r_sum", "g_sum", "b_sum")
  }

  /** Color-fixture twin of [[imagesFromDocuments]] (doc_id % 3 == 0):
    * even ids become TRUECOLOR PNGs with channel c of pixel (y, x) =
    * (id + 3x + 7y + 11c) mod 256; odd ids become PALETTE PNGs over
    * nPal = 4 + id%5 entries, index(y, x) = (x + 2y) mod nPal, palette
    * entry j channel c = (id + 13j + 11c) mod 256. Both payloads are
    * genuinely deflate-compressed, filter-cycled, CRC'd PNGs; the id
    * arithmetic is what lets the q92 oracle recompute every decoded
    * channel byte without touching a codec. */
  def colorImagesFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 5).toInt
        val h = 3 + (id % 4).toInt
        val payload =
          if (id % 2 == 0) {
            val rgb = new Array[Byte](w * h * 3)
            var k = 0
            while (k < w * h) {
              val x = k % w; val y = k / w
              var c = 0
              while (c < 3) {
                rgb(k * 3 + c) = ((id + 3L * x + 7L * y + 11L * c) % 256).toByte
                c += 1
              }
              k += 1
            }
            pngRgb(w, h, rgb)
          } else {
            val nPal = 4 + (id % 5).toInt
            val pal = Array.tabulate(nPal * 3)(j =>
              ((id + 13L * (j / 3) + 11L * (j % 3)) % 256).toByte)
            val idx = Array.tabulate(w * h)(k =>
              ((k % w + 2 * (k / w)) % nPal).toByte)
            pngIndexed(w, h, idx, pal)
          }
        MediaRow(id, "image", payload)
      })
  }

  /** Every images-fixture doc (doc_id % 3 == 2) as a REAL grayscale PNG
    * with id-derived dims and pixels — w = 5 + id%4, h = 4 + id%3,
    * pixel(y, x) = (id + 3x + 7y) mod 256 — the still-image twin of
    * [[videosFromDocuments]], but the payload is genuinely compressed
    * and filtered, not a stand-in container. */
  def imagesFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 2).select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 4).toInt
        val h = 4 + (id % 3).toInt
        val px = Array.tabulate(w * h)(i =>
          ((id + 3L * (i % w) + 7L * (i / w)) % 256).toByte)
        MediaRow(id, "image", pngGray(w, h, px))
      })
  }
}
