package graft.operators

/** Ogg container walk + Vorbis/Opus identification & comment census —
  * the audio family decodes WAV/PCM/G.711/ADPCM/FLAC and the MP3
  * layers, but had no Ogg page walk. Grammar per the public RFC 3533
  * (Ogg) + Vorbis I and RFC 7845 (Opus-in-Ogg) specs:
  *
  *   page    = "OggS" + version 0 + type flags (continued/BOS/EOS) +
  *             granule (8) + serial (4) + sequence (4) + CRC (4) +
  *             segment count + lacing table + payload
  *   packets = lacing runs: 255 continues, <255 terminates
  *   CRC     = CRC-32, polynomial 0x04C11DB7, UNREFLECTED, init 0,
  *             no final xor, CRC field zeroed during computation —
  *             deliberately not the zlib CRC, implemented here
  *
  * BOS packets identify the codec: `vorbis` (version, channels,
  * rate from the id header), `OpusHead` (channels, pre-skip, input
  * rate; granules always tick at 48 kHz), `theora` (recognized,
  * census-only). The second packet carries the comment header
  * (`vorbis` / `OpusTags`): vendor string + user comment list,
  * both length-prefixed LE. Sample DECODE rejects by name
  * (`vorbis_samples_unsupported` / `opus_samples_unsupported`) — the
  * census is container truth, not a guessed decoder.
  *
  * Reject-don't-guess: bad magic/version, a CRC mismatch, a lacing
  * table overrunning the blob, a continued-packet flag contradiction,
  * or a non-BOS first page for a serial all quarantine by name.
  * Multiplexed (interleaved serials) and chained (EOS then new BOS)
  * streams both walk. No system ogg tooling exists here — the
  * construct-and-cross-check playbook applies (writer emits
  * spec-faithful pages incl. the real CRC; hostile specs mutate).
  */
object Ogg {

  final case class Stream(
      serial: Long,
      codec: String, // vorbis / opus / theora / unknown
      channels: Int,
      sampleRate: Int, // vorbis: id header; opus: input rate
      preSkip: Int, // opus only
      nPages: Long,
      nPackets: Long,
      lastGranule: Long,
      durationMs: Long, // from granules (48 kHz for opus)
      vendor: String,
      nComments: Int,
      sampleFate: String)

  final case class Info(nPages: Long, streams: Seq[Stream])

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // Ogg CRC-32: unreflected 0x04C11DB7, init 0, no xor-out
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04C11DB7 else r << 1
        k += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  private[operators] def crc(b: Array[Byte], off: Int, len: Int,
      zeroAt: Int = -1): Int = {
    var r = 0
    var i = off
    while (i < off + len) {
      val byte = if (zeroAt >= 0 && i - off >= zeroAt && i - off < zeroAt + 4)
        0 else b(i) & 0xff
      r = (r << 8) ^ CrcTable(((r >>> 24) ^ byte) & 0xff)
      i += 1
    }
    r
  }

  private def u32le(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def u64le(b: Array[Byte], p: Int): Long =
    u32le(b, p) | (u32le(b, p + 4) << 32)

  private final class StreamState(val serial: Long) {
    var codec = "unknown"
    var channels = 0
    var sampleRate = 0
    var preSkip = 0
    var nPages = 0L
    var nPackets = 0L
    var lastGranule = 0L
    var vendor = ""
    var nComments = 0
    var packetIndex = 0 // 0 = id header, 1 = comment header
    var partial: java.io.ByteArrayOutputStream = null
    var expectSeq = 0L
    var closed = false
  }

  def census(bytes: Array[Byte], maxPages: Int = 1 << 20): Either[String, Info] =
    try {
      if (bytes == null || bytes.length < 28) bail("truncated_ogg")
      val streams = scala.collection.mutable.LinkedHashMap
        .empty[Long, StreamState]
      var i = 0
      var nPages = 0L
      while (i < bytes.length) {
        if (i + 27 > bytes.length) bail("truncated_ogg")
        if (bytes(i) != 'O' || bytes(i + 1) != 'g' || bytes(i + 2) != 'g' ||
          bytes(i + 3) != 'S') bail("not_ogg")
        if (bytes(i + 4) != 0) bail("ogg_version_unsupported")
        val flags = bytes(i + 5) & 0xff
        val granule = u64le(bytes, i + 6)
        val serial = u32le(bytes, i + 14)
        val seq = u32le(bytes, i + 18)
        val wantCrc = u32le(bytes, i + 22).toInt
        val nSegs = bytes(i + 26) & 0xff
        if (i + 27 + nSegs > bytes.length) bail("truncated_ogg")
        var payloadLen = 0
        var k = 0
        while (k < nSegs) { payloadLen += bytes(i + 27 + k) & 0xff; k += 1 }
        val pageLen = 27 + nSegs + payloadLen
        if (i + pageLen > bytes.length) bail("truncated_ogg")
        if (crc(bytes, i, pageLen, zeroAt = 22) != wantCrc)
          bail("page_crc_mismatch")
        nPages += 1
        if (nPages > maxPages) bail("ogg_bomb")

        val isBos = (flags & 0x02) != 0
        val isContinued = (flags & 0x01) != 0
        val st = streams.get(serial) match {
          case Some(x) =>
            if (isBos && !x.closed) bail("duplicate_bos")
            x
          case None =>
            if (!isBos) bail("data_before_bos")
            val x = new StreamState(serial)
            streams(serial) = x
            x
        }
        if (isBos && st.closed) { // chained stream reuses the serial
          st.closed = false
          st.packetIndex = 0
          st.partial = null
          st.expectSeq = seq
        }
        if (seq != st.expectSeq) bail("page_sequence_gap")
        st.expectSeq = seq + 1
        st.nPages += 1
        if (granule != -1L && granule > st.lastGranule)
          st.lastGranule = granule
        if ((flags & 0x04) != 0) st.closed = true

        // packet reassembly through the lacing table
        if (isContinued && st.partial == null) bail("bad_continued_page")
        if (!isContinued && st.partial != null) bail("lost_packet_tail")
        var p = i + 27 + nSegs
        k = 0
        var segStart = 0
        while (k < nSegs) {
          val lace = bytes(i + 27 + k) & 0xff
          if (st.partial == null)
            st.partial = new java.io.ByteArrayOutputStream()
          st.partial.write(bytes, p + segStart, lace)
          segStart += lace
          if (lace < 255) {
            packet(st, st.partial.toByteArray)
            st.partial = null
            st.nPackets += 1
          }
          k += 1
        }
        i += pageLen
      }
      val out = streams.values.map { st =>
        val durationMs = st.codec match {
          case "opus" =>
            // opus granules tick at 48 kHz regardless of input rate
            math.max(0L, (st.lastGranule - st.preSkip) * 1000 / 48000)
          case "vorbis" if st.sampleRate > 0 =>
            st.lastGranule * 1000 / st.sampleRate
          case _ => -1L
        }
        Stream(st.serial, st.codec, st.channels, st.sampleRate, st.preSkip,
          st.nPages, st.nPackets, st.lastGranule, durationMs, st.vendor,
          st.nComments, s"${st.codec}_samples_unsupported")
      }.toSeq
      Right(Info(nPages, out))
    } catch { case e: Bail => Left(e.reason) }

  /** Interpret the stream's header packets (id, then comments). */
  private def packet(st: StreamState, pkt: Array[Byte]): Unit = {
    if (st.packetIndex == 0) {
      if (pkt.length >= 7 && (pkt(0) & 0xff) == 0x01 &&
        new String(pkt, 1, 6, "ISO-8859-1") == "vorbis") {
        if (pkt.length < 30) bail("truncated_id_header")
        st.codec = "vorbis"
        st.channels = pkt(11) & 0xff
        st.sampleRate = u32le(pkt, 12).toInt
      } else if (pkt.length >= 8 &&
        new String(pkt, 0, 8, "ISO-8859-1") == "OpusHead") {
        if (pkt.length < 19) bail("truncated_id_header")
        st.codec = "opus"
        st.channels = pkt(9) & 0xff
        st.preSkip = (pkt(10) & 0xff) | ((pkt(11) & 0xff) << 8)
        st.sampleRate = u32le(pkt, 12).toInt
      } else if (pkt.length >= 7 && (pkt(0) & 0xff) == 0x80 &&
        new String(pkt, 1, 6, "ISO-8859-1") == "theora") {
        st.codec = "theora"
      }
    } else if (st.packetIndex == 1 && st.codec != "unknown") {
      // comment header: [magic] vendor_len vendor n (len data)*
      val off = st.codec match {
        case "vorbis" =>
          if (pkt.length < 7 || (pkt(0) & 0xff) != 0x03 ||
            new String(pkt, 1, 6, "ISO-8859-1") != "vorbis")
            bail("missing_comment_header")
          7
        case "opus" =>
          if (pkt.length < 8 ||
            new String(pkt, 0, 8, "ISO-8859-1") != "OpusTags")
            bail("missing_comment_header")
          8
        case _ => -1
      }
      if (off >= 0) {
        if (off + 4 > pkt.length) bail("truncated_comment_header")
        val vlen = u32le(pkt, off).toInt
        if (vlen < 0 || off + 4 + vlen + 4 > pkt.length)
          bail("truncated_comment_header")
        st.vendor = new String(pkt, off + 4, vlen, "UTF-8")
        var p = off + 4 + vlen
        val n = u32le(pkt, p).toInt
        p += 4
        if (n < 0 || n > (1 << 16)) bail("truncated_comment_header")
        var k = 0
        while (k < n) {
          if (p + 4 > pkt.length) bail("truncated_comment_header")
          val len = u32le(pkt, p).toInt
          p += 4
          if (len < 0 || p + len > pkt.length)
            bail("truncated_comment_header")
          p += len
          k += 1
        }
        st.nComments = n
      }
    }
    st.packetIndex += 1
  }

  // ==================================================================
  // Fixture writer
  // ==================================================================

  private def page(serial: Long, seq: Long, granule: Long, flags: Int,
      packets: Seq[Array[Byte]]): Array[Byte] = {
    val laces = Seq.newBuilder[Int]
    packets.foreach { p =>
      var rem = p.length
      while (rem >= 255) { laces += 255; rem -= 255 }
      laces += rem // < 255 terminates (0 for empty/multiple-of-255)
    }
    val lacing = laces.result()
    require(lacing.length <= 255, "fixture page too segmented")
    val payload = packets.foldLeft(Array.emptyByteArray)(_ ++ _)
    val out = new Array[Byte](27 + lacing.length + payload.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(5) = flags.toByte
    var k = 0
    while (k < 8) { out(6 + k) = (granule >> (8 * k)).toByte; k += 1 }
    k = 0
    while (k < 4) {
      out(14 + k) = (serial >> (8 * k)).toByte
      out(18 + k) = (seq >> (8 * k)).toByte
      k += 1
    }
    out(26) = lacing.length.toByte
    k = 0
    while (k < lacing.length) { out(27 + k) = lacing(k).toByte; k += 1 }
    System.arraycopy(payload, 0, out, 27 + lacing.length, payload.length)
    val c = crc(out, 0, out.length) // CRC bytes are still zero here
    k = 0
    while (k < 4) { out(22 + k) = (c >> (8 * k)).toByte; k += 1 } // LE
    out
  }

  /** Write a single-logical-stream fixture: Opus or Vorbis id header
    * (BOS), a comment header with `comments`, then `nAudioPages`
    * pages of `packetsPerPage` opaque packets (`payloadLen` bytes
    * each), EOS on the last. */
  def write(opus: Boolean, serial: Long, channels: Int, sampleRate: Int,
      comments: Seq[(String, String)], nAudioPages: Int,
      packetsPerPage: Int, payloadLen: Int, seed: Long,
      vendor: String = "graft"): Array[Byte] = {
    val id: Array[Byte] =
      if (opus) {
        val out = new Array[Byte](19)
        System.arraycopy("OpusHead".getBytes("ISO-8859-1"), 0, out, 0, 8)
        out(8) = 1 // version
        out(9) = channels.toByte
        out(10) = 0x38; out(11) = 0x01 // pre-skip 312
        var k = 0
        while (k < 4) { out(12 + k) = (sampleRate >> (8 * k)).toByte; k += 1 }
        out
      } else {
        val out = new Array[Byte](30)
        out(0) = 0x01
        System.arraycopy("vorbis".getBytes("ISO-8859-1"), 0, out, 1, 6)
        out(11) = channels.toByte
        var k = 0
        while (k < 4) { out(12 + k) = (sampleRate >> (8 * k)).toByte; k += 1 }
        out(28) = 0xB8.toByte // blocksizes
        out(29) = 0x01
        out
      }
    val commentPkt = {
      val bos = new java.io.ByteArrayOutputStream()
      if (opus) bos.write("OpusTags".getBytes("ISO-8859-1"))
      else { bos.write(0x03); bos.write("vorbis".getBytes("ISO-8859-1")) }
      def le32(v: Int): Unit =
        (0 until 4).foreach(k => bos.write((v >> (8 * k)) & 0xff))
      val vb = vendor.getBytes("UTF-8")
      le32(vb.length); bos.write(vb)
      le32(comments.length)
      comments.foreach { case (k, v) =>
        val c = s"$k=$v".getBytes("UTF-8")
        le32(c.length); bos.write(c)
      }
      if (!opus) bos.write(1) // vorbis framing bit
      bos.toByteArray
    }
    var rng = seed
    val audioPages = (0 until nAudioPages).map { pidx =>
      val packets = (0 until packetsPerPage).map { _ =>
        Array.fill[Byte](payloadLen) {
          rng = rng * 6364136223846793005L + 1442695040888963407L
          (rng >> 33).toByte
        }
      }
      val granule = (pidx + 1).toLong * 960 * packetsPerPage
      page(serial, 2 + pidx.toLong, granule,
        if (pidx == nAudioPages - 1) 0x04 else 0x00, packets)
    }
    page(serial, 0, 0, 0x02, Seq(id)) ++
      page(serial, 1, 0, 0x00, Seq(commentPkt)) ++
      audioPages.foldLeft(Array.emptyByteArray)(_ ++ _)
  }
}
