package graft.operators

/** Matroska / WebM (EBML) container census — the crawl's dominant
  * OPEN video container (MP4 box walk and AVI already exist; EBML did
  * not). Same honest-scoping pattern as the HEIF census: tracks,
  * codecs, dimensions, audio params, cluster/block counts and
  * duration all live in the container grammar — no VP8/VP9/AV1/Opus
  * entropy decode required, and SAMPLE decode rejects by name
  * (`<codec>_samples_unsupported`).
  *
  * Grammar per the public EBML (RFC 8794) + Matroska specs:
  * length-prefixed elements whose IDs and sizes are EBML varints
  * (leading-zero-count encodes width; an all-ones size payload means
  * UNKNOWN size, legal only on Segment and Cluster here — the two
  * places real muxers emit it for streaming). Elements walked:
  * EBML header (DocType/versions), Segment → Info (TimestampScale,
  * Duration, MuxingApp), Tracks → TrackEntry (number, type, CodecID,
  * Video{PixelWidth,PixelHeight}, Audio{SamplingFrequency,Channels}),
  * Cluster → SimpleBlock / BlockGroup>Block (counted, payload bytes
  * summed). SeekHead/Cues/Tags/Chapters skip as opaque.
  *
  * Reject-don't-guess: a varint with a zero marker byte, an element
  * overrunning its parent, an unknown-size element anywhere but
  * Segment/Cluster, a truncated cluster, or a missing required
  * element quarantines with a named reason. No mkvinfo/ffprobe exists
  * in this container, so per the established playbook the fixture
  * writer is spec-faithful by construction and the hostile specs
  * mutate its output into each named fate.
  */
object Ebml {

  final case class Track(
      number: Long,
      trackType: Int, // 1 video, 2 audio, 17 subtitle
      codecId: String,
      width: Int, // video only, else 0
      height: Int,
      samplingHz: Int, // audio only, else 0
      channels: Int)

  final case class Info(
      docType: String,
      docTypeVersion: Long,
      timestampScale: Long,
      durationMs: Long, // -1 when absent
      muxingApp: String,
      tracks: Seq[Track],
      nClusters: Long,
      nBlocks: Long,
      blockBytes: Long,
      sampleFate: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // element IDs (with marker bits, as they appear on the wire)
  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdDocTypeVersion = 0x4287L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdMuxingApp = 0x4D80L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L
  private val IdTimestamp = 0xE7L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L
  private val IdBlock = 0xA1L

  /** IDs that can legally follow a Cluster at Segment level — an
    * unknown-size Cluster ends when one of these (or EOF) appears. */
  private val SegmentLevel = Set(IdCluster, IdInfo, IdTracks,
    0x114D9B74L /*SeekHead*/ , 0x1C53BB6BL /*Cues*/ ,
    0x1254C367L /*Tags*/ , 0x1043A770L /*Chapters*/ ,
    0x1941A469L /*Attachments*/ )

  private final class Scan(val b: Array[Byte]) {
    var i = 0

    /** EBML element ID: marker bit KEPT (wire form), 1-4 bytes. */
    def readId(): Long = {
      if (i >= b.length) bail("truncated_ebml")
      val first = b(i) & 0xff
      val len =
        if ((first & 0x80) != 0) 1
        else if ((first & 0x40) != 0) 2
        else if ((first & 0x20) != 0) 3
        else if ((first & 0x10) != 0) 4
        else bail("bad_element_id")
      if (i + len > b.length) bail("truncated_ebml")
      var v = 0L
      var k = 0
      while (k < len) { v = (v << 8) | (b(i + k) & 0xff); k += 1 }
      i += len
      v
    }

    /** EBML size varint: marker bit STRIPPED; -1 = unknown size. */
    def readSize(): Long = {
      if (i >= b.length) bail("truncated_ebml")
      val first = b(i) & 0xff
      if (first == 0) bail("bad_varint")
      var len = 1
      var mask = 0x80
      while ((first & mask) == 0) { mask >>= 1; len += 1 }
      if (i + len > b.length) bail("truncated_ebml")
      var v = (first & (mask - 1)).toLong
      var allOnes = (first & (mask - 1)) == mask - 1
      var k = 1
      while (k < len) {
        val x = b(i + k) & 0xff
        v = (v << 8) | x
        allOnes &&= x == 0xff
        k += 1
      }
      i += len
      if (allOnes) -1L else v
    }

    def uint(end: Int): Long = {
      if (end - i > 8) bail("bad_uint_size")
      var v = 0L
      while (i < end) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }

    def float(end: Int): Double = (end - i) match {
      case 4 => java.lang.Float.intBitsToFloat(uint(end).toInt).toDouble
      case 8 => java.lang.Double.longBitsToDouble(uint(end))
      case 0 => 0.0
      case _ => bail("bad_float_size")
    }

    def str(end: Int): String = {
      val s = new String(b, i, end - i, "UTF-8")
      i = end
      // Matroska strings may be zero-padded
      val z = s.indexOf('\u0000')
      if (z >= 0) s.substring(0, z) else s
    }
  }

  def census(bytes: Array[Byte]): Either[String, Info] =
    try {
      if (bytes == null || bytes.length < 8) bail("truncated_ebml")
      val s = new Scan(bytes)

      // ---- EBML header ------------------------------------------------
      if (s.readId() != IdEbml) bail("not_ebml")
      val headSize = s.readSize()
      if (headSize < 0) bail("unknown_size_unsupported")
      val headEnd = boundedEnd(s, headSize)
      var docType = "matroska" // spec default
      var docTypeVersion = 1L
      while (s.i < headEnd) {
        val id = s.readId()
        val end = childEnd(s, headEnd)
        id match {
          case IdDocType => docType = s.str(end)
          case IdDocTypeVersion => docTypeVersion = s.uint(end)
          case _ => s.i = end
        }
      }
      if (docType != "matroska" && docType != "webm")
        bail(s"doctype_unsupported")

      // ---- Segment ----------------------------------------------------
      if (s.readId() != IdSegment) bail("missing_segment")
      val segSizeRaw = s.readSize()
      val segEnd =
        if (segSizeRaw < 0) bytes.length // unknown size: runs to EOF
        else boundedEnd(s, segSizeRaw)

      var timestampScale = 1000000L
      var durationTicks = -1.0
      var muxingApp = ""
      val tracks = Seq.newBuilder[Track]
      var nClusters = 0L
      var nBlocks = 0L
      var blockBytes = 0L
      var sawInfo = false
      var sawTracks = false

      while (s.i < segEnd) {
        val id = s.readId()
        val sizeRaw = s.readSize()
        if (sizeRaw < 0 && id != IdCluster) bail("unknown_size_unsupported")
        val end =
          if (sizeRaw < 0) -1 // unknown-size cluster: scan to boundary
          else { if (s.i + sizeRaw > segEnd) bail("element_overruns_parent"); (s.i + sizeRaw).toInt }
        id match {
          case IdInfo =>
            sawInfo = true
            while (s.i < end) {
              val cid = s.readId()
              val cend = childEnd(s, end)
              cid match {
                case IdTimestampScale => timestampScale = s.uint(cend)
                case IdDuration => durationTicks = s.float(cend)
                case IdMuxingApp => muxingApp = s.str(cend)
                case _ => s.i = cend
              }
            }
          case IdTracks =>
            sawTracks = true
            while (s.i < end) {
              val cid = s.readId()
              val cend = childEnd(s, end)
              if (cid == IdTrackEntry) tracks += trackEntry(s, cend)
              else s.i = cend
            }
          case IdCluster =>
            nClusters += 1
            val cEnd = if (end >= 0) end else segEnd
            var open = true
            while (open && s.i < cEnd) {
              val mark = s.i
              val cid = s.readId()
              if (end < 0 && SegmentLevel(cid)) {
                // unknown-size cluster ends at the next segment-level id
                s.i = mark
                open = false
              } else {
                val cend = childEnd(s, cEnd)
                cid match {
                  case IdSimpleBlock =>
                    nBlocks += 1
                    blockBytes += blockPayload(s, cend)
                  case IdBlockGroup =>
                    while (s.i < cend) {
                      val gid = s.readId()
                      val gend = childEnd(s, cend)
                      if (gid == IdBlock) {
                        nBlocks += 1
                        blockBytes += blockPayload(s, gend)
                      } else s.i = gend
                    }
                  case _ => s.i = cend // Timestamp etc.
                }
              }
            }
          case _ =>
            if (end < 0) bail("unknown_size_unsupported")
            s.i = end // SeekHead / Cues / Tags / Chapters: opaque
        }
      }
      if (!sawInfo) bail("missing_info")
      if (!sawTracks) bail("missing_tracks")

      val durationMs =
        if (durationTicks < 0) -1L
        else (durationTicks * timestampScale / 1e6).round
      val ts = tracks.result()
      val fate = ts.find(_.trackType == 1).orElse(ts.headOption) match {
        case Some(t) =>
          t.codecId.toLowerCase.replace('/', '_').replace('-', '_') +
            "_samples_unsupported"
        case None => "no_tracks"
      }
      Right(Info(docType, docTypeVersion, timestampScale, durationMs,
        muxingApp, ts, nClusters, nBlocks, blockBytes, fate))
    } catch {
      case e: Bail => Left(e.reason)
    }

  private def boundedEnd(s: Scan, size: Long): Int = {
    if (size < 0 || s.i + size > s.b.length) bail("element_overruns_parent")
    (s.i + size).toInt
  }

  /** Read one child's size and return its end, bounded by the parent. */
  private def childEnd(s: Scan, parentEnd: Int): Int = {
    val size = s.readSize()
    if (size < 0) bail("unknown_size_unsupported")
    if (s.i + size > parentEnd) bail("element_overruns_parent")
    (s.i + size).toInt
  }

  /** Skip a (Simple)Block's header, return payload byte count. */
  private def blockPayload(s: Scan, end: Int): Long = {
    val sz = s.readSize() // track number varint (size-coded)
    if (sz < 0) bail("bad_varint")
    if (s.i + 3 > end) bail("truncated_block")
    s.i += 3 // 2-byte relative timestamp + flags
    val n = end - s.i
    s.i = end
    n.toLong
  }

  private def trackEntry(s: Scan, end: Int): Track = {
    var number = 0L
    var ttype = 0
    var codec = ""
    var w = 0
    var h = 0
    var hz = 0
    var ch = 0
    while (s.i < end) {
      val id = s.readId()
      val cend = childEnd(s, end)
      id match {
        case IdTrackNumber => number = s.uint(cend)
        case IdTrackType => ttype = s.uint(cend).toInt
        case IdCodecId => codec = s.str(cend)
        case IdVideo =>
          while (s.i < cend) {
            val vid = s.readId()
            val vend = childEnd(s, cend)
            vid match {
              case IdPixelWidth => w = s.uint(vend).toInt
              case IdPixelHeight => h = s.uint(vend).toInt
              case _ => s.i = vend
            }
          }
        case IdAudio =>
          while (s.i < cend) {
            val aid = s.readId()
            val aend = childEnd(s, cend)
            aid match {
              case IdSamplingFrequency => hz = s.float(aend).round.toInt
              case IdChannels => ch = s.uint(aend).toInt
              case _ => s.i = aend
            }
          }
        case _ => s.i = cend
      }
    }
    if (codec.isEmpty) bail("missing_codec_id")
    Track(number, ttype, codec, w, h, hz, ch)
  }

  // ==================================================================
  // Fixture writer
  // ==================================================================

  private def vint(v: Long): Array[Byte] = {
    // size varint with minimal width
    var len = 1
    while (len < 8 && v >= (1L << (7 * len)) - 1) len += 1
    val out = new Array[Byte](len)
    var k = len - 1
    var x = v
    while (k > 0) { out(k) = x.toByte; x >>= 8; k -= 1 }
    out(0) = (x | (0x100 >> len)).toByte
    out
  }

  private def idBytes(id: Long): Array[Byte] = {
    val len =
      if (id <= 0xFF) 1 else if (id <= 0xFFFF) 2
      else if (id <= 0xFFFFFF) 3 else 4
    Array.tabulate[Byte](len)(k => (id >> (8 * (len - 1 - k))).toByte)
  }

  private def el(id: Long, body: Array[Byte]): Array[Byte] =
    idBytes(id) ++ vint(body.length.toLong) ++ body

  private def uintBody(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && (v >>> (8 * len)) != 0) len += 1
    Array.tabulate[Byte](len)(k => (v >> (8 * (len - 1 - k))).toByte)
  }

  /** Write a webm/matroska fixture: one video + optional audio track,
    * `nClusters` clusters of `blocksPerCluster` SimpleBlocks each
    * (`payloadLen` bytes per block), optionally an unknown-size
    * Segment (the streaming-muxer shape). */
  def write(webm: Boolean, w: Int, h: Int, withAudio: Boolean,
      nClusters: Int, blocksPerCluster: Int, payloadLen: Int, seed: Long,
      unknownSizeSegment: Boolean = false,
      durationTicks: Double = 5000.0): Array[Byte] = {
    val head = el(IdEbml,
      el(0x4286L, uintBody(1)) ++ // EBMLVersion
        el(0x42F7L, uintBody(1)) ++ // EBMLReadVersion
        el(0x42F2L, uintBody(4)) ++ // EBMLMaxIDLength
        el(0x42F3L, uintBody(8)) ++ // EBMLMaxSizeLength
        el(IdDocType, (if (webm) "webm" else "matroska").getBytes("UTF-8")) ++
        el(IdDocTypeVersion, uintBody(4)) ++
        el(0x4285L, uintBody(2))) // DocTypeReadVersion
    val info = el(IdInfo,
      el(IdTimestampScale, uintBody(1000000L)) ++
        el(IdDuration, Array.tabulate[Byte](8) { k =>
          (java.lang.Double.doubleToLongBits(durationTicks) >>
            (8 * (7 - k))).toByte
        }) ++
        el(IdMuxingApp, "graft".getBytes("UTF-8")) ++
        el(0x5741L, "graft".getBytes("UTF-8"))) // WritingApp
    val video = el(IdTrackEntry,
      el(IdTrackNumber, uintBody(1)) ++
        el(0x73C5L, uintBody(0x1000 + seed % 1000)) ++ // TrackUID
        el(IdTrackType, uintBody(1)) ++
        el(IdCodecId, (if (webm) "V_VP8" else "V_MPEG4/ISO/AVC")
          .getBytes("UTF-8")) ++
        el(IdVideo, el(IdPixelWidth, uintBody(w.toLong)) ++
          el(IdPixelHeight, uintBody(h.toLong))))
    val audio =
      if (!withAudio) Array.emptyByteArray
      else el(IdTrackEntry,
        el(IdTrackNumber, uintBody(2)) ++
          el(IdTrackType, uintBody(2)) ++
          el(IdCodecId, (if (webm) "A_OPUS" else "A_AAC")
            .getBytes("UTF-8")) ++
          el(IdAudio,
            el(IdSamplingFrequency, Array.tabulate[Byte](4) { k =>
              (java.lang.Float.floatToIntBits(48000f) >>
                (8 * (3 - k))).toByte
            }) ++ el(IdChannels, uintBody(2))))
    val tracksEl = el(IdTracks, video ++ audio)
    var rng = seed
    val clusters = (0 until nClusters).map { c =>
      val blocks = (0 until blocksPerCluster).map { bnum =>
        val payload = Array.fill[Byte](payloadLen) {
          rng = rng * 6364136223846793005L + 1442695040888963407L
          (rng >> 33).toByte
        }
        val body = vint(1) ++ // track number
          Array[Byte]((bnum >> 8).toByte, bnum.toByte, 0x80.toByte) ++
          payload
        el(IdSimpleBlock, body)
      }
      el(IdCluster,
        el(IdTimestamp, uintBody(c * 1000L)) ++
          blocks.foldLeft(Array.emptyByteArray)(_ ++ _))
    }
    val segBody = info ++ tracksEl ++
      clusters.foldLeft(Array.emptyByteArray)(_ ++ _)
    val segment =
      if (unknownSizeSegment)
        idBytes(IdSegment) ++ Array[Byte](0xFF.toByte) ++ segBody
      else el(IdSegment, segBody)
    head ++ segment
  }
}
