package graft.operators

/** `.7z` container walk over the in-house LZMA layers — the last wild
  * habitat of the round-13 LZMA2 work ([[Lzma2]]): plain `.7z`
  * archives are the most common place LZMA2 actually appears in a
  * crawl. Grammar per the public 7z format description
  * (7zFormat.txt): a 32-byte signature header (magic `37 7A BC AF 27
  * 1C`, start-header CRC, next-header offset/size/CRC), then a
  * property-id-driven header — either plain (kHeader) or itself
  * LZMA-compressed (kEncodedHeader, decoded through the same folder
  * machinery, one level deep).
  *
  * Scope (honest): folders of one or two SIMPLE coders. Single-coder
  * folders decode LZMA2 (id 0x21), LZMA1 (03 01 01, via
  * [[Lzma2.lzma1Decode]]), or Copy (0x00) — what 7z/commons-compress
  * write by default for data. Two-coder folders decode the
  * FILTER+compressor chain 7z writes by default for EXECUTABLES: the
  * packed stream through LZMA1/LZMA2/Copy, then the bind-pair-chained
  * length-preserving filter — any of the seven [[Bcj]] converters
  * (x86, ARM, ARM-Thumb, PPC, SPARC, ARM64, IA64) or delta — applied
  * in place. Longer chains, multi-stream coders (BCJ2), reversed
  * chains (a compressor where the filter belongs), and AES-encrypted
  * folders (id 06 ...) reject by NAME (`coder_chain_unsupported`,
  * `coder_chain_order_unsupported`, `7z_encrypted`,
  * `codec_unsupported_*`). Every substream CRC present in the header
  * is verified; the next-header CRC always is. Numbers use the 7z
  * variable-length encoding; all counts are bounds-checked and the
  * total unpacked size is capped (`7z_bomb`).
  *
  * Fixtures come from the REAL generator on the classpath
  * (commons-compress `SevenZOutputFile`, LZMA2 via the xz-java it
  * delegates to) — the zstd-jni interop pattern, not hand-rolled
  * archives.
  */
object SevenZip {

  final case class Member(name: String, body: Array[Byte])

  final case class Parsed(
      members: Seq[Member],
      nFolders: Int,
      nEmptyFiles: Int,
      nDirs: Int,
      codecs: Set[String])

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val Magic = Array(0x37, 0x7A, 0xBC, 0xAF, 0x27, 0x1C).map(_.toByte)

  def looksLike7z(blob: Array[Byte]): Boolean =
    blob != null && blob.length >= 6 && {
      var i = 0
      while (i < 6 && blob(i) == Magic(i)) i += 1
      i == 6
    }

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  private final class Scan(val b: Array[Byte], var i: Int, val end: Int) {
    def u8(): Int = {
      if (i >= end) bail("truncated_7z_header")
      val v = b(i) & 0xff; i += 1; v
    }
    def u32le(): Long = {
      if (i + 4 > end) bail("truncated_7z_header")
      val v = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      i += 4; v
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || i + n > end) bail("truncated_7z_header")
      val out = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n; out
    }
    def skip(n: Long): Unit = {
      if (n < 0 || i + n > end) bail("truncated_7z_header")
      i += n.toInt
    }

    /** 7z variable-length number. */
    def num(): Long = {
      val first = u8()
      var mask = 0x80
      var value = 0L
      var k = 0
      while (k < 8) {
        if ((first & mask) == 0) {
          return value | ((first & (mask - 1)).toLong << (8 * k))
        }
        value |= u8().toLong << (8 * k)
        mask >>= 1
        k += 1
      }
      value
    }

    def numInt(cap: Int, what: String): Int = {
      val v = num()
      if (v < 0 || v > cap) bail(s"${what}_out_of_range")
      v.toInt
    }

    /** MSB-first bit vector of n bits. */
    def bits(n: Int): Array[Boolean] = {
      val out = new Array[Boolean](n)
      var mask = 0
      var cur = 0
      var k = 0
      while (k < n) {
        if (mask == 0) { cur = u8(); mask = 0x80 }
        out(k) = (cur & mask) != 0
        mask >>= 1
        k += 1
      }
      out
    }

    /** Bool vector with the allAreDefined shortcut byte. */
    def boolVector(n: Int): Array[Boolean] =
      if (u8() != 0) Array.fill(n)(true) else bits(n)
  }

  // property ids
  private val KEnd = 0
  private val KHeader = 1
  private val KArchiveProperties = 2
  private val KAdditionalStreamsInfo = 3
  private val KMainStreamsInfo = 4
  private val KFilesInfo = 5
  private val KPackInfo = 6
  private val KUnpackInfo = 7
  private val KSubStreamsInfo = 8
  private val KSize = 9
  private val KCrc = 10
  private val KFolder = 11
  private val KCodersUnpackSize = 12
  private val KNumUnpackStream = 13
  private val KEmptyStream = 14
  private val KEmptyFile = 15
  private val KName = 17
  private val KEncodedHeader = 23

  private final case class Coder(id: Array[Byte], props: Array[Byte])

  /** One folder: 1-2 SIMPLE coders (1 in / 1 out each), bind pairs
    * wiring output j into input i, and the derived decode chain. With
    * two coders the packed stream feeds the decompressor whose output
    * feeds a length-preserving FILTER (BCJ/delta) — the shape 7z
    * writes by default for executables. `outSizes` carries
    * kCodersUnpackSize's one-entry-per-output-stream values; the
    * folder's unpack size is the final (unbound) output's. */
  private final case class FolderDef(
      coders: Array[Coder],
      bindPairs: Array[(Int, Int)], // (inIndex, outIndex)
      packedInput: Int,
      var outSizes: Array[Long]) {
    def finalOut: Int = {
      val bound = bindPairs.map(_._2).toSet
      val idx = coders.indices.filterNot(bound)
      if (idx.length != 1) bail("bad_bind_graph")
      idx.head
    }
    def unpackSize: Long = outSizes(finalOut)
  }

  private final case class StreamsInfo(
      packPos: Long,
      packSizes: Array[Long],
      folders: Array[FolderDef],
      folderCrcDefined: Array[Boolean],
      folderCrcs: Array[Long],
      numUnpack: Array[Int], // substreams per folder
      subSizes: Array[Array[Long]],
      subCrcDefined: Array[Boolean], // flattened over substreams
      subCrcs: Array[Long])

  private def parseStreamsInfo(s: Scan, cap: Int): StreamsInfo = {
    var packPos = 0L
    var packSizes: Array[Long] = new Array[Long](0)
    var folders: Array[FolderDef] = new Array[FolderDef](0)
    var folderCrcDefined: Array[Boolean] = new Array[Boolean](0)
    var folderCrcs: Array[Long] = new Array[Long](0)
    var numUnpack: Array[Int] = null
    var subSizes: Array[Array[Long]] = null
    var subCrcDefined: Array[Boolean] = null
    var subCrcs: Array[Long] = null

    var id = s.num()
    if (id == KPackInfo) {
      packPos = s.num()
      val n = s.numInt(cap, "num_pack_streams")
      var inner = s.num()
      while (inner != KEnd) {
        inner match {
          case KSize =>
            packSizes = Array.fill(n)(s.num())
          case KCrc =>
            val defined = s.boolVector(n)
            defined.foreach(d => if (d) s.u32le())
          case _ => bail("bad_pack_info")
        }
        inner = s.num()
      }
      if (packSizes.length != n) bail("bad_pack_info")
      id = s.num()
    }

    if (id == KUnpackInfo) {
      if (s.num() != KFolder) bail("bad_unpack_info")
      val nFolders = s.numInt(cap, "num_folders")
      if (s.u8() != 0) bail("external_folders_unsupported")
      folders = new Array[FolderDef](nFolders)
      var f = 0
      while (f < nFolders) {
        folders(f) = parseFolder(s)
        f += 1
      }
      if (s.num() != KCodersUnpackSize) bail("bad_unpack_info")
      // one size per OUTPUT STREAM, folder by folder (a two-coder
      // chain carries an intermediate size plus the final one)
      f = 0
      while (f < nFolders) {
        folders(f).outSizes = Array.fill(folders(f).coders.length)(s.num())
        f += 1
      }
      folderCrcDefined = new Array[Boolean](nFolders)
      folderCrcs = new Array[Long](nFolders)
      var inner = s.num()
      while (inner != KEnd) {
        inner match {
          case KCrc =>
            val defined = s.boolVector(nFolders)
            var k = 0
            while (k < nFolders) {
              if (defined(k)) { folderCrcDefined(k) = true; folderCrcs(k) = s.u32le() }
              k += 1
            }
          case _ => bail("bad_unpack_info")
        }
        inner = s.num()
      }
      id = s.num()
    }

    val nFolders = folders.length
    if (id == KSubStreamsInfo) {
      var inner = s.num()
      if (inner == KNumUnpackStream) {
        numUnpack = Array.fill(nFolders)(s.numInt(cap, "num_unpack_streams"))
        inner = s.num()
      }
      val nu = if (numUnpack == null) Array.fill(nFolders)(1) else numUnpack
      numUnpack = nu
      subSizes = new Array[Array[Long]](nFolders)
      if (inner == KSize) {
        var f = 0
        while (f < nFolders) {
          val n = nu(f)
          val sizes = new Array[Long](n)
          var sum = 0L
          var k = 0
          while (k < n - 1) { sizes(k) = s.num(); sum += sizes(k); k += 1 }
          if (n > 0) {
            if (sum > folders(f).unpackSize) bail("substream_sizes_exceed_folder")
            sizes(n - 1) = folders(f).unpackSize - sum
          }
          subSizes(f) = sizes
          f += 1
        }
        inner = s.num()
      } else {
        var f = 0
        while (f < nFolders) {
          if (nu(f) != 1) bail("missing_substream_sizes")
          subSizes(f) = Array(folders(f).unpackSize)
          f += 1
        }
      }
      // CRCs for substreams that don't inherit the folder CRC
      val unknownIdx = Seq.newBuilder[Int]
      var flat = 0
      var f = 0
      while (f < nFolders) {
        var k = 0
        while (k < nu(f)) {
          if (!(nu(f) == 1 && folderCrcDefined(f))) unknownIdx += flat
          flat += 1
          k += 1
        }
        f += 1
      }
      subCrcDefined = new Array[Boolean](flat)
      subCrcs = new Array[Long](flat)
      // substreams covered by a folder CRC inherit it
      flat = 0
      f = 0
      while (f < nFolders) {
        if (nu(f) == 1 && folderCrcDefined(f)) {
          subCrcDefined(flat) = true; subCrcs(flat) = folderCrcs(f)
        }
        flat += nu(f)
        f += 1
      }
      if (inner == KCrc) {
        val unknown = unknownIdx.result()
        val defined = s.boolVector(unknown.length)
        var k = 0
        while (k < unknown.length) {
          if (defined(k)) {
            subCrcDefined(unknown(k)) = true
            subCrcs(unknown(k)) = s.u32le()
          }
          k += 1
        }
        inner = s.num()
      }
      if (inner != KEnd) bail("bad_substreams_info")
      id = s.num()
    } else {
      numUnpack = Array.fill(nFolders)(1)
      subSizes = Array.tabulate(nFolders)(f => Array(folders(f).unpackSize))
      val flat = nFolders
      subCrcDefined = new Array[Boolean](flat)
      subCrcs = new Array[Long](flat)
      var f = 0
      while (f < nFolders) {
        if (folderCrcDefined(f)) {
          subCrcDefined(f) = true; subCrcs(f) = folderCrcs(f)
        }
        f += 1
      }
    }
    if (id != KEnd) bail("bad_streams_info")
    StreamsInfo(packPos, packSizes, folders, folderCrcDefined,
      folderCrcs, numUnpack, subSizes, subCrcDefined, subCrcs)
  }

  /** Parse one folder: 1-2 SIMPLE coders plus the bind-pair wiring.
    * Two-coder folders (the BCJ/delta + LZMA shape 7z writes by
    * default for executables) are decoded; anything longer, any
    * multi-stream coder (BCJ2), and any bind graph that isn't a
    * single chain rejects by NAME. */
  private def parseFolder(s: Scan): FolderDef = {
    val numCoders = s.numInt(64, "num_coders")
    if (numCoders < 1 || numCoders > 2) bail("coder_chain_unsupported")
    val coders = new Array[Coder](numCoders)
    var c = 0
    while (c < numCoders) {
      val flags = s.u8()
      val idSize = flags & 0x0F
      val isComplex = (flags & 0x10) != 0
      val hasAttrs = (flags & 0x20) != 0
      val id = s.bytes(idSize)
      if (isComplex) bail("coder_chain_unsupported") // BCJ2 et al.
      val props = if (hasAttrs) s.bytes(s.numInt(1 << 16, "props_size"))
        else Array.emptyByteArray
      coders(c) = Coder(id, props)
      c += 1
    }
    // all-simple: totalOut = numCoders, so numBindPairs = numCoders-1
    // and exactly one packed stream (the unbound input) — no explicit
    // packed-index vector on the wire
    val bindPairs = new Array[(Int, Int)](numCoders - 1)
    var k = 0
    while (k < bindPairs.length) {
      val in = s.numInt(numCoders - 1, "bind_in")
      val out = s.numInt(numCoders - 1, "bind_out")
      bindPairs(k) = (in, out)
      k += 1
    }
    val boundIn = bindPairs.map(_._1).toSet
    val freeIn = coders.indices.filterNot(boundIn)
    if (freeIn.length != 1) bail("bad_bind_graph")
    FolderDef(coders, bindPairs, freeIn.head, null)
  }

  private def codecName(id: Array[Byte]): String =
    id.map(b => f"${b & 0xff}%02x").mkString

  private def codecFriendly(id: Array[Byte]): String = codecName(id) match {
    case "00" => "copy"
    case "21" => "lzma2"
    case "030101" => "lzma"
    case "03" => "delta"
    case "03030103" => "bcj_x86"
    case "03030205" => "bcj_ppc"
    case "03030401" => "bcj_ia64"
    case "03030501" => "bcj_arm"
    case "03030701" => "bcj_armt"
    case "03030805" => "bcj_sparc"
    case "0a" => "bcj_arm64"
    case other => other
  }

  /** Apply a length-preserving filter coder IN PLACE, or bail by name:
    * the second stage of a decode chain must be a filter — a
    * compressor there means the archive's bind graph is a shape this
    * reader doesn't own (or a hostile reversal). */
  private def applyFilter(c: Coder, buf: Array[Byte]): Unit =
    codecName(c.id) match {
      case "03030103" | "03030205" | "03030401" | "03030501" |
          "03030701" | "03030805" | "0a" =>
        // 7z BCJ coders may carry a 4-byte start offset; nobody's
        // writer emits one — reject rather than guess the semantics
        if (c.props.nonEmpty) bail("filter_props_unsupported")
        codecName(c.id) match {
          case "03030103" => Bcj.x86Decode(buf, 0L)
          case "03030205" => Bcj.ppcDecode(buf, 0L)
          case "03030401" => Bcj.ia64Decode(buf, 0L)
          case "03030501" => Bcj.armDecode(buf, 0L)
          case "03030701" => Bcj.armThumbDecode(buf, 0L)
          case "03030805" => Bcj.sparcDecode(buf, 0L)
          case _ => Bcj.arm64Decode(buf, 0L)
        }
      case "03" =>
        if (c.props.length != 1) bail("bad_delta_props")
        Bcj.deltaDecode(buf, (c.props(0) & 0xff) + 1)
      case id if id.startsWith("06") => bail("7z_encrypted")
      case "00" | "21" | "030101" => bail("coder_chain_order_unsupported")
      case other => bail(s"codec_unsupported_$other")
    }

  private def isFilterId(id: Array[Byte]): Boolean = codecName(id) match {
    case "03" | "03030103" | "03030205" | "03030401" | "03030501" |
        "03030701" | "03030805" | "0a" => true
    case _ => false
  }

  /** Decode one packed stream through a (non-filter) coder. Offsets/
    * lengths arrive as Long straight from the header — bound them HERE
    * before any narrowing (a crafted packPos near 2^63 must not wrap
    * into a plausible Int). */
  private def decodePacked(coder: Coder, blob: Array[Byte], offL: Long,
      packLenL: Long, unpackLen: Long, maxOut: Int): Array[Byte] = {
    if (unpackLen < 0 || unpackLen > maxOut) bail("7z_bomb")
    if (offL < 0 || packLenL < 0 || offL > blob.length ||
      packLenL > blob.length - offL) bail("pack_stream_out_of_file")
    val off = offL.toInt
    val packLen = packLenL.toInt
    val id = coder.id
    if (id.length == 1 && id(0) == 0x00) { // Copy
      if (packLen.toLong != unpackLen) bail("copy_size_mismatch")
      java.util.Arrays.copyOfRange(blob, off, off + packLen)
    } else if (id.length == 1 && id(0) == 0x21) { // LZMA2
      if (coder.props.length != 1) bail("bad_lzma2_props")
      Lzma2.decode(blob, off, packLen, unpackLen.toInt) match {
        case Right(out) =>
          if (out.length.toLong != unpackLen) bail("unpack_size_mismatch")
          out
        case Left(r) => bail(r)
      }
    } else if (id.length == 3 && id(0) == 0x03 && id(1) == 0x01 &&
      id(2) == 0x01) { // LZMA1
      if (coder.props.length != 5) bail("bad_lzma_props")
      Lzma2.lzma1Decode(blob, off, packLen, coder.props(0) & 0xff,
        unpackLen.toInt, maxOut) match {
        case Right(out) => out
        case Left(r) => bail(r)
      }
    } else if (id.length >= 1 && id(0) == 0x06) bail("7z_encrypted")
    else if (isFilterId(id)) bail("coder_chain_order_unsupported")
    else bail(s"codec_unsupported_${codecName(id)}")
  }

  /** Decode a folder end-to-end: packed bytes through the decompressor,
    * then each bind-pair-chained FILTER in place, finishing at the
    * folder's unbound output. */
  private def decodeFolder(folder: FolderDef, blob: Array[Byte], offL: Long,
      packLenL: Long, maxOut: Int): Array[Byte] = {
    val finalOut = folder.finalOut
    if (folder.unpackSize < 0 || folder.unpackSize > maxOut) bail("7z_bomb")
    var idx = folder.packedInput
    var cur = decodePacked(folder.coders(idx), blob, offL, packLenL,
      folder.outSizes(idx), maxOut)
    var steps = 0
    while (idx != finalOut) {
      steps += 1
      if (steps > folder.coders.length) bail("bad_bind_graph")
      val next = folder.bindPairs.collectFirst {
        case (in, out) if out == idx => in
      }.getOrElse(bail("bad_bind_graph"))
      if (folder.outSizes(next) != cur.length.toLong)
        bail("filter_size_mismatch")
      applyFilter(folder.coders(next), cur)
      idx = next
    }
    cur
  }

  def parse(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[String, Parsed] =
    try {
      if (!looksLike7z(blob)) bail("not_7z")
      if (blob.length < 32) bail("truncated_7z")
      // version 0.x tolerated; start-header CRC covers bytes 12..31
      if (crc32(blob, 12, 20) != leU32(blob, 8)) bail("start_header_crc_mismatch")
      val nextOff = leU64(blob, 12)
      val nextSize = leU64(blob, 20)
      val nextCrc = leU32(blob, 28)
      if (nextSize == 0) bail("empty_archive")
      // bound each term individually BEFORE summing: nextOff near 2^63
      // passes a <0 check but wraps the sum negative (hostile header)
      if (nextOff < 0 || nextSize < 0 || nextSize > Int.MaxValue ||
        nextOff > blob.length - 32 ||
        nextSize > blob.length - 32 - nextOff) bail("truncated_7z")
      val hStart = (32 + nextOff).toInt
      if (crc32(blob, hStart, nextSize.toInt) != nextCrc)
        bail("header_crc_mismatch")

      var s = new Scan(blob, hStart, hStart + nextSize.toInt)
      var headerBytes: Array[Byte] = null
      var headerScan: Scan = null
      s.num() match {
        case KEncodedHeader =>
          val si = parseStreamsInfo(s, 1 << 20)
          // kUnpackInfo without kPackInfo leaves packSizes empty
          if (si.folders.length != 1 || si.packSizes.isEmpty)
            bail("bad_encoded_header")
          headerBytes = decodeFolder(si.folders(0), blob, 32 + si.packPos,
            si.packSizes(0), maxOut)
          headerScan = new Scan(headerBytes, 0, headerBytes.length)
          if (headerScan.num() != KHeader) bail("bad_encoded_header")
        case KHeader =>
          headerScan = s
        case _ => bail("bad_7z_header")
      }
      s = headerScan

      var id = s.num()
      if (id == KArchiveProperties) {
        var pid = s.num()
        while (pid != KEnd) { s.skip(s.num()); pid = s.num() }
        id = s.num()
      }
      if (id == KAdditionalStreamsInfo) bail("additional_streams_unsupported")
      var si: StreamsInfo = null
      if (id == KMainStreamsInfo) {
        si = parseStreamsInfo(s, 1 << 20)
        id = s.num()
      }

      // ---- files info -------------------------------------------------
      var names: Array[String] = new Array[String](0)
      var emptyStream: Array[Boolean] = new Array[Boolean](0)
      var emptyFile: Array[Boolean] = new Array[Boolean](0)
      if (id == KFilesInfo) {
        val numFiles = s.numInt(1 << 20, "num_files")
        names = new Array[String](numFiles)
        emptyStream = new Array[Boolean](numFiles)
        emptyFile = new Array[Boolean](numFiles)
        var pid = s.num()
        while (pid != KEnd) {
          val size = s.num()
          val propEnd = s.i + size
          if (size < 0 || propEnd > s.end) bail("truncated_7z_header")
          pid match {
            case KEmptyStream =>
              emptyStream = s.bits(numFiles)
              emptyFile = new Array[Boolean](numFiles)
            case KEmptyFile =>
              val nEmpty = emptyStream.count(identity)
              val ef = s.bits(nEmpty)
              var k = 0
              var e = 0
              while (k < numFiles) {
                if (emptyStream(k)) { emptyFile(k) = ef(e); e += 1 }
                k += 1
              }
            case KName =>
              if (s.u8() != 0) bail("external_names_unsupported")
              var k = 0
              while (k < numFiles) {
                val sb = new java.lang.StringBuilder
                var done = false
                while (!done) {
                  if (s.i + 2 > propEnd) bail("truncated_7z_header")
                  val lo = s.u8(); val hi = s.u8()
                  val c = (lo | (hi << 8)).toChar
                  if (c == '\u0000') done = true else sb.append(c)
                }
                names(k) = sb.toString
                k += 1
              }
            case _ => () // mtime/attributes/...: opaque
          }
          if (s.i > propEnd) bail("truncated_7z_header")
          s.i = propEnd.toInt
          pid = s.num()
        }
        id = s.num()
      }
      if (id != KEnd) bail("bad_7z_header")

      // ---- decode folders, split substreams, map to files -------------
      val members = Seq.newBuilder[Member]
      var nEmptyFiles = 0
      var nDirs = 0
      val codecs = Set.newBuilder[String]
      val bodies = Seq.newBuilder[Array[Byte]]
      if (si != null) {
        if (si.packSizes.length < si.folders.length)
          bail("bad_streams_info")
        var total = 0L
        si.folders.foreach { fd =>
          val fs = fd.unpackSize
          total += fs
          if (fs < 0 || total > maxOut) bail("7z_bomb")
        }
        var packOff = 32 + si.packPos
        var flat = 0
        var f = 0
        while (f < si.folders.length) {
          si.folders(f).coders.foreach(c => codecs += codecFriendly(c.id))
          val out = decodeFolder(si.folders(f), blob, packOff,
            si.packSizes(f), maxOut)
          if (si.folderCrcDefined(f) &&
            crc32(out, 0, out.length) != si.folderCrcs(f))
            bail("folder_crc_mismatch")
          var sub = 0L
          var k = 0
          while (k < si.numUnpack(f)) {
            val len = si.subSizes(f)(k)
            if (len < 0 || sub + len > out.length)
              bail("substream_sizes_exceed_folder")
            val body = java.util.Arrays.copyOfRange(out, sub.toInt,
              (sub + len).toInt)
            if (si.subCrcDefined(flat) &&
              crc32(body, 0, body.length) != si.subCrcs(flat))
              bail("substream_crc_mismatch")
            bodies += body
            sub += len
            flat += 1
            k += 1
          }
          packOff += si.packSizes(f)
          f += 1
        }
      }
      val bodySeq = bodies.result()
      var next = 0
      var k = 0
      while (k < names.length) {
        if (!emptyStream(k)) {
          if (next >= bodySeq.length) bail("more_files_than_substreams")
          members += Member(names(k), bodySeq(next))
          next += 1
        } else if (emptyFile(k)) {
          nEmptyFiles += 1
          members += Member(names(k), Array.emptyByteArray)
        } else nDirs += 1
        k += 1
      }
      if (next != bodySeq.length) bail("more_substreams_than_files")
      Right(Parsed(members.result(), si match {
        case null => 0
        case x => x.folders.length
      }, nEmptyFiles, nDirs, codecs.result()))
    } catch { case e: Bail => Left(e.reason) }

  private def leU32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def leU64(b: Array[Byte], p: Int): Long =
    leU32(b, p) | (leU32(b, p + 4) << 32)
}
