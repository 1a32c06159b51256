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

  /** One folder: either 1-2 SIMPLE coders (1 in / 1 out each) — the
    * shapes 7z writes by default for data (single LZMA2/LZMA1/Copy)
    * and executables (BCJ/delta filter + compressor) — or the
    * FOUR-CODER [[Bcj2]] shape (three single-stream decompressors
    * plus the 4-in/1-out BCJ2 converter, 3 bind pairs, 4 packed
    * streams). Inputs are indexed GLOBALLY across coders in
    * declaration order (`numIns`/`inStart`); every accepted coder has
    * exactly one output, so output index = coder index.
    * `packedIndices` lists the unbound inputs in PACK-STREAM order
    * (implicit for one packed stream, an explicit wire vector
    * otherwise). `outSizes` carries kCodersUnpackSize's
    * one-entry-per-output-stream values; the folder's unpack size is
    * the final (unbound) output's. */
  private final case class FolderDef(
      coders: Array[Coder],
      numIns: Array[Int],
      bindPairs: Array[(Int, Int)], // (globalInIndex, outIndex)
      packedIndices: Array[Int], // global input indices, pack-stream order
      var outSizes: Array[Long]) {
    def inStart(c: Int): Int = {
      var s = 0; var k = 0
      while (k < c) { s += numIns(k); k += 1 }
      s
    }
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

  /** Parse one folder: 1-2 SIMPLE coders plus the bind-pair wiring,
    * or the 4-coder [[Bcj2]] shape (the only MULTI-STREAM coder this
    * reader owns: exactly one complex coder, id `03 03 01 1B`,
    * 4 in / 1 out, alongside three simple coders). Anything else —
    * longer simple chains, other complex coders, a bind graph whose
    * packed/bound sets don't tile the inputs — rejects by NAME. */
  private def parseFolder(s: Scan): FolderDef = {
    val numCoders = s.numInt(64, "num_coders")
    if (numCoders < 1 || numCoders > 4) bail("coder_chain_unsupported")
    val coders = new Array[Coder](numCoders)
    val numIns = new Array[Int](numCoders)
    var nBcj2 = 0
    var c = 0
    while (c < numCoders) {
      val flags = s.u8()
      val idSize = flags & 0x0F
      val isComplex = (flags & 0x10) != 0
      val hasAttrs = (flags & 0x20) != 0
      val id = s.bytes(idSize)
      numIns(c) = 1
      if (isComplex) {
        // the one multi-stream coder with public semantics this reader
        // implements; any other complex coder rejects by name
        if (codecName(id) != "0303011b") bail("coder_chain_unsupported")
        val nIn = s.numInt(64, "num_in_streams")
        val nOut = s.numInt(64, "num_out_streams")
        if (nIn != 4 || nOut != 1) bail("coder_chain_unsupported")
        numIns(c) = 4
        nBcj2 += 1
      } else if (codecName(id) == "0303011b") {
        // BCJ2 declared simple contradicts its own stream contract
        bail("coder_chain_unsupported")
      }
      val props = if (hasAttrs) s.bytes(s.numInt(1 << 16, "props_size"))
        else Array.emptyByteArray
      coders(c) = Coder(id, props)
      c += 1
    }
    if (nBcj2 == 0 && numCoders > 2) bail("coder_chain_unsupported")
    // one BCJ2 + 1-3 simple coders: covers both real wire shapes — the
    // 2-coder LZMA+BCJ2 with call/jump/rc packed raw (the shape
    // libarchive reads; cross-checked in Bcj2Spec) and the 4-coder
    // compressor-per-stream shape 7-Zip writes by default
    if (nBcj2 > 1 || (nBcj2 == 1 && numCoders < 2))
      bail("coder_chain_unsupported")
    val totalIn = numIns.sum
    // every accepted coder has exactly one output: totalOut = numCoders
    val bindPairs = new Array[(Int, Int)](numCoders - 1)
    var k = 0
    while (k < bindPairs.length) {
      val in = s.numInt(totalIn - 1, "bind_in")
      val out = s.numInt(numCoders - 1, "bind_out")
      bindPairs(k) = (in, out)
      k += 1
    }
    if (bindPairs.map(_._1).distinct.length != bindPairs.length ||
      bindPairs.map(_._2).distinct.length != bindPairs.length)
      bail("bad_bind_graph")
    val boundIn = bindPairs.map(_._1).toSet
    val freeIn = (0 until totalIn).filterNot(boundIn)
    val nPacked = totalIn - bindPairs.length
    if (freeIn.length != nPacked) bail("bad_bind_graph")
    val packedIndices =
      if (nPacked == 1) Array(freeIn.head)
      else {
        // >1 packed stream: the wire carries an explicit index vector
        // mapping pack-stream order to input-stream indices
        val v = new Array[Int](nPacked)
        var p = 0
        while (p < nPacked) {
          v(p) = s.numInt(totalIn - 1, "packed_index")
          p += 1
        }
        if (v.distinct.length != nPacked || v.exists(boundIn))
          bail("bad_bind_graph")
        v
      }
    FolderDef(coders, numIns, bindPairs, packedIndices, null)
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
    case "0303011b" => "bcj2"
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

  /** Decode one coder's single input stream through a (non-filter)
    * decompressor. Input arrives as an already-bounds-checked slice. */
  private def decodePacked(coder: Coder, in: Array[Byte],
      unpackLen: Long, maxOut: Int): Array[Byte] = {
    if (unpackLen < 0 || unpackLen > maxOut) bail("7z_bomb")
    val id = coder.id
    if (id.length == 1 && id(0) == 0x00) { // Copy
      if (in.length.toLong != unpackLen) bail("copy_size_mismatch")
      in
    } else if (id.length == 1 && id(0) == 0x21) { // LZMA2
      if (coder.props.length != 1) bail("bad_lzma2_props")
      Lzma2.decode(in, 0, in.length, unpackLen.toInt) match {
        case Right(out) =>
          if (out.length.toLong != unpackLen) bail("unpack_size_mismatch")
          out
        case Left(r) => bail(r)
      }
    } else if (id.length == 3 && id(0) == 0x03 && id(1) == 0x01 &&
      id(2) == 0x01) { // LZMA1
      if (coder.props.length != 5) bail("bad_lzma_props")
      Lzma2.lzma1Decode(in, 0, in.length, coder.props(0) & 0xff,
        unpackLen.toInt, maxOut) match {
        case Right(out) => out
        case Left(r) => bail(r)
      }
    } else if (id.length >= 1 && id(0) == 0x06) bail("7z_encrypted")
    else if (isFilterId(id)) bail("coder_chain_order_unsupported")
    else bail(s"codec_unsupported_${codecName(id)}")
  }

  /** Decode a folder end-to-end by evaluating the bind graph from its
    * unbound output: decompressors pull PACKED streams, filters
    * transform a bound producer's output in place, and [[Bcj2]] joins
    * its four inputs. `packOffs`/`packLens` are this folder's pack
    * streams in pack-stream order; offsets/lengths arrive as Long
    * straight from the header — bound HERE before any narrowing (a
    * crafted packPos near 2^63 must not wrap into a plausible Int). */
  private def decodeFolder(folder: FolderDef, blob: Array[Byte],
      packOffs: Array[Long], packLens: Array[Long], maxOut: Int)
      : Array[Byte] = {
    if (folder.unpackSize < 0 || folder.unpackSize > maxOut) bail("7z_bomb")
    if (packOffs.length != folder.packedIndices.length)
      bail("bad_streams_info")
    val boundByIn = folder.bindPairs.toMap // globalIn -> producer coder
    val packedPos = folder.packedIndices.zipWithIndex.toMap
    val memo = new Array[Array[Byte]](folder.coders.length)
    val visiting = new Array[Boolean](folder.coders.length)
    def packedBytes(k: Int): Array[Byte] = {
      val offL = packOffs(k)
      val lenL = packLens(k)
      if (offL < 0 || lenL < 0 || offL > blob.length ||
        lenL > blob.length - offL) bail("pack_stream_out_of_file")
      java.util.Arrays.copyOfRange(blob, offL.toInt, (offL + lenL).toInt)
    }
    def inputBytes(gIn: Int): Array[Byte] = boundByIn.get(gIn) match {
      case Some(producer) => evalOut(producer)
      case None => packedPos.get(gIn) match {
        case Some(k) => packedBytes(k)
        case None => bail("bad_bind_graph")
      }
    }
    def evalOut(c: Int): Array[Byte] = {
      if (memo(c) != null) return memo(c)
      if (visiting(c)) bail("bad_bind_graph")
      visiting(c) = true
      val coder = folder.coders(c)
      val declared = folder.outSizes(c)
      if (declared < 0 || declared > maxOut) bail("7z_bomb")
      val gIn = folder.inStart(c)
      val name = codecName(coder.id)
      val out: Array[Byte] =
        if (name == "0303011b") {
          Bcj2.decode(inputBytes(gIn), inputBytes(gIn + 1),
            inputBytes(gIn + 2), inputBytes(gIn + 3), declared.toInt) match {
            case Right(o) => o
            case Left(r) => bail(r)
          }
        } else if (isFilterId(coder.id)) {
          // a filter fed straight from a packed stream is the reversed
          // shape no real writer produces
          if (!boundByIn.contains(gIn)) bail("coder_chain_order_unsupported")
          val buf = inputBytes(gIn)
          if (declared != buf.length.toLong) bail("filter_size_mismatch")
          applyFilter(coder, buf)
          buf
        } else {
          // unknown/encrypted ids name themselves BEFORE any chain-
          // order adjudication (legacy fate precedence)
          if (name.startsWith("06")) bail("7z_encrypted")
          if (name != "00" && name != "21" && name != "030101")
            bail(s"codec_unsupported_$name")
          // decompressors consume packed streams only: a compressor in
          // a bound position means a chain shape this reader rejects
          if (boundByIn.contains(gIn)) bail("coder_chain_order_unsupported")
          decodePacked(coder, inputBytes(gIn), declared, maxOut)
        }
      if (out.length.toLong != declared) bail("unpack_size_mismatch")
      visiting(c) = false
      memo(c) = out
      out
    }
    evalOut(folder.finalOut)
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
          if (si.folders.length != 1 ||
            si.packSizes.length < si.folders(0).packedIndices.length ||
            si.packSizes.isEmpty)
            bail("bad_encoded_header")
          val n0 = si.folders(0).packedIndices.length
          val offs0 = new Array[Long](n0)
          var o0 = 32 + si.packPos
          var p0 = 0
          while (p0 < n0) { offs0(p0) = o0; o0 += si.packSizes(p0); p0 += 1 }
          headerBytes = decodeFolder(si.folders(0), blob, offs0,
            java.util.Arrays.copyOf(si.packSizes, n0), maxOut)
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
        if (si.folders.map(_.packedIndices.length.toLong).sum >
          si.packSizes.length) bail("bad_streams_info")
        var total = 0L
        si.folders.foreach { fd =>
          val fs = fd.unpackSize
          total += fs
          if (fs < 0 || total > maxOut) bail("7z_bomb")
        }
        var packOff = 32 + si.packPos
        var packIdx = 0
        var flat = 0
        var f = 0
        while (f < si.folders.length) {
          si.folders(f).coders.foreach(c => codecs += codecFriendly(c.id))
          // this folder consumes its packed streams in pack-stream order
          val nPack = si.folders(f).packedIndices.length
          val offs = new Array[Long](nPack)
          val lens = new Array[Long](nPack)
          var p = 0
          while (p < nPack) {
            offs(p) = packOff
            lens(p) = si.packSizes(packIdx + p)
            packOff += lens(p)
            p += 1
          }
          packIdx += nPack
          val out = decodeFolder(si.folders(f), blob, offs, lens, maxOut)
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

  // ---- BCJ2 fixture writer ------------------------------------------

  private def putNum(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    // 7z variable-length number: k high bits of the first byte flag k
    // extra little-endian bytes; capacity 7*(k+1) bits
    require(v >= 0)
    var k = 0
    while (k < 8 && v >= (1L << (7 * (k + 1)))) k += 1
    val mask = (0x100 - (0x100 >> k)) & 0xFF
    o.write(mask | ((v >>> (8 * k)) & 0xFF).toInt)
    var j = 0
    while (j < k) { o.write(((v >>> (8 * j)) & 0xFF).toInt); j += 1 }
  }

  private def putU32le(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }

  private def putU64le(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    putU32le(o, v & 0xFFFFFFFFL); putU32le(o, (v >>> 32) & 0xFFFFFFFFL)
  }

  /** Write a `.7z` archive whose single folder carries the
    * FOUR-STREAM [[Bcj2]] coder (`03 03 01 1B`, 4 in / 1 out). Two
    * real wire shapes:
    *
    *   - `wide = false` (default): TWO coders — raw LZMA1 for `main`
    *     (the REAL encoder on the classpath, xz-java's
    *     `LZMAOutputStream`), BCJ2 second, `call`/`jump`/`rc` packed
    *     directly. This is the shape libarchive reads: the Bcj2Spec
    *     cross-check extracts it byte-exact through bsdtar.
    *   - `wide = true`: FOUR coders, one LZMA per compressible stream
    *     plus BCJ2, three bind pairs, explicit packed-index vector —
    *     the compressor-per-stream shape 7-Zip emits by default for
    *     large executables (in-house-verified; libarchive reads only
    *     the narrow shapes).
    *
    * Members become substreams of the one folder (all bodies must be
    * non-empty). Fixture-writer mold (Cfb/Rar): spec-faithful writer
    * verified against the real reader AND the in-house parser. */
  def writeBcj2(members: Seq[(String, Array[Byte])],
      wide: Boolean = false): Array[Byte] = {
    require(members.nonEmpty && members.forall(_._2.nonEmpty),
      "writeBcj2: non-empty member bodies only")
    val data = {
      val o = new java.io.ByteArrayOutputStream()
      members.foreach(m => o.write(m._2))
      o.toByteArray
    }
    val st = Bcj2.encode(data)
    val lzOpts = new org.tukaani.xz.LZMA2Options(1)
    lzOpts.setDictSize(1 << 16)
    def lzma(raw: Array[Byte]): (Array[Byte], Array[Byte]) = {
      val bos = new java.io.ByteArrayOutputStream()
      val os = new org.tukaani.xz.LZMAOutputStream(bos, lzOpts, false)
      os.write(raw)
      os.finish()
      val props = new java.io.ByteArrayOutputStream()
      props.write(os.getProps)
      putU32le(props, lzOpts.getDictSize.toLong)
      (bos.toByteArray, props.toByteArray)
    }
    val (mainP, mainProps) = lzma(st.main)
    val widePairs = if (wide) Some((lzma(st.call), lzma(st.jump))) else None
    val packs: Seq[Array[Byte]] = widePairs match {
      case Some(((callP, _), (jumpP, _))) => Seq(mainP, callP, jumpP, st.rc)
      case None => Seq(mainP, st.call, st.jump, st.rc)
    }

    val h = new java.io.ByteArrayOutputStream()
    h.write(KHeader)
    h.write(KMainStreamsInfo)
    // ---- pack info --------------------------------------------------
    h.write(KPackInfo)
    putNum(h, 0L) // packPos
    putNum(h, packs.length.toLong)
    h.write(KSize)
    packs.foreach(p => putNum(h, p.length.toLong))
    h.write(KEnd)
    // ---- unpack info: the one BCJ2 folder ---------------------------
    h.write(KUnpackInfo)
    h.write(KFolder)
    putNum(h, 1L) // numFolders
    h.write(0) // not external
    def lzmaCoder(props: Array[Byte]): Unit = {
      h.write(0x23) // idSize 3 | hasAttrs
      h.write(0x03); h.write(0x01); h.write(0x01)
      putNum(h, props.length.toLong)
      h.write(props)
    }
    def bcj2Coder(): Unit = {
      h.write(0x14) // idSize 4 | complex
      h.write(0x03); h.write(0x03); h.write(0x01); h.write(0x1B)
      putNum(h, 4L) // numInStreams
      putNum(h, 1L) // numOutStreams
    }
    if (wide) {
      putNum(h, 4L) // numCoders
      val ((_, callProps), (_, jumpProps)) = widePairs.get
      lzmaCoder(mainProps) // out 0 -> bcj2 main
      lzmaCoder(callProps) // out 1 -> bcj2 call
      lzmaCoder(jumpProps) // out 2 -> bcj2 jump
      bcj2Coder()
      // bind pairs: bcj2 inputs (global 3,4,5) <- lzma outputs 0,1,2
      Seq((3L, 0L), (4L, 1L), (5L, 2L)).foreach { case (in, out) =>
        putNum(h, in); putNum(h, out)
      }
      // packed-index vector: inputs 0,1,2 (lzma) and 6 (bcj2 rc)
      Seq(0L, 1L, 2L, 6L).foreach(putNum(h, _))
      h.write(KCodersUnpackSize)
      Seq(st.main.length, st.call.length, st.jump.length, data.length)
        .foreach(n => putNum(h, n.toLong))
    } else {
      putNum(h, 2L) // numCoders
      lzmaCoder(mainProps) // out 0 -> bcj2 main
      bcj2Coder()
      putNum(h, 1L); putNum(h, 0L) // bind: bcj2 main (global in 1) <- out 0
      // packed-index vector: lzma input 0, bcj2 call/jump/rc (2,3,4)
      Seq(0L, 2L, 3L, 4L).foreach(putNum(h, _))
      h.write(KCodersUnpackSize)
      Seq(st.main.length, data.length).foreach(n => putNum(h, n.toLong))
    }
    h.write(KCrc)
    h.write(1) // allAreDefined
    putU32le(h, crc32(data, 0, data.length))
    h.write(KEnd)
    // ---- substreams: one per member ---------------------------------
    h.write(KSubStreamsInfo)
    if (members.length > 1) {
      h.write(KNumUnpackStream)
      putNum(h, members.length.toLong)
      h.write(KSize)
      members.init.foreach(m => putNum(h, m._2.length.toLong))
      h.write(KCrc)
      h.write(1) // allAreDefined (none inherit the folder CRC)
      members.foreach(m => putU32le(h, crc32(m._2, 0, m._2.length)))
    }
    h.write(KEnd)
    h.write(KEnd) // end of streams info
    // ---- files info -------------------------------------------------
    h.write(KFilesInfo)
    putNum(h, members.length.toLong)
    val nameProp = new java.io.ByteArrayOutputStream()
    nameProp.write(0) // not external
    members.foreach { m =>
      m._1.foreach { ch =>
        nameProp.write(ch.toInt & 0xff); nameProp.write((ch.toInt >> 8) & 0xff)
      }
      nameProp.write(0); nameProp.write(0)
    }
    h.write(KName)
    putNum(h, nameProp.size().toLong)
    h.write(nameProp.toByteArray)
    h.write(KEnd)
    h.write(KEnd) // end of header
    val header = h.toByteArray

    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    out.write(0x00); out.write(0x04) // version
    val packedLen = packs.map(_.length.toLong).sum
    val start = new java.io.ByteArrayOutputStream()
    putU64le(start, packedLen) // next header offset (right after packs)
    putU64le(start, header.length.toLong)
    putU32le(start, crc32(header, 0, header.length))
    val startBytes = start.toByteArray
    putU32le(out, crc32(startBytes, 0, startBytes.length))
    out.write(startBytes)
    packs.foreach(out.write)
    out.write(header)
    out.toByteArray
  }
}
