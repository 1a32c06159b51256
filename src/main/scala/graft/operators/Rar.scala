package graft.operators

/** RAR archive census — the last common wild archive family with no
  * named handling: RAR4 (1.5-4.x) and RAR5 header walks per the
  * PUBLIC format documentation (rarlab's technote for RAR5; the
  * RAR 4.x block grammar as documented in open-source readers such as
  * libarchive). The DECOMPRESSION algorithms are not public, so this
  * is deliberately a CENSUS + stored-member reader:
  *
  *   - both generations detected from their signatures and walked
  *     block by block, every header CRC verified (RAR4's 16-bit
  *     truncated CRC-32, RAR5's full CRC-32 over the size field
  *     through the extra area);
  *   - member names, unpacked sizes, methods, and directory flags
  *     counted; STORED members (method 0 — the only public coding)
  *     are extracted and their data CRC verified;
  *   - compressed members are censused by method name with no body
  *     (`compress_mN`), never guessed at;
  *   - encryption — RAR4's header-password flag, RAR5's encryption
  *     block (type 4) or per-file encryption extra record — rejects
  *     the archive by name (`rar_encrypted`); every bounds violation
  *     is `rar_truncated`; RAR5's vint grammar is capped at its
  *     documented 10-byte maximum.
  *
  * No RAR writer exists on this system, so fixtures follow the CFB
  * playbook: a spec-faithful writer + a deliberately strict parser +
  * hostile specs — and the writer's output is cross-checked against
  * the REAL reader on the classpath's host (libarchive's bsdtar reads
  * both generations; RarSpec shells out to list AND extract them).
  */
object Rar {

  /** body is Some only for verified stored members. */
  final case class Member(
      name: String,
      unpackedSize: Long,
      method: String, // store / compress_m1..5
      isDir: Boolean,
      body: Option[Array[Byte]])

  final case class Parsed(
      generation: Int, // 4 or 5
      members: Seq[Member],
      nDirs: Int,
      nStored: Int,
      nCompressed: Int,
      nServiceBlocks: Int)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val Sig4 = Array(0x52, 0x61, 0x72, 0x21, 0x1A, 0x07, 0x00)
    .map(_.toByte)
  private val Sig5 = Array(0x52, 0x61, 0x72, 0x21, 0x1A, 0x07, 0x01, 0x00)
    .map(_.toByte)

  /** 5, 4, or 0 (not RAR). */
  def generation(blob: Array[Byte]): Int =
    if (blob == null) 0
    else if (blob.length >= 8 && blob.take(8).sameElements(Sig5)) 5
    else if (blob.length >= 7 && blob.take(7).sameElements(Sig4)) 4
    else 0

  private def crc32(b: Array[Byte], off: Int, len: Int): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b, off, len)
    c.getValue
  }

  private def u16(b: Array[Byte], p: Int): Int = {
    if (p < 0 || p + 2 > b.length) bail("rar_truncated")
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  }
  private def u32(b: Array[Byte], p: Int): Long = {
    if (p < 0 || p + 4 > b.length) bail("rar_truncated")
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)
  }

  def parse(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[String, Parsed] =
    try {
      generation(blob) match {
        case 5 => Right(parse5(blob, maxOut))
        case 4 => Right(parse4(blob, maxOut))
        case _ => bail("not_rar")
      }
    } catch { case e: Bail => Left(e.reason) }

  // ==================================================================
  // RAR4 (1.5-4.x): fixed-layout blocks, 16-bit truncated CRC-32
  // ==================================================================

  private def parse4(blob: Array[Byte], maxOut: Int): Parsed = {
    var p = 7
    val members = Seq.newBuilder[Member]
    var nDirs = 0
    var nStored = 0
    var nCompressed = 0
    var nService = 0
    var sawMain = false
    var done = false
    var totalStored = 0L
    // the end block (0x7B) is mandatory here: without it a truncation
    // landing exactly on a block boundary would parse as a shorter
    // valid archive — reject-don't-guess
    while (!done) {
      if (p >= blob.length) bail("rar_truncated")
      else {
        val headCrc = u16(blob, p)
        val flags = u16(blob, p + 3)
        val size = u16(blob, p + 5) // bounds-checks through p+6
        val headType = blob(p + 2) & 0xff
        if (size < 7 || p + size > blob.length) bail("rar_truncated")
        // header CRC: low 16 bits of CRC-32 over TYPE..end-of-header
        if (((crc32(blob, p + 2, size - 2)) & 0xFFFF) != headCrc)
          bail("rar4_header_crc_mismatch")
        headType match {
          case 0x73 => // main header
            if (sawMain) bail("rar4_duplicate_main")
            if ((flags & 0x0080) != 0) bail("rar_encrypted")
            if ((flags & 0x0001) != 0) bail("rar_multivolume")
            sawMain = true
            p += size
          case 0x74 => // file header
            if (!sawMain) bail("rar4_missing_main")
            if ((flags & 0x0004) != 0) bail("rar_encrypted")
            if ((flags & 0x0003) != 0) bail("rar_split_member")
            if ((flags & 0x0100) != 0) bail("rar4_large_member_unsupported")
            val packSize = u32(blob, p + 7)
            val unpSize = u32(blob, p + 11)
            val fileCrc = u32(blob, p + 16)
            val method = blob(p + 25) & 0xff
            val nameSize = u16(blob, p + 26)
            if (method < 0x30 || method > 0x35) bail("rar4_bad_method")
            if (32 + nameSize > size) bail("rar_truncated")
            val name = CharsetSniff.decodeStrict(
              java.util.Arrays.copyOfRange(blob, p + 32, p + 32 + nameSize),
              0, "UTF-8").getOrElse(bail("rar_name_bad_utf8"))
            val isDir = (flags & 0xE0) == 0xE0
            if (packSize < 0 || p + size + packSize > blob.length)
              bail("rar_truncated")
            val dataStart = p + size
            val body =
              if (isDir) {
                if (packSize != 0) bail("rar4_dir_with_data")
                nDirs += 1
                None
              } else if (method == 0x30) {
                if (packSize != unpSize) bail("rar4_store_size_mismatch")
                totalStored += unpSize
                if (totalStored > maxOut) bail("rar_bomb")
                val b = java.util.Arrays.copyOfRange(blob, dataStart,
                  (dataStart + packSize).toInt)
                if (crc32(b, 0, b.length) != fileCrc)
                  bail("rar_data_crc_mismatch")
                nStored += 1
                Some(b)
              } else {
                nCompressed += 1
                None
              }
            members += Member(name, unpSize,
              if (method == 0x30) "store" else s"compress_m${method - 0x30}",
              isDir, body)
            p += size + packSize.toInt
          case 0x7B => // end of archive: must close the file
            if ((flags & 0x8000) != 0) bail("rar4_end_with_data")
            p += size
            if (p != blob.length) bail("rar4_trailing_garbage")
            done = true
          case t if t >= 0x72 && t <= 0x7A => // comment/service/etc.
            nService += 1
            val addSize = if ((flags & 0x8000) != 0) u32(blob, p + 7) else 0L
            if (addSize < 0 || p + size + addSize > blob.length)
              bail("rar_truncated")
            p += size + addSize.toInt
          case t => bail(f"rar4_unknown_block_0x$t%02x")
        }
      }
      if (p > blob.length) bail("rar_truncated")
      // EOF is only legal through the end block (done already set)
      if (p == blob.length && !done) bail("rar_truncated")
    }
    Parsed(4, members.result(), nDirs, nStored, nCompressed, nService)
  }

  // ==================================================================
  // RAR5: vint grammar, full CRC-32 over size-field..extra-area
  // ==================================================================

  private final class Scan5(val b: Array[Byte], var i: Int, val end: Int) {
    def u8(): Int = {
      if (i >= end) bail("rar_truncated")
      val v = b(i) & 0xff; i += 1; v
    }
    def u32le(): Long = {
      if (i + 4 > end) bail("rar_truncated")
      val v = (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
        ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
      i += 4; v
    }
    /** RAR5 vint: little-endian base-128, documented 10-byte cap. */
    def vint(): Long = {
      var v = 0L
      var shift = 0
      var k = 0
      while (k < 10) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        k += 1
      }
      bail("rar5_vint_overflow")
    }
    def vintCapped(cap: Long, what: String): Long = {
      val v = vint()
      if (v < 0 || v > cap) bail(s"${what}_out_of_range")
      v
    }
  }

  private def parse5(blob: Array[Byte], maxOut: Int): Parsed = {
    var p = 8
    val members = Seq.newBuilder[Member]
    var nDirs = 0
    var nStored = 0
    var nCompressed = 0
    var nService = 0
    var sawMain = false
    var sawEnd = false
    var totalStored = 0L
    while (p < blob.length && !sawEnd) {
      val hdrCrc = u32(blob, p)
      val s = new Scan5(blob, p + 4, blob.length)
      val hdrSize = s.vintCapped(1 << 20, "rar5_header_size")
      val sizeFieldLen = s.i - (p + 4)
      val hdrStart = s.i
      val hdrEnd = hdrStart + hdrSize.toInt
      if (hdrSize < 1 || hdrEnd > blob.length) bail("rar_truncated")
      // CRC-32 covers the size field THROUGH the extra area
      if (crc32(blob, p + 4, sizeFieldLen + hdrSize.toInt) != hdrCrc)
        bail("rar5_header_crc_mismatch")
      val h = new Scan5(blob, hdrStart, hdrEnd)
      val blockType = h.vint()
      val blockFlags = h.vint()
      val extraSize =
        if ((blockFlags & 0x1) != 0) h.vintCapped(1 << 20, "rar5_extra_size")
        else 0L
      val dataSize =
        if ((blockFlags & 0x2) != 0) h.vintCapped(Int.MaxValue, "rar5_data_size")
        else 0L
      if (extraSize > hdrSize) bail("rar_truncated")
      val dataStart = hdrEnd
      if (dataStart + dataSize > blob.length) bail("rar_truncated")
      blockType match {
        case 4 => bail("rar_encrypted") // archive encryption header
        case 1 => // main archive header
          if (sawMain) bail("rar5_duplicate_main")
          val archFlags = h.vint()
          if ((archFlags & 0x1) != 0) bail("rar_multivolume")
          sawMain = true
        case 2 | 3 => // file / service header
          if (!sawMain) bail("rar5_missing_main")
          val fileFlags = h.vint()
          val unpSize = h.vintCapped(Long.MaxValue >> 1, "rar5_unp_size")
          h.vint() // attributes
          if ((fileFlags & 0x2) != 0) h.u32le() // mtime
          val dataCrc = if ((fileFlags & 0x4) != 0) Some(h.u32le()) else None
          val compInfo = h.vint()
          h.vint() // host os
          val nameLen = h.vintCapped(4096, "rar5_name_len")
          if (h.i + nameLen > hdrEnd) bail("rar_truncated")
          val name = CharsetSniff.decodeStrict(
            java.util.Arrays.copyOfRange(blob, h.i, h.i + nameLen.toInt),
            0, "UTF-8").getOrElse(bail("rar_name_bad_utf8"))
          h.i += nameLen.toInt
          // extra area: the encryption record (type 0x01) rejects
          if (extraSize > 0) {
            val x = new Scan5(blob, hdrEnd - extraSize.toInt, hdrEnd)
            while (x.i < x.end) {
              val recSize = x.vintCapped(1 << 20, "rar5_extra_rec")
              val recStart = x.i
              if (recStart + recSize > x.end) bail("rar_truncated")
              val recType = x.vint()
              if (recType == 0x01) bail("rar_encrypted")
              x.i = recStart + recSize.toInt
            }
          }
          if (blockType == 3) {
            nService += 1 // service data (comments etc.): censused, skipped
          } else {
            val isDir = (fileFlags & 0x1) != 0
            val method = ((compInfo >> 7) & 0x7).toInt
            val body =
              if (isDir) {
                if (dataSize != 0) bail("rar5_dir_with_data")
                nDirs += 1
                None
              } else if (method == 0) {
                if ((fileFlags & 0x8) == 0 && dataSize != unpSize)
                  bail("rar5_store_size_mismatch")
                totalStored += dataSize
                if (totalStored > maxOut) bail("rar_bomb")
                val b = java.util.Arrays.copyOfRange(blob, dataStart,
                  (dataStart + dataSize).toInt)
                dataCrc.foreach { c =>
                  if (crc32(b, 0, b.length) != c) bail("rar_data_crc_mismatch")
                }
                nStored += 1
                Some(b)
              } else {
                if (method < 0 || method > 5) bail("rar5_bad_method")
                nCompressed += 1
                None
              }
            members += Member(name, if (isDir) 0L else unpSize,
              if (method == 0) "store" else s"compress_m$method",
              isDir, body)
          }
        case 5 => // end of archive
          sawEnd = true
        case t => bail(s"rar5_unknown_block_$t")
      }
      p = (dataStart + dataSize).toInt
    }
    if (!sawMain) bail("rar_truncated")
    if (sawEnd && p != blob.length) bail("rar5_trailing_garbage")
    if (!sawEnd) bail("rar_truncated") // end block is mandatory in RAR5
    Parsed(5, members.result(), nDirs, nStored, nCompressed, nService)
  }

  // ==================================================================
  // Fixture writers (stored members only — the public coding)
  // ==================================================================

  /** A fixture entry. `markCompressed` plants the method-1 bits with
    * the raw bytes as the data area — a CENSUS fixture for the
    * no-decode path (the parser must count it, name `compress_m1`,
    * and never touch the bytes). */
  final case class Entry(name: String, body: Array[Byte],
      markCompressed: Boolean = false)

  /** Write a RAR4 archive: marker, main header, one stored (or
    * census-compressed) file block per entry, directory blocks, end
    * block — every header CRC real. `encrypted` plants the
    * header-password flag for the named-rejection path. */
  def write4(entries: Seq[Entry], dirs: Seq[String] = Nil,
      encrypted: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig4)
    def block(headType: Int, flags: Int, rest: Array[Byte]): Unit = {
      val size = 7 + rest.length
      val hdr = new Array[Byte](size)
      hdr(2) = headType.toByte
      hdr(3) = flags.toByte; hdr(4) = ((flags >> 8) & 0xff).toByte
      hdr(5) = size.toByte; hdr(6) = ((size >> 8) & 0xff).toByte
      System.arraycopy(rest, 0, hdr, 7, rest.length)
      val crc = crc32(hdr, 2, size - 2) & 0xFFFF
      hdr(0) = crc.toByte; hdr(1) = ((crc >> 8) & 0xff).toByte
      out.write(hdr)
    }
    def putU16(b: Array[Byte], p: Int, v: Int): Unit = {
      b(p) = v.toByte; b(p + 1) = ((v >> 8) & 0xff).toByte
    }
    def putU32(b: Array[Byte], p: Int, v: Long): Unit = {
      var k = 0
      while (k < 4) { b(p + k) = ((v >> (8 * k)) & 0xff).toByte; k += 1 }
    }
    // main header: HighPosAV(2) + PosAV(4), both zero
    block(0x73, if (encrypted) 0x0080 else 0x0000, new Array[Byte](6))
    def fileBlock(name: String, body: Array[Byte], isDir: Boolean,
        compressed: Boolean): Unit = {
      val nameB = name.getBytes("UTF-8")
      val rest = new Array[Byte](25 + nameB.length)
      putU32(rest, 0, if (isDir) 0L else body.length.toLong) // pack size
      putU32(rest, 4, if (isDir) 0L else body.length.toLong) // unp size
      rest(8) = 3 // host os: unix
      putU32(rest, 9, if (isDir) 0L else crc32(body, 0, body.length))
      putU32(rest, 13, 0x2A21A524L) // ftime (fixed dos date: determinism)
      rest(17) = 20 // unpack version 2.0
      rest(18) = (0x30 + (if (compressed) 1 else 0)).toByte
      putU16(rest, 19, nameB.length)
      putU32(rest, 21, if (isDir) 0x10L else 0x20L) // attributes
      System.arraycopy(nameB, 0, rest, 25, nameB.length)
      val flags = 0x8000 | (if (isDir) 0xE0 else 0x00)
      block(0x74, flags, rest)
      if (!isDir) out.write(body)
    }
    dirs.foreach(d => fileBlock(d, Array.emptyByteArray, isDir = true,
      compressed = false))
    entries.foreach(e => fileBlock(e.name, e.body, isDir = false,
      compressed = e.markCompressed))
    block(0x7B, 0x4000, Array.emptyByteArray) // end block
    out.toByteArray
  }

  /** Write a RAR5 archive: signature, main header, stored (or
    * census-compressed) file blocks, directory blocks, end block —
    * vint grammar and full-CRC sealing per the published format.
    * `encrypted` writes the archive-encryption block (type 4). */
  def write5(entries: Seq[Entry], dirs: Seq[String] = Nil,
      encrypted: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig5)
    def vint(v: Long): Array[Byte] = {
      val b = Seq.newBuilder[Byte]
      var x = v
      do {
        val lo = (x & 0x7f).toInt
        x >>>= 7
        b += (if (x != 0) (lo | 0x80) else lo).toByte
      } while (x != 0)
      b.result().toArray
    }
    def block(body: Array[Byte]): Unit = {
      val sz = vint(body.length.toLong)
      val sealed0 = sz ++ body
      val crc = crc32(sealed0, 0, sealed0.length)
      val hdr = new Array[Byte](4)
      var k = 0
      while (k < 4) { hdr(k) = ((crc >> (8 * k)) & 0xff).toByte; k += 1 }
      out.write(hdr); out.write(sealed0)
    }
    if (encrypted)
      block(vint(4) ++ vint(0) ++ vint(0) ++ vint(0) ++ new Array[Byte](16))
    // main header: type 1, no flags, archive flags 0
    block(vint(1) ++ vint(0) ++ vint(0))
    def fileBlock(name: String, body: Array[Byte], isDir: Boolean,
        compressed: Boolean): Unit = {
      val nameB = name.getBytes("UTF-8")
      val hasData = !isDir
      val blockFlags = if (hasData) 0x2L else 0x0L
      val fileFlags = if (isDir) 0x1L else 0x4L // dir | data-crc present
      val compInfo = if (compressed) 1L << 7 else 0L
      val fields =
        vint(2) ++ vint(blockFlags) ++
          (if (hasData) vint(body.length.toLong) else Array.emptyByteArray) ++
          vint(fileFlags) ++
          vint(if (isDir) 0L else body.length.toLong) ++ // unpacked size
          vint(if (isDir) 0x4000L else 0x8000L) ++ // attributes (unix-ish)
          (if (isDir) Array.emptyByteArray
           else {
             val c = crc32(body, 0, body.length)
             Array.tabulate[Byte](4)(k => ((c >> (8 * k)) & 0xff).toByte)
           }) ++
          vint(compInfo) ++ vint(1L) ++ // host os: unix
          vint(nameB.length.toLong) ++ nameB
      block(fields)
      if (hasData) out.write(body)
    }
    dirs.foreach(d => fileBlock(d, Array.emptyByteArray, isDir = true,
      compressed = false))
    entries.foreach(e => fileBlock(e.name, e.body, isDir = false,
      compressed = e.markCompressed))
    block(vint(5) ++ vint(0) ++ vint(0)) // end of archive, flags 0
    out.toByteArray
  }
}
