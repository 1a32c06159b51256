package graft.operators

/** ZIP reader/writer (PKWARE APPNOTE.TXT grammar) — the container
  * crawled corpora and document dumps actually arrive in (e-book
  * bundles, office documents, dataset shards, "download as zip"
  * endpoints). Member codings: stored (0) and deflate (8) via
  * `java.util.zip`, bzip2 (12) and LZMA (14, with the APPNOTE 5.8
  * version/props framing and the flag-bit-1 end-of-stream marker)
  * through the engine's own [[Bzip2]]/[[Lzma2]] decoders — the
  * non-deflate methods 7-Zip commonly writes; zstd (93), xz (95),
  * deflate64 (9) and the rest reject by method id.
  *
  * The reader walks CENTRAL-DIRECTORY-FIRST: the CD always carries the
  * true sizes/CRC even when the member was written by a streaming
  * writer (flag bit 3: local sizes deferred to a data descriptor past
  * the payload — the default output of Java's `ZipOutputStream`, Go's
  * `archive/zip`, and every web service zipping to a socket). Local
  * headers are then verified AGAINST the CD truth, data descriptors
  * checked where bit 3 declares them, and zip64 honored end-to-end
  * (EOCD64 + locator, 0xFFFFFFFF sentinels resolved through the
  * 0x0001 extended-information extra field).
  *
  * Same reject-don't-guess contract as [[Warc]] and the codecs, but
  * with NAMED fates (house `Either`): a blob violating the grammar
  * anywhere — no EOCD, CD/local disagreement, descriptor mismatch,
  * zip64 sentinel without its extra field, CRC-32 or size mismatch
  * after inflation, bytes between members the CD cannot account for —
  * quarantines under its reason, never a partial member list. A
  * 100 TB ingest wants corrupt shards counted BY FAILURE CLASS, not
  * swallowed into an anonymous bucket.
  *
  * Allocation cap: total UNCOMPRESSED bytes declared across members
  * must stay under 1 << 26 (the codecs' shared cap; deflate expands
  * ~1000x, so a small hostile archive may declare huge members —
  * `zip_bomb` before allocating).
  */
object ZipArchive {

  final case class ZipMember(name: String, body: Array[Byte])

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private val LocalSig = 0x04034b50L
  private val CentralSig = 0x02014b50L
  private val EocdSig = 0x06054b50L
  private val Eocd64Sig = 0x06064b50L
  private val Eocd64LocSig = 0x07064b50L
  private val DescSig = 0x08074b50L
  private val MaxTotalBytes = 1L << 26
  private val MaxMembers = 1 << 18

  import LE.{putU16, putU32, u16, u32}

  private def u64(b: Array[Byte], i: Int): Long =
    u32(b, i) | (u32(b, i + 4) << 32)

  private def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(data); c.getValue
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Write a deterministic archive: fixed zeroed timestamps, headers in
    * member order, full central directory + EOCD. `deflated(i)` picks
    * method 8 for member i, else stored — both paths exercised by the
    * fixtures. */
  def write(members: Seq[ZipMember], deflated: Int => Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val entries = members.zipWithIndex.map { case (m, idx) =>
      val offset = out.size()
      val nameB = m.name.getBytes("UTF-8")
      val method = if (deflated(idx)) 8 else 0
      val data = if (method == 8) deflateRaw(m.body) else m.body
      putU32(out, LocalSig); putU16(out, 20); putU16(out, 0); putU16(out, method)
      putU16(out, 0); putU16(out, 0) // mod time/date zeroed: deterministic
      putU32(out, crc32(m.body)); putU32(out, data.length.toLong)
      putU32(out, m.body.length.toLong); putU16(out, nameB.length); putU16(out, 0)
      out.write(nameB); out.write(data)
      (m, nameB, method, data.length.toLong, offset.toLong)
    }
    val cdStart = out.size()
    entries.foreach { case (m, nameB, method, csize, offset) =>
      putU32(out, CentralSig); putU16(out, 20); putU16(out, 20); putU16(out, 0)
      putU16(out, method); putU16(out, 0); putU16(out, 0)
      putU32(out, crc32(m.body)); putU32(out, csize); putU32(out, m.body.length.toLong)
      putU16(out, nameB.length); putU16(out, 0); putU16(out, 0)
      putU16(out, 0); putU16(out, 0); putU32(out, 0); putU32(out, offset)
      out.write(nameB)
    }
    val cdSize = out.size() - cdStart
    putU32(out, EocdSig); putU16(out, 0); putU16(out, 0)
    putU16(out, entries.size); putU16(out, entries.size)
    putU32(out, cdSize.toLong); putU32(out, cdStart.toLong); putU16(out, 0)
    out.toByteArray
  }

  /** 1990-01-01 local midnight: inside the DOS-time range, so the JDK
    * writer emits a plain dostime with NO extended-timestamp extra —
    * deterministic fixture bytes. */
  private lazy val FixedEntryTime: Long = {
    val c = java.util.Calendar.getInstance()
    c.clear(); c.set(1990, 0, 1, 0, 0, 0)
    c.getTimeInMillis
  }

  /** Deterministic STREAMED archive through the JDK's own streaming
    * writer (`ZipOutputStream` over an unseekable stream): every
    * DEFLATED member gets flag bit 3 and a signed data descriptor —
    * the wire shape every zip-to-a-socket service produces and the
    * one the pre-round-15 reader rejected blind. */
  def writeStreamed(members: Seq[ZipMember]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    members.foreach { m =>
      val e = new java.util.zip.ZipEntry(m.name)
      e.setTime(FixedEntryTime)
      z.putNextEntry(e)
      z.write(m.body)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  /** Deterministic STREAMED zip64 archive via commons-compress (the
    * streaming writer on the classpath that can FORCE zip64):
    * `Zip64Mode.Always` plants 0xFFFFFFFF sentinels + 0x0001 extras in
    * every header, 8-byte data descriptors, and an EOCD64 + locator —
    * the framing of >4 GB dataset dumps, exercised here without
    * writing 4 GB. */
  def writeZip64Streamed(members: Seq[ZipMember]): Array[Byte] = {
    import org.apache.commons.compress.archivers.zip.{Zip64Mode, ZipArchiveEntry, ZipArchiveOutputStream}
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipArchiveOutputStream(bos)
    z.setUseZip64(Zip64Mode.Always)
    members.foreach { m =>
      val e = new ZipArchiveEntry(m.name)
      e.setTime(FixedEntryTime)
      z.putArchiveEntry(e)
      z.write(m.body)
      z.closeArchiveEntry()
    }
    z.close()
    bos.toByteArray
  }

  // ---- reader -------------------------------------------------------

  private final case class CdEntry(
      name: String,
      flags: Int,
      method: Int,
      crc: Long,
      csize: Long,
      usize: Long,
      localOff: Long)

  private def decodeName(b: Array[Byte], off: Int, len: Int,
      utf8Flag: Boolean): String =
    CharsetSniff.decodeStrict(java.util.Arrays.copyOfRange(b, off, off + len),
        0, "UTF-8") match {
      case Some(s) => s
      case None =>
        if (utf8Flag) bail("zip_name_bad_utf8")
        // pre-Unicode writers: IBM437 per APPNOTE (total, never fails);
        // latin-1 stands in on a JRE without the extended charsets —
        // still total and deterministic
        val cs =
          if (java.nio.charset.Charset.isSupported("IBM437"))
            java.nio.charset.Charset.forName("IBM437")
          else java.nio.charset.StandardCharsets.ISO_8859_1
        new String(b, off, len, cs)
    }

  /** Resolve 0xFFFFFFFF/0xFFFF sentinels through the 0x0001 zip64
    * extended-information extra field. Values appear in a FIXED order,
    * only for fields that were sentinels. Returns (usize, csize,
    * localOff, sawZip64Extra). */
  private def resolveZip64(b: Array[Byte], extraOff: Int, extraLen: Int,
      usize0: Long, csize0: Long, localOff0: Long, disk0: Int)
      : (Long, Long, Long, Boolean) = {
    val needU = usize0 == 0xFFFFFFFFL
    val needC = csize0 == 0xFFFFFFFFL
    val needO = localOff0 == 0xFFFFFFFFL
    val needD = disk0 == 0xFFFF
    var p = extraOff
    val end = extraOff + extraLen
    var found = false
    var usize = usize0; var csize = csize0; var localOff = localOff0
    while (p + 4 <= end && !found) {
      val id = u16(b, p)
      val sz = u16(b, p + 2)
      if (p + 4 + sz > end) bail("zip_bad_extra")
      if (id == 0x0001) {
        found = true
        var q = p + 4
        val qEnd = p + 4 + sz
        def take8(): Long = {
          if (q + 8 > qEnd) bail("zip64_extra_missing")
          val v = u64(b, q); q += 8; v
        }
        if (needU) usize = take8()
        if (needC) csize = take8()
        if (needO) localOff = take8()
        if (needD) { if (q + 4 > qEnd) bail("zip64_extra_missing"); q += 4 }
      }
      p += 4 + sz
    }
    if ((needU || needC || needO || needD) && !found)
      bail("zip64_extra_missing")
    if (usize < 0 || csize < 0 || localOff < 0) bail("zip64_bad_sizes")
    (usize, csize, localOff, found)
  }

  /** Does a local-header extra block carry the 0x0001 zip64 field?
    * (Per APPNOTE 4.3.9.2 that is what widens the data descriptor's
    * size fields to 8 bytes.) */
  private def localHasZip64(b: Array[Byte], extraOff: Int, extraLen: Int)
      : Boolean = {
    var p = extraOff
    val end = extraOff + extraLen
    while (p + 4 <= end) {
      val id = u16(b, p)
      val sz = u16(b, p + 2)
      if (p + 4 + sz > end) bail("zip_bad_extra")
      if (id == 0x0001) return true
      p += 4 + sz
    }
    false
  }

  /** Parse a whole archive into its members, or a NAMED rejection on
    * ANY violation. Central-directory-first: find the EOCD (and the
    * EOCD64 behind its locator when zip64), walk the CD for the true
    * per-member sizes/CRCs, then verify each local header against CD
    * truth — including streamed members (flag bit 3 + data descriptor)
    * and zip64 sentinel resolution. Every byte of [0, cdStart) must be
    * tiled by the members walked (no smuggled gaps). */
  def parse(blob: Array[Byte]): Either[Rejected, Seq[ZipMember]] =
    try Right(parseOrBail(blob))
    catch { case e: Bail => Left(Rejected(e.reason)) }

  private def parseOrBail(blob: Array[Byte]): Seq[ZipMember] = {
    if (blob == null || blob.length < 4) bail("not_a_container")
    val looksZip = u32(blob, 0) == LocalSig || u32(blob, 0) == EocdSig
    if (blob.length < 22) {
      if (looksZip) bail("zip_no_eocd") else bail("not_a_container")
    }

    // ---- EOCD: comment must fill to end of file (house-strict) ------
    var eocd = -1
    var e = blob.length - 22
    val lo = math.max(0, blob.length - 22 - 65535)
    while (e >= lo && eocd < 0) {
      if (u32(blob, e) == EocdSig && e + 22 + u16(blob, e + 20) == blob.length)
        eocd = e
      e -= 1
    }
    if (eocd < 0) {
      if (looksZip) bail("zip_no_eocd") else bail("not_a_container")
    }

    var nEntries: Long = u16(blob, eocd + 10).toLong
    var cdSize: Long = u32(blob, eocd + 12)
    var cdOff: Long = u32(blob, eocd + 16)
    val diskNo = u16(blob, eocd + 4)
    val cdDisk = u16(blob, eocd + 6)
    val nThisDisk = u16(blob, eocd + 8)
    val anySentinel = nEntries == 0xFFFFL || nThisDisk == 0xFFFF ||
      cdSize == 0xFFFFFFFFL || cdOff == 0xFFFFFFFFL ||
      diskNo == 0xFFFF || cdDisk == 0xFFFF

    // ---- zip64: locator sits immediately before the EOCD ------------
    var cdEndMustBe: Long = eocd.toLong
    if (eocd >= 20 && u32(blob, eocd - 20) == Eocd64LocSig) {
      val locDisk = u32(blob, eocd - 16)
      val eocd64Off = u64(blob, eocd - 12)
      val totalDisks = u32(blob, eocd - 4)
      if (locDisk != 0 || totalDisks != 1) bail("zip_multidisk")
      // subtraction form: an attacker-controlled u64 near 2^63 would
      // wrap `eocd64Off + 56` negative and sail past an additive check
      if (eocd64Off < 0 || eocd64Off > eocd - 20 - 56)
        bail("zip64_bad_eocd64")
      val z = eocd64Off.toInt
      if (u32(blob, z) != Eocd64Sig) bail("zip64_bad_eocd64")
      val recSize = u64(blob, z + 4)
      // record must run exactly up to its locator (strict adjacency)
      if (recSize < 44 || z + 12 + recSize != eocd - 20)
        bail("zip64_bad_eocd64")
      if (u32(blob, z + 16) != 0 || u32(blob, z + 20) != 0)
        bail("zip_multidisk")
      val nThis64 = u64(blob, z + 24)
      val nTotal64 = u64(blob, z + 32)
      if (nThis64 != nTotal64) bail("zip_multidisk")
      // a u64 count >= 2^63 reads as a negative Long and would pass the
      // ==0 / >MaxMembers guards into a NegativeArraySizeException
      if (nTotal64 <= 0) bail("zip64_bad_eocd64")
      nEntries = nTotal64
      cdSize = u64(blob, z + 40)
      cdOff = u64(blob, z + 48)
      cdEndMustBe = eocd64Off
    } else {
      if (anySentinel) bail("zip64_missing_eocd64")
      if (diskNo != 0 || cdDisk != 0 || nThisDisk != nEntries)
        bail("zip_multidisk")
    }

    if (nEntries == 0) bail("zip_empty")
    if (nEntries > MaxMembers) bail("zip_too_many_members")
    if (cdOff < 0 || cdSize < 0 || cdOff + cdSize != cdEndMustBe)
      bail("zip_bad_cd")
    if (nEntries > cdSize / 46 + 1) bail("zip_bad_cd")

    // ---- central directory walk: CD truth per member ----------------
    val entries = new Array[CdEntry](nEntries.toInt)
    var p = cdOff.toInt
    val cdEnd = (cdOff + cdSize).toInt
    var k = 0
    var totalDeclared = 0L
    while (k < nEntries) {
      if (p + 46 > cdEnd || u32(blob, p) != CentralSig) bail("zip_bad_cd")
      val flags = u16(blob, p + 8)
      val method = u16(blob, p + 10)
      val crc = u32(blob, p + 16)
      val csize0 = u32(blob, p + 20)
      val usize0 = u32(blob, p + 24)
      val nameLen = u16(blob, p + 28)
      val extraLen = u16(blob, p + 30)
      val commentLen = u16(blob, p + 32)
      val diskStart = u16(blob, p + 34)
      val localOff0 = u32(blob, p + 42)
      if (p + 46 + nameLen + extraLen + commentLen > cdEnd) bail("zip_bad_cd")
      if ((flags & 0x1) != 0 || (flags & 0x40) != 0) bail("zip_encrypted")
      // 0 stored, 8 deflate (JDK), 12 bzip2 and 14 lzma through the
      // engine's own decoders (7-Zip's common non-deflate zip methods);
      // 93 zstd / 95 xz / 9 deflate64 / encryption methods reject by id
      if (method != 0 && method != 8 && method != 12 && method != 14)
        bail(s"zip_method_unsupported_$method")
      val (usize, csize, localOff, _) = resolveZip64(blob, p + 46 + nameLen,
        extraLen, usize0, csize0, localOff0, diskStart)
      if (diskStart != 0 && diskStart != 0xFFFF) bail("zip_multidisk")
      val name = decodeName(blob, p + 46, nameLen, (flags & 0x800) != 0)
      totalDeclared += usize
      if (totalDeclared > MaxTotalBytes) bail("zip_bomb")
      entries(k) = CdEntry(name, flags, method, crc, csize, usize, localOff)
      p += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    if (p != cdEnd) bail("zip_bad_cd")

    // ---- local walk: verify each member against CD truth ------------
    val bodies = new Array[ZipMember](entries.length)
    val spans = new Array[(Long, Long)](entries.length) // [start, end)
    k = 0
    while (k < entries.length) {
      val en = entries(k)
      // subtraction form (see EOCD64 check): localOff comes from the CD
      // zip64 extra and can wrap an additive bound
      if (en.localOff < 0 || en.localOff > cdOff - 30)
        bail("zip_bad_local_offset")
      val lh = en.localOff.toInt
      if (u32(blob, lh) != LocalSig) bail("zip_bad_local_offset")
      val lflags = u16(blob, lh + 6)
      val lmethod = u16(blob, lh + 8)
      val lcrc = u32(blob, lh + 14)
      val lcsize = u32(blob, lh + 18)
      val lusize = u32(blob, lh + 22)
      val lnameLen = u16(blob, lh + 26)
      val lextraLen = u16(blob, lh + 28)
      if (lh + 30 + lnameLen + lextraLen > cdOff) bail("zip_bad_local_offset")
      // encryption/descriptor bits and the method must agree with CD
      if (lmethod != en.method || ((lflags ^ en.flags) & 0x9) != 0)
        bail("zip_cd_local_mismatch")
      val streamed = (lflags & 0x8) != 0
      val lhZip64 = localHasZip64(blob, lh + 30 + lnameLen, lextraLen)
      if (!streamed) {
        // non-streamed: the local header states sizes — they must be
        // the CD's (resolving local zip64 sentinels the same way)
        val (lu, lc, _, _) =
          if (lcsize == 0xFFFFFFFFL || lusize == 0xFFFFFFFFL)
            resolveZip64(blob, lh + 30 + lnameLen, lextraLen,
              lusize, lcsize, 0L, 0)
          else (lusize, lcsize, 0L, false)
        if (lcrc != en.crc || lc != en.csize || lu != en.usize)
          bail("zip_cd_local_mismatch")
      }
      val dataStart = en.localOff + 30 + lnameLen + lextraLen
      // csize also comes from a zip64 extra: same wrap-safe subtraction
      // (dataStart <= cdOff is already guaranteed two checks up)
      if (en.csize < 0 || en.csize > cdOff - dataStart)
        bail("zip_member_overruns_cd")
      var end = dataStart + en.csize
      if (streamed) {
        // data descriptor follows the payload: optional signature,
        // crc, then sizes — 8 bytes each iff the local header used
        // zip64 (APPNOTE 4.3.9), 4 otherwise. All must match CD truth.
        var q = end
        if (q + 4 <= cdOff && u32(blob, q.toInt) == DescSig) q += 4
        val szW = if (lhZip64) 8 else 4
        if (q + 4 + 2L * szW > cdOff) bail("zip_descriptor_mismatch")
        val dcrc = u32(blob, q.toInt)
        val dcs = if (lhZip64) u64(blob, q.toInt + 4) else u32(blob, q.toInt + 4)
        val dus = if (lhZip64) u64(blob, q.toInt + 12) else u32(blob, q.toInt + 8)
        if (dcrc != en.crc || dcs != en.csize || dus != en.usize)
          bail("zip_descriptor_mismatch")
        end = q + 4 + 2L * szW
      }
      spans(k) = (en.localOff, end)

      // ---- decode against CD truth ----------------------------------
      val cs = en.csize.toInt
      val us = en.usize.toInt
      val raw = java.util.Arrays.copyOfRange(blob, dataStart.toInt,
        dataStart.toInt + cs)
      val body =
        if (en.method == 0) {
          if (en.csize != en.usize) bail("zip_size_mismatch")
          raw
        } else if (en.method == 12) { // bzip2: a complete .bz2 stream
          Bzip2.decode(raw, us) match {
            case Right(d) =>
              if (d.length != us) bail("zip_size_mismatch")
              d
            case Left(r) => bail(s"zip_bzip2_${r.reason}")
          }
        } else if (en.method == 14) {
          // zip-LZMA framing (APPNOTE 5.8): version u16, properties
          // size u16 (5), the 5 LZMA props bytes (lc/lp/pb + dict
          // size), then the raw LZMA stream; decode exactly usize
          // bytes (flag bit 1's optional EOS marker may follow)
          if (raw.length < 9 || u16(raw, 2) != 5) bail("zip_lzma_header")
          // flag bit 1 declares the end-of-stream marker (what every
          // real writer sets for method 14)
          Lzma2.lzma1Decode(raw, 9, raw.length - 9, raw(4) & 0xff,
            us, us, eos = (en.flags & 0x2) != 0) match {
            case Right(d) => d
            case Left(r) => bail(s"zip_lzma_$r")
          }
        } else {
          val inf = new java.util.zip.Inflater(true)
          inf.setInput(raw)
          val dst = new Array[Byte](us)
          try {
            var total = 0
            var n = if (dst.length > 0) inf.inflate(dst) else 0
            while (n > 0 && total + n < dst.length) {
              total += n
              n = inf.inflate(dst, total, dst.length - total)
            }
            total += n
            if (!inf.finished()) {
              // drive the trailer (empty members, tiny final blocks);
              // any EXTRA byte means the declared size lied
              val probe = new Array[Byte](1)
              if (inf.inflate(probe) > 0) bail("zip_size_mismatch")
            }
            if (total != us || !inf.finished()) bail("zip_size_mismatch")
          } catch {
            case _: java.util.zip.DataFormatException =>
              bail("zip_inflate_error")
          } finally inf.end()
          dst
        }
      if (crc32(body) != en.crc) bail("zip_crc_mismatch")
      bodies(k) = ZipMember(en.name, body)
      k += 1
    }

    // ---- coverage: members must tile [0, cdStart) exactly -----------
    // (catches smuggled bytes: descriptors without bit 3, preambles,
    // self-overlapping entries)
    val sorted = spans.sortBy(_._1)
    var cursor = 0L
    sorted.foreach { case (s0, e0) =>
      if (s0 != cursor) bail("zip_layout_gap")
      cursor = e0
    }
    if (cursor != cdOff) bail("zip_layout_gap")

    bodies.toSeq
  }

  /** ZIP fixture corpus: every 4 consecutive documents become one
    * archive (archive_id = doc_id / 4), each doc a member named
    * `doc-<id>.txt` with its UTF-8 text as the body. Three writer
    * regimes by archive id — the in-house deterministic writer
    * (alternating stored/deflate members), the JDK's own STREAMING
    * writer (data descriptors, flag bit 3), and the forced-zip64
    * streaming writer (sentinels + EOCD64) — so all three wire shapes
    * a crawl carries are exercised on every run. */
  def zipFilesFromDocuments(
      spark: org.apache.spark.sql.SparkSession,
      documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / 4)
      .mapGroups { (aid, it) =>
        val members = it.toSeq.sortBy(_._1).map { case (id, text) =>
          ZipMember(s"doc-$id.txt", Option(text).getOrElse("").getBytes("UTF-8"))
        }
        val blob = (aid % 3) match {
          case 1 => writeStreamed(members)
          case 2 => writeZip64Streamed(members)
          case _ => write(members, i => i % 2 == 1)
        }
        Multimodal.MediaRow(aid, "zip", blob)
      }
  }

  /** Explode archives into (archive_id, name, n_bytes, body) member
    * rows; a corrupt archive contributes NOTHING (quarantine, the
    * [[parse]] contract). Per-row work, shuffle-free. */
  def extractZipMembers(
      media: org.apache.spark.sql.Dataset[Multimodal.MediaRow]): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      parse(row.payload) match {
        case Right(ms) =>
          ms.map(m => (row.media_id, m.name, m.body.length.toLong, m.body))
        case Left(_) => Seq.empty
      }
    }.toDF("archive_id", "name", "n_bytes", "body")
  }
}
