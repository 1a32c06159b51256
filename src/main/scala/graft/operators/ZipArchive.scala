package graft.operators

/** Minimal ZIP reader/writer (PKWARE APPNOTE.TXT grammar) — the other
  * container crawled corpora and document dumps actually arrive in
  * (e-book bundles, office documents, dataset shards). Stored (method 0)
  * and deflate (method 8) members via `java.util.zip`, which is the
  * public JDK surface.
  *
  * Same reject-don't-guess contract as [[Warc]] and the codecs: a blob
  * violating the grammar anywhere — bad signature, data-descriptor
  * framing this reader doesn't accept, truncated member, CRC-32 or
  * size mismatch after inflation, central directory disagreeing with
  * the members walked — parses to None, never a partial member list.
  * A 100 TB ingest wants corrupt shards quarantined, not half-read.
  *
  * Allocation cap: total UNCOMPRESSED bytes declared across members must
  * stay under 1 << 26 (the codecs' shared cap; deflate expands ~1000x,
  * so a small hostile archive may declare huge members — reject before
  * allocating).
  */
object ZipArchive {

  final case class ZipMember(name: String, body: Array[Byte])

  private val LocalSig = 0x04034b50
  private val CentralSig = 0x02014b50
  private val EocdSig = 0x06054b50
  private val MaxTotalBytes = 1L << 26

  import LE.{putU16, putU32, u16, u32}

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

  /** Parse a whole archive into its members, or None on ANY violation.
    * Walks local headers sequentially (CRC + both sizes verified per
    * member), then requires the central directory's entry count and the
    * EOCD to agree with what was walked. Rejects data-descriptor framing
    * (flag bit 3: sizes deferred past the payload — a streaming writer's
    * shape this deterministic reader does not accept), encrypted members
    * (flag bit 0), and unknown methods.
    */
  def parse(blob: Array[Byte]): Option[Seq[ZipMember]] = {
    val out = Seq.newBuilder[ZipMember]
    var i = 0
    var nMembers = 0
    var totalDeclared = 0L
    var done = false
    while (!done) {
      if (i + 4 > blob.length) return None
      val sig = u32(blob, i)
      if (sig == CentralSig || sig == EocdSig) done = true
      else if (sig != LocalSig) return None
      else {
        if (i + 30 > blob.length) return None
        val flags = u16(blob, i + 6)
        val method = u16(blob, i + 8)
        if ((flags & 0x1) != 0 || (flags & 0x8) != 0) return None
        if (method != 0 && method != 8) return None
        val crc = u32(blob, i + 14)
        val csize = u32(blob, i + 18)
        val usize = u32(blob, i + 22)
        val nameLen = u16(blob, i + 26)
        val extraLen = u16(blob, i + 28)
        totalDeclared += usize
        if (totalDeclared > MaxTotalBytes) return None
        val dataStart = i + 30 + nameLen + extraLen
        if (dataStart + csize > blob.length) return None
        val name = new String(blob, i + 30, nameLen, "UTF-8")
        val raw = java.util.Arrays.copyOfRange(blob, dataStart, dataStart + csize.toInt)
        val body =
          if (method == 0) {
            if (csize != usize) return None
            raw
          } else {
            val inf = new java.util.zip.Inflater(true)
            inf.setInput(raw)
            val dst = new Array[Byte](usize.toInt)
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
                if (inf.inflate(probe) > 0) return None
              }
              // a valid member inflates to exactly usize and consumes raw
              if (total != usize || !inf.finished()) return None
            } catch {
              case _: java.util.zip.DataFormatException => return None
            } finally inf.end()
            dst
          }
        if (crc32(body) != crc) return None
        out += ZipMember(name, body)
        nMembers += 1
        i = dataStart + csize.toInt
      }
    }
    // central directory: skip entries, then EOCD must declare the same
    // member count we walked
    var cdEntries = 0
    while (i + 4 <= blob.length && u32(blob, i) == CentralSig) {
      if (i + 46 > blob.length) return None
      val nameLen = u16(blob, i + 28)
      val extraLen = u16(blob, i + 30)
      val commentLen = u16(blob, i + 32)
      i += 46 + nameLen + extraLen + commentLen
      cdEntries += 1
    }
    if (i + 22 > blob.length || u32(blob, i) != EocdSig) return None
    val eocdCount = u16(blob, i + 10)
    val commentLen = u16(blob, i + 20)
    if (i + 22 + commentLen != blob.length) return None
    if (cdEntries != nMembers || eocdCount != nMembers) return None
    if (nMembers == 0) None else Some(out.result())
  }

  /** ZIP fixture corpus: every 4 consecutive documents become one
    * archive (archive_id = doc_id / 4), each doc a member named
    * `doc-<id>.txt` with its UTF-8 text as the body — alternating
    * stored/deflate members so both method paths are exercised on
    * every archive. Deterministic byte-for-byte (zeroed timestamps). */
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
        Multimodal.MediaRow(aid, "zip", write(members, i => i % 2 == 1))
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
        case Some(ms) =>
          ms.map(m => (row.media_id, m.name, m.body.length.toLong, m.body))
        case None => Seq.empty
      }
    }.toDF("archive_id", "name", "n_bytes", "body")
  }
}
