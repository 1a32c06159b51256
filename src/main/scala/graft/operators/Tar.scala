package graft.operators

/** Minimal ustar (POSIX.1-1988 tar) reader/writer — the third container
  * format web corpora and dataset dumps arrive in, alongside [[Warc]]
  * and [[ZipArchive]]. 512-byte header blocks with octal size fields
  * and a spaces-substituted checksum, file data padded to block
  * boundaries, archive terminated by two zero blocks.
  *
  * Reject-don't-guess with NAMED fates (house `Either`, the same
  * round-15 upgrade [[ZipArchive]] got): a bad magic, checksum
  * mismatch, malformed octal field, truncated data, missing
  * terminator, or an unsupported entry type (only regular files —
  * '0' or NUL) quarantines the WHOLE archive under its reason. Total
  * declared bytes capped at 1 << 26 before any allocation
  * (`tar_bomb`).
  */
object Tar {

  final case class TarMember(name: String, body: Array[Byte])

  final case class Rejected(reason: String)

  private val Block = 512
  private val MaxTotalBytes = 1L << 26

  private def octal(v: Long, width: Int): Array[Byte] = {
    // width-1 octal digits, NUL terminated (the classic format)
    val s = ("%0" + (width - 1) + "o").format(v)
    (s + "\u0000").getBytes("US-ASCII")
  }

  private def parseOctal(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    var i = off
    val end = off + len
    // skip leading spaces
    while (i < end && b(i) == ' ') i += 1
    var v = 0L
    var digits = 0
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; digits += 1
      if (v > (1L << 40)) return None
    }
    // remainder must be NUL/space padding
    while (i < end && (b(i) == 0 || b(i) == ' ')) i += 1
    if (digits == 0 || i != end) None else Some(v)
  }

  private def headerChecksum(hdr: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < Block) {
      s += (if (i >= 148 && i < 156) ' '.toInt else hdr(i) & 0xff)
      i += 1
    }
    s
  }

  /** Serialize regular-file members, zeroed mtime/uid/gid for
    * determinism, ustar magic, two-zero-block terminator. */
  def write(members: Seq[TarMember]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { m =>
      val hdr = new Array[Byte](Block)
      val nameB = m.name.getBytes("UTF-8")
      require(nameB.length <= 100, s"name too long: ${m.name}")
      System.arraycopy(nameB, 0, hdr, 0, nameB.length)
      System.arraycopy(octal(420, 8), 0, hdr, 100, 8) // mode 0644
      System.arraycopy(octal(0, 8), 0, hdr, 108, 8) // uid
      System.arraycopy(octal(0, 8), 0, hdr, 116, 8) // gid
      System.arraycopy(octal(m.body.length.toLong, 12), 0, hdr, 124, 12)
      System.arraycopy(octal(0, 12), 0, hdr, 136, 12) // mtime
      hdr(156) = '0' // regular file
      System.arraycopy(("ustar" + "\u0000" + "00").getBytes("US-ASCII"), 0, hdr, 257, 8)
      val ck = headerChecksum(hdr)
      // checksum: 6 octal digits, NUL, space
      System.arraycopy(("%06o".format(ck) + "\u0000" + " ").getBytes("US-ASCII"),
        0, hdr, 148, 8)
      out.write(hdr)
      out.write(m.body)
      val pad = (Block - m.body.length % Block) % Block
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * Block))
    out.toByteArray
  }

  /** Parse a whole archive, or a NAMED rejection on ANY violation. */
  def parse(blob: Array[Byte]): Either[Rejected, Seq[TarMember]] = {
    def no(reason: String) = Left(Rejected(reason))
    if (blob.length % Block != 0) return no("tar_not_block_aligned")
    val out = Seq.newBuilder[TarMember]
    var i = 0
    var total = 0L
    var n = 0
    var terminated = false
    while (!terminated) {
      if (i + Block > blob.length) return no("tar_truncated")
      val hdr = java.util.Arrays.copyOfRange(blob, i, i + Block)
      if (hdr.forall(_ == 0)) {
        // first zero block: require a second, and nothing but zeros after
        if (i + 2 * Block > blob.length) return no("tar_truncated")
        var j = i + Block
        while (j < blob.length) {
          if (blob(j) != 0) return no("tar_trailing_garbage")
          j += 1
        }
        terminated = true
      } else {
        val magic = new String(hdr, 257, 5, "US-ASCII")
        if (magic != "ustar") return no("tar_bad_magic")
        val declared = parseOctal(hdr, 148, 8) match {
          case Some(v) => v
          case None => return no("tar_bad_octal")
        }
        if (headerChecksum(hdr) != declared) return no("tar_bad_checksum")
        if (hdr(156) != '0' && hdr(156) != 0)
          return no("tar_entry_type_unsupported") // regular files only
        val size = parseOctal(hdr, 124, 12) match {
          case Some(v) => v
          case None => return no("tar_bad_octal")
        }
        total += size
        if (total > MaxTotalBytes) return no("tar_bomb")
        var nameLen = 0
        while (nameLen < 100 && hdr(nameLen) != 0) nameLen += 1
        if (nameLen == 0) return no("tar_bad_name")
        val name = new String(hdr, 0, nameLen, "UTF-8")
        val dataStart = i + Block
        val padded = ((size + Block - 1) / Block * Block).toInt
        if (dataStart + padded > blob.length) return no("tar_truncated")
        // padding after the data must be zeros (a smuggled byte there
        // is corruption, not slack)
        var j = dataStart + size.toInt
        while (j < dataStart + padded) {
          if (blob(j) != 0) return no("tar_bad_padding")
          j += 1
        }
        out += TarMember(name,
          java.util.Arrays.copyOfRange(blob, dataStart, dataStart + size.toInt))
        n += 1
        i = dataStart + padded
      }
    }
    if (n == 0) no("tar_empty") else Right(out.result())
  }

  /** TAR fixture corpus: every 5 consecutive documents become one
    * archive (archive_id = doc_id / 5), each doc a regular-file member
    * `doc-<id>.txt` carrying its UTF-8 text. */
  def tarFilesFromDocuments(
      spark: org.apache.spark.sql.SparkSession,
      documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    documents.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .groupByKey(_._1 / 5)
      .mapGroups { (aid, it) =>
        val members = it.toSeq.sortBy(_._1).map { case (id, text) =>
          TarMember(s"doc-$id.txt", Option(text).getOrElse("").getBytes("UTF-8"))
        }
        Multimodal.MediaRow(aid, "tar", write(members))
      }
  }

  /** Explode archives into member rows (quarantine on corrupt). */
  def extractTarMembers(
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
