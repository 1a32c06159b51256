package graft.operators

/** ORC tail census — completes the data-lake trio beside
  * [[ParquetFooter]] and [[Avro]]. Grammar per the public ORC v1
  * spec: the file ENDS with a 1-byte postscript length; the
  * POSTSCRIPT (always-uncompressed protobuf) carries footer/metadata
  * lengths, the compression kind and block size, the writer version,
  * and the "ORC" magic; the FOOTER (protobuf, possibly compressed in
  * ORC's 3-byte-chunk-header framing: `(len << 1) | isOriginal`,
  * little-endian) carries the type tree, stripe directory
  * (offset/index/data/footer lengths, row counts), total row count,
  * and column statistics.
  *
  * Protobuf wire walking is implemented from the public encoding
  * (varint fields, 64/32-bit fixed, length-delimited) — nothing is
  * linked from the shaded orc jars. Footer compression: NONE and
  * ZLIB (raw deflate chunks through the JDK Inflater) and SNAPPY /
  * ZSTD / LZ4 through the engine's own decoders; LZO rejects by
  * name. Data stripes are OUT OF SCOPE (Spark is the reader of
  * record) — this is the triage layer for ORC arriving as bytes.
  *
  * Fixtures come from the REAL orc-core writer on the classpath; the
  * census is cross-checked against what the real WRITER declares and
  * the row counts the real READER (Spark's ORC source) returns.
  */
object OrcFooter {

  final case class Stripe(nRows: Long, dataBytes: Long)

  final case class Info(
      compression: String,
      compressionBlock: Long,
      nRows: Long,
      nStripes: Int,
      stripeRows: Seq[Long],
      nTypes: Int, // type-tree size incl. the root struct
      rootFieldNames: Seq[String],
      writerVersion: Long,
      contentBytes: Long)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // ---- protobuf wire walk ------------------------------------------

  private final class PScan(val b: Array[Byte], var i: Int, val end: Int) {
    def u8(): Int = {
      if (i >= end) bail("proto_truncated")
      val v = b(i) & 0xff; i += 1; v
    }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (shift < 64) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      bail("proto_bad_varint")
    }
    def bytes(n: Long): Array[Byte] = {
      if (n < 0 || i + n > end) bail("proto_truncated")
      val out = java.util.Arrays.copyOfRange(b, i, i + n.toInt)
      i += n.toInt
      out
    }
  }

  /** Parse one protobuf message into fieldId -> Seq of values
    * (Long for varints/fixed, Array[Byte] for length-delimited). */
  private def message(b: Array[Byte], depth: Int = 0)
      : Map[Int, Seq[Any]] = {
    if (depth > 8) bail("proto_too_deep")
    val s = new PScan(b, 0, b.length)
    val out = scala.collection.mutable.LinkedHashMap
      .empty[Int, Vector[Any]]
    while (s.i < s.end) {
      val tag = s.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      if (field <= 0) bail("proto_bad_field")
      val v: Any = wire match {
        case 0 => java.lang.Long.valueOf(s.varint())
        case 1 => // 64-bit
          var x = 0L
          (0 until 8).foreach(k => x |= s.u8().toLong << (8 * k))
          java.lang.Long.valueOf(x)
        case 2 => s.bytes(s.varint())
        case 5 => // 32-bit
          var x = 0L
          (0 until 4).foreach(k => x |= s.u8().toLong << (8 * k))
          java.lang.Long.valueOf(x)
        case _ => bail(s"proto_wire_unsupported_$wire")
      }
      out(field) = out.getOrElse(field, Vector.empty) :+ v
    }
    out.toMap
  }

  private def longAt(m: Map[Int, Seq[Any]], f: Int, what: String): Long =
    m.get(f).flatMap(_.headOption) match {
      case Some(l: java.lang.Long) => l.longValue()
      case _ => bail(s"missing_$what")
    }
  private def longOpt(m: Map[Int, Seq[Any]], f: Int): Option[Long] =
    m.get(f).flatMap(_.headOption).collect {
      case l: java.lang.Long => l.longValue()
    }

  /** Undo ORC's compressed-stream chunk framing. */
  private def decompress(kind: Long, data: Array[Byte],
      maxOut: Int): Array[Byte] = kind match {
    case 0 => data // NONE
    case _ =>
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < data.length) {
        if (i + 3 > data.length) bail("orc_chunk_truncated")
        val hdr = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
          ((data(i + 2) & 0xff) << 16)
        val original = (hdr & 1) != 0
        val len = hdr >>> 1
        i += 3
        if (len <= 0 || i + len > data.length) bail("orc_chunk_truncated")
        if (out.size() + len > maxOut) bail("orc_bomb")
        if (original) out.write(data, i, len)
        else kind match {
          case 1 => // ZLIB = raw deflate
            val inf = new java.util.zip.Inflater(true)
            inf.setInput(data, i, len)
            val buf = new Array[Byte](8192)
            try {
              while (!inf.finished() && !inf.needsInput()) {
                val n = inf.inflate(buf)
                if (out.size() + n > maxOut) bail("orc_bomb")
                out.write(buf, 0, n)
                if (n == 0 && inf.needsDictionary()) bail("orc_zlib_dict")
              }
            } catch {
              case _: java.util.zip.DataFormatException =>
                bail("orc_zlib_corrupt")
            } finally inf.end()
          case 2 => // SNAPPY raw block
            Snappy.rawDecodeSafe(data, i, len, maxOut - out.size()) match {
              case Right(d) => out.write(d)
              case Left(r) => bail(s"orc_snappy_$r")
            }
          case 4 => // LZ4 raw block
            Lz4.rawDecode(data, i, len, maxOut - out.size()) match {
              case Right(d) => out.write(d)
              case Left(r) => bail(s"orc_lz4_$r")
            }
          case 5 => // ZSTD frame
            Zstd.decode(java.util.Arrays.copyOfRange(data, i, i + len),
              None, maxOut - out.size()) match {
              case Right(frames) =>
                frames.filterNot(_.skippable).foreach(f =>
                  out.write(f.content))
              case Left(r) => bail(s"orc_zstd_${r.reason}")
            }
          case 3 => // LZO1X raw block
            Lzo.rawDecode(data, i, len, maxOut - out.size()) match {
              case Right(d) => out.write(d)
              case Left(r) => bail(s"orc_$r")
            }
          case k => bail(s"orc_compression_unsupported_$k")
        }
        i += len
      }
      out.toByteArray
  }

  def census(blob: Array[Byte], maxOut: Int = 1 << 24)
      : Either[String, Info] =
    try {
      if (blob == null || blob.length < 16) bail("truncated_orc")
      val psLen = blob(blob.length - 1) & 0xff
      if (psLen == 0 || blob.length < psLen + 2) bail("truncated_orc")
      val ps = message(java.util.Arrays.copyOfRange(blob,
        blob.length - 1 - psLen, blob.length - 1))
      // postscript: 1 footerLength, 2 compression, 3 blockSize,
      // 4 version (repeated), 5 metadataLength, 6 writerVersion, 8000 magic
      val magic = ps.get(8000).flatMap(_.headOption) match {
        case Some(m: Array[Byte]) => new String(m, "US-ASCII")
        case _ => ""
      }
      if (magic != "ORC") bail("not_orc")
      val footerLen = longAt(ps, 1, "footer_length")
      val compression = longOpt(ps, 2).getOrElse(0L)
      val compressionBlock = longOpt(ps, 3).getOrElse(0L)
      val metadataLen = longOpt(ps, 5).getOrElse(0L)
      val writerVersion = longOpt(ps, 6).getOrElse(0L)
      val footerStart = blob.length - 1 - psLen - footerLen
      if (footerLen <= 0 || footerStart < 3 || metadataLen < 0 ||
        footerStart - metadataLen < 3) bail("footer_escapes_file")
      val compressionName = compression match {
        case 0 => "none"
        case 1 => "zlib"
        case 2 => "snappy"
        case 3 => "lzo"
        case 4 => "lz4"
        case 5 => "zstd"
        case k => s"unknown_$k"
      }

      val footerBytes = decompress(compression,
        java.util.Arrays.copyOfRange(blob, footerStart.toInt,
          (footerStart + footerLen).toInt), maxOut)
      val footer = message(footerBytes)
      // footer: 1 headerLength, 2 contentLength, 3 stripes(rep),
      // 4 types(rep), 5 metadata, 6 numberOfRows, 7 statistics, ...
      val nRows = longAt(footer, 6, "number_of_rows")
      val contentBytes = longOpt(footer, 2).getOrElse(0L)
      val stripes = footer.getOrElse(3, Seq.empty).map {
        case b: Array[Byte] =>
          val m = message(b, 1)
          // stripe: 1 offset, 2 indexLength, 3 dataLength,
          // 4 footerLength, 5 numberOfRows
          longAt(m, 5, "stripe_rows")
        case _ => bail("bad_stripe")
      }
      if (stripes.map(identity).sum != nRows) bail("stripe_rows_mismatch")
      val types = footer.getOrElse(4, Seq.empty)
      if (types.isEmpty) bail("missing_types")
      val root = types.head match {
        case b: Array[Byte] => message(b, 1)
        case _ => bail("missing_types")
      }
      // type: 1 kind, 2 subtypes(rep varint), 3 fieldNames(rep)
      val rootFields = root.getOrElse(3, Seq.empty).map {
        case b: Array[Byte] => new String(b, "UTF-8")
        case _ => bail("bad_type")
      }
      Right(Info(compressionName, compressionBlock, nRows, stripes.length,
        stripes, types.length, rootFields, writerVersion, contentBytes))
    } catch { case e: Bail => Left(e.reason) }
}
