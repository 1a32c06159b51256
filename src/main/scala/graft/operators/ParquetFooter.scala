package graft.operators

/** Parquet FOOTER census — the data-lake format itself. A 100 TB
  * corpus is full of foreign parquet (datasets redistributed as
  * files, crawled artifact stores), and triage wants the metadata —
  * schema width, row counts, row-group shape, codecs — without
  * spinning up a full reader per blob. The footer is public grammar:
  * `PAR1` magic at both ends, a little-endian u32 footer length, and
  * a `FileMetaData` struct in THRIFT COMPACT protocol (varint +
  * zigzag field headers with delta-encoded ids, size-prefixed
  * strings, nibble-headed lists) — implemented here from the public
  * thrift compact spec, not linked from parquet-mr.
  *
  * Extracted (parquet.thrift field ids): version(1), schema(2) as
  * (name, type, num_children), num_rows(3), row_groups(4) with
  * per-chunk codec/type/num_values, created_by(6). Data-page decode
  * is OUT OF SCOPE (Spark itself is the reader of record for data);
  * this is the census layer for blobs that arrive as bytes.
  *
  * Cross-checked against real writers and readers: fixtures come from
  * the on-classpath parquet-mr via Spark's own writer in the spec,
  * and the census numbers are compared against DuckDB's independent
  * `parquet_metadata()` over the driver-generated testdata files.
  * Reject-don't-guess: bad magic, footer length escaping the file,
  * malformed thrift (depth/size caps), unknown compact types all
  * quarantine by name.
  */
object ParquetFooter {

  final case class Column(
      pathInSchema: String,
      typeName: String,
      codec: String,
      nValues: Long,
      compressedBytes: Long,
      uncompressedBytes: Long)

  final case class Info(
      version: Int,
      nRows: Long,
      nRowGroups: Int,
      nLeafColumns: Int,
      schemaFields: Seq[String], // leaf field names in order
      codecs: Set[String],
      createdBy: String,
      footerBytes: Int)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // ---- thrift compact protocol (public spec) -----------------------

  private final class TScan(val b: Array[Byte], var i: Int, val end: Int) {
    def u8(): Int = {
      if (i >= end) bail("thrift_truncated")
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
      bail("thrift_bad_varint")
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || i + n > end) bail("thrift_truncated")
      val out = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n
      out
    }
  }

  /** Generic compact-protocol values: structs become Map[fieldId ->
    * value], lists Seq[Any], strings Array[Byte], ints java.lang.Long,
    * bools java.lang.Boolean, doubles java.lang.Double. */
  private def readStruct(s: TScan, depth: Int): Map[Int, Any] = {
    if (depth > 16) bail("thrift_too_deep")
    val fields = Map.newBuilder[Int, Any]
    var lastId = 0
    var stop = false
    while (!stop) {
      val head = s.u8()
      if (head == 0) stop = true
      else {
        val delta = (head >> 4) & 0xF
        val tpe = head & 0xF
        val id =
          if (delta != 0) lastId + delta
          else s.zigzag().toInt
        lastId = id
        fields += id -> readValue(s, tpe, depth)
      }
    }
    fields.result()
  }

  private def readValue(s: TScan, tpe: Int, depth: Int): Any = tpe match {
    case 1 => java.lang.Boolean.TRUE
    case 2 => java.lang.Boolean.FALSE
    case 3 => java.lang.Long.valueOf(s.u8().toByte.toLong) // i8: raw byte
    case 4 | 5 | 6 => java.lang.Long.valueOf(s.zigzag())
    case 7 => // double: 8 bytes little-endian
      var v = 0L
      var k = 0
      while (k < 8) { v |= (s.u8().toLong) << (8 * k); k += 1 }
      java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(v))
    case 8 => // binary/string
      val n = s.varint()
      if (n > (1 << 24)) bail("thrift_string_too_long")
      s.bytes(n.toInt)
    case 9 | 10 => // list / set
      // containers count against depth too: list-of-list-of-... is one
      // byte per level, so recursing with the SAME depth lets a tiny
      // footer drive a StackOverflowError
      if (depth > 16) bail("thrift_too_deep")
      val head = s.u8()
      val elemType = head & 0xF
      val n0 = (head >> 4) & 0xF
      val n = if (n0 == 15) s.varint() else n0.toLong
      if (n < 0 || n > (1 << 22)) bail("thrift_list_too_long")
      (0L until n).map { _ =>
        if (elemType == 1 || elemType == 2) {
          // bools in collections are full bytes
          java.lang.Boolean.valueOf(s.u8() == 1)
        } else readValue(s, elemType, depth + 1)
      }
    case 11 => // map
      if (depth > 16) bail("thrift_too_deep")
      val n = s.varint()
      if (n < 0 || n > (1 << 22)) bail("thrift_list_too_long")
      if (n == 0) Map.empty[Any, Any]
      else {
        val kv = s.u8()
        val kt = (kv >> 4) & 0xF
        val vt = kv & 0xF
        (0L until n).map(_ =>
          readValue(s, kt, depth + 1) -> readValue(s, vt, depth + 1)).toMap
      }
    case 12 => readStruct(s, depth + 1)
    case _ => bail(s"thrift_type_unsupported_$tpe")
  }

  private val TypeNames = Map(0L -> "boolean", 1L -> "int32",
    2L -> "int64", 3L -> "int96", 4L -> "float", 5L -> "double",
    6L -> "byte_array", 7L -> "fixed_len_byte_array")
  private val CodecNames = Map(0L -> "uncompressed", 1L -> "snappy",
    2L -> "gzip", 3L -> "lzo", 4L -> "brotli", 5L -> "lz4",
    6L -> "zstd", 7L -> "lz4_raw")

  def census(blob: Array[Byte]): Either[String, Info] =
    try {
      if (blob == null || blob.length < 12) bail("truncated_parquet")
      def magicAt(p: Int): Boolean =
        blob(p) == 'P' && blob(p + 1) == 'A' && blob(p + 2) == 'R' &&
          blob(p + 3) == '1'
      if (!magicAt(0)) bail("not_parquet")
      if (!magicAt(blob.length - 4)) bail("truncated_parquet")
      val footerLen = ((blob(blob.length - 8) & 0xffL) |
        ((blob(blob.length - 7) & 0xffL) << 8) |
        ((blob(blob.length - 6) & 0xffL) << 16) |
        ((blob(blob.length - 5) & 0xffL) << 24)).toInt
      val footerStart = blob.length - 8 - footerLen
      if (footerLen <= 0 || footerStart < 4) bail("footer_escapes_file")

      val root = readStruct(
        new TScan(blob, footerStart, footerStart + footerLen), 0)

      def str(a: Any): String = a match {
        case b: Array[Byte] => new String(b, "UTF-8")
        case _ => ""
      }
      def long(a: Any, what: String): Long = a match {
        case l: java.lang.Long => l.longValue()
        case _ => bail(s"missing_$what")
      }
      val version = long(root.getOrElse(1, null), "version").toInt
      val nRows = long(root.getOrElse(3, null), "num_rows")
      val createdBy = root.get(6).map(str).getOrElse("")

      // schema: list<SchemaElement>; element 0 is the root
      val schema = root.getOrElse(2, bail("missing_schema")) match {
        case s: Seq[_] => s.collect { case m: Map[Int, Any] @unchecked => m }
        case _ => bail("missing_schema")
      }
      if (schema.isEmpty) bail("missing_schema")
      val leaves = schema.drop(1).filter(e => !e.contains(5) ||
        long(e(5), "num_children") == 0)
      val leafNames = leaves.map(e => str(e.getOrElse(4, null)))

      val rowGroups = root.get(4) match {
        case Some(s: Seq[_]) =>
          s.collect { case m: Map[Int, Any] @unchecked => m }
        case _ => Seq.empty
      }
      val codecs = Set.newBuilder[String]
      var nCols = -1
      rowGroups.foreach { rg =>
        val chunks = rg.get(1) match {
          case Some(s: Seq[_]) =>
            s.collect { case m: Map[Int, Any] @unchecked => m }
          case _ => Seq.empty
        }
        if (nCols < 0) nCols = chunks.length
        else if (nCols != chunks.length) bail("ragged_row_groups")
        chunks.foreach { ch =>
          ch.get(3).foreach {
            case md: Map[Int, Any] @unchecked =>
              md.get(4).foreach(c =>
                codecs += CodecNames.getOrElse(long(c, "codec"),
                  s"codec_${long(c, "codec")}"))
            case _ => ()
          }
        }
      }
      Right(Info(version, nRows, rowGroups.length, leafNames.length,
        leafNames, codecs.result(), createdBy, footerLen))
    } catch { case e: Bail => Left(e.reason) }
}
