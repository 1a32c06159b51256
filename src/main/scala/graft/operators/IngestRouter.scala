package graft.operators

/** GENERIC blob dispatch — the front door a real mixed-corpus ingest
  * runs before any per-format query: sniff the concrete family from
  * the container's own magic (never a file extension), route to the
  * owning parser, and surface that parser's NAMED fate unchanged.
  * This is the seam that keeps new parsers from being reachable only
  * through their dedicated queries: a `.tar.Z`, 7z, RAR, SQLite,
  * Avro, ORC, or parquet blob arriving through the generic census
  * lands in its real operator here.
  *
  * Dispatch order (first magic wins):
  *   - 7z signature            → [[SevenZip]]   (members; incl. BCJ chains)
  *   - RAR4/RAR5 signatures    → [[Rar]]        (census + stored bodies)
  *   - SQLite header           → [[Sqlite]]     (schema census)
  *   - Avro object container   → [[Avro]]       (block/record census)
  *   - ORC magic               → [[OrcFooter]]  (tail census)
  *   - parquet magic           → [[ParquetFooter]] (footer census)
  *   - ustar magic at 257      → [[Tar]]        (members)
  *   - compress/gzip/xz/bz2/zstd/lz4-frame → decode ONE layer,
  *     re-route the inner blob (`tar.Z`, `tar.gz`, `tar.xz`,
  *     `tar.bz2`, `tar.zst`, `tar.lz4`, ... — depth 1, a
  *     wrapper-of-wrapper rejects as `nested_wrapper`)
  *   - zip / CFB / otherwise   → [[OfficeRouter]] (office family,
  *     `unrouted_zip`, `ole2_unknown`, `zip_*`, `not_a_container`)
  *
  * `text` carries each format's natural replayable text (member
  * bodies, schema SQL, field names) decoded STRICTLY — a member that
  * fails UTF-8 quarantines by name rather than mojibaking into the
  * corpus. `units` is the format's natural count (members, tables,
  * records, rows). Per-row, shuffle-free — same scaling posture as
  * every other codec walk.
  */
object IngestRouter {

  final case class Routed(format: String, text: String, units: Long)
  final case class Rejected(reason: String)

  private def utf8All(bodies: Seq[Array[Byte]])
      : Either[Rejected, Seq[String]] = {
    val out = Seq.newBuilder[String]
    bodies.foreach { b =>
      CharsetSniff.decodeStrict(b, 0, "UTF-8") match {
        case Some(s) => out += s
        case None => return Left(Rejected("member_not_utf8"))
      }
    }
    Right(out.result())
  }

  private def looksLikeAvro(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'O' && b(1) == 'b' && b(2) == 'j' && b(3) == 1

  private def looksLikeOrc(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 'O' && b(1) == 'R' && b(2) == 'C'

  private def looksLikeParquet(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'P' && b(1) == 'A' && b(2) == 'R' && b(3) == '1'

  private def looksLikeTar(b: Array[Byte]): Boolean =
    b.length > 262 && b(257) == 'u' && b(258) == 's' && b(259) == 't' &&
      b(260) == 'a' && b(261) == 'r'

  /** (codec extension, one-layer decode) when the blob is a recognized
    * compression wrapper. */
  private def wrapper(b: Array[Byte])
      : Option[(String, () => Either[String, Array[Byte]])] =
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x9d)
      Some(("Z", () => UnixCompress.decode(b).left.map(_.reason)))
    else if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      Some(("gz", () => Warc.gunzipAll(b).toRight("gzip_invalid")))
    else if (b.length >= 6 && (b(0) & 0xff) == 0xfd && b(1) == '7' &&
      b(2) == 'z' && b(3) == 'X' && b(4) == 'Z' && b(5) == 0)
      Some(("xz", () => Xz.decode(b).left.map(_.reason)))
    else if (b.length >= 3 && b(0) == 'B' && b(1) == 'Z' && b(2) == 'h')
      Some(("bz2", () => Bzip2.decode(b).left.map(_.reason)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0x28 && (b(1) & 0xff) == 0xb5 &&
      (b(2) & 0xff) == 0x2f && (b(3) & 0xff) == 0xfd)
      Some(("zst", () => Zstd.decode(b).map { frames =>
        val out = new java.io.ByteArrayOutputStream()
        frames.filterNot(_.skippable).foreach(f => out.write(f.content))
        out.toByteArray
      }.left.map(_.reason)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0x04 && (b(1) & 0xff) == 0x22 &&
      (b(2) & 0xff) == 0x4d && (b(3) & 0xff) == 0x18)
      Some(("lz4", () => Lz4.decode(b).left.map(_.reason)))
    else None

  def route(blob: Array[Byte], maxOut: Int = 1 << 26)
      : Either[Rejected, Routed] = routeDepth(blob, maxOut, 0)

  private def routeDepth(blob: Array[Byte], maxOut: Int, depth: Int)
      : Either[Rejected, Routed] =
    if (blob == null || blob.length < 4)
      Left(Rejected("not_a_container"))
    else if (SevenZip.looksLike7z(blob))
      SevenZip.parse(blob, maxOut) match {
        case Left(r) => Left(Rejected(r))
        case Right(p) =>
          utf8All(p.members.map(_.body)).map(texts =>
            Routed("7z", texts.mkString("\n"), p.members.length.toLong))
      }
    else if (Rar.generation(blob) != 0)
      Rar.parse(blob, maxOut) match {
        case Left(r) => Left(Rejected(r))
        case Right(p) =>
          utf8All(p.members.flatMap(_.body)).map(texts =>
            Routed(s"rar${p.generation}", texts.mkString("\n"),
              p.members.length.toLong))
      }
    else if (Sqlite.looksLikeSqlite(blob))
      Sqlite.parse(blob, maxOut) match {
        case Left(r) => Left(Rejected(r))
        case Right(i) =>
          Right(Routed("sqlite", i.schema.map(_.sql).mkString("\n"),
            i.nTables.toLong))
      }
    else if (looksLikeAvro(blob))
      Avro.census(blob) match {
        case Left(r) => Left(Rejected(r))
        case Right(i) =>
          Right(Routed("avro", s"codec=${i.codec} records=${i.nRecords}",
            i.nRecords))
      }
    else if (looksLikeOrc(blob))
      OrcFooter.census(blob) match {
        case Left(r) => Left(Rejected(r))
        case Right(i) =>
          Right(Routed("orc", i.rootFieldNames.mkString(","), i.nRows))
      }
    else if (looksLikeParquet(blob))
      ParquetFooter.census(blob) match {
        case Left(r) => Left(Rejected(r))
        case Right(i) =>
          Right(Routed("parquet", i.schemaFields.mkString(","), i.nRows))
      }
    else if (looksLikeTar(blob))
      Tar.parse(blob) match {
        case Left(r) => Left(Rejected(r.reason))
        case Right(ms) =>
          utf8All(ms.map(_.body)).map(texts =>
            Routed("tar", texts.mkString("\n"), ms.length.toLong))
      }
    else wrapper(blob) match {
      case Some((ext, dec)) =>
        if (depth > 0) Left(Rejected("nested_wrapper"))
        else dec() match {
          case Left(r) => Left(Rejected(r))
          case Right(inner) =>
            routeDepth(inner, maxOut, depth + 1).map(r =>
              r.copy(format = s"${r.format}.$ext"))
        }
      case None =>
        OfficeRouter.route(blob) match {
          case Left(r) => Left(Rejected(r.reason))
          case Right(r) => Right(Routed(r.format, r.text, r.units))
        }
    }
}
