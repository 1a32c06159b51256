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
  *   - 7z signature            → [[SevenZip]]   (members; incl. BCJ/BCJ2)
  *   - RAR4/RAR5 signatures    → [[Rar]]        (census + stored bodies)
  *   - SQLite header           → [[Sqlite]]     (schema census)
  *   - Avro object container   → [[Avro]]       (block/record census)
  *   - ORC magic               → [[OrcFooter]]  (tail census)
  *   - parquet magic           → [[ParquetFooter]] (footer census)
  *   - ustar magic at 257      → [[Tar]]        (members)
  *   - compress/gzip/xz/bz2/zstd/lz4-frame → decode ONE layer,
  *     re-route the inner blob (`tar.Z`, `tar.gz`, `tar.xz`,
  *     `tar.bz2`, `tar.zst`, `tar.lz4`, `tar.gz.gz`, ... — wrapper
  *     layers and zip-member recursion share ONE depth budget of
  *     [[MaxDepth]]; past it, `wrapper_depth_exceeded`)
  *   - zip / CFB / otherwise   → [[OfficeRouter]] FIRST (a DOCX must
  *     stay a DOCX). A valid zip the office family does not claim
  *     (`unrouted_zip`) then censuses PER MEMBER — and so does EVERY
  *     member-bearing container (tar / 7z / rar stored bodies): each
  *     extracted member body is routed back through this dispatch one
  *     level deeper, so parquet / Avro / SQLite / tar.gz / nested-zip
  *     members land in their real parsers, strict-UTF-8 members
  *     census as `text`, and every member's fate (format or named
  *     reject reason) is surfaced in `memberFates` in member order.
  *     Before round 16 this was the widest seam left: the single most
  *     common wild data-dump shape (an archive of data blobs) died as
  *     `unrouted_zip`/`member_not_utf8` with every member format's
  *     parser one hop away.
  *
  * Bomb posture: per-parser caps are unchanged, and the whole
  * recursion additionally charges every DERIVED blob (a wrapper
  * decode, a zip member body) against one cumulative byte budget of
  * `maxOut` — a zip of many maximal members cannot multiply the cap.
  * Budget exhaustion quarantines the whole blob as `ingest_bomb`.
  *
  * `text` carries each format's natural replayable text (member
  * bodies, schema SQL, field names) decoded STRICTLY — a member that
  * fails UTF-8 quarantines by name rather than mojibaking into the
  * corpus. `units` is the format's natural count (members, tables,
  * records, rows). Per-row, shuffle-free — same scaling posture as
  * every other codec walk.
  */
object IngestRouter {

  final case class Routed(format: String, text: String, units: Long,
      memberFates: Seq[String] = Nil)
  final case class Rejected(reason: String)

  /** Shared recursion budget: wrapper layers AND zip-member hops both
    * count. Depth 3 covers the real population (`x.gz.gz`,
    * `tar.gz`-inside-a-zip, zip-of-zip-of-data) while keeping a
    * crafted million-layer blob O(1). */
  private val MaxDepth = 3

  /** Cumulative derived-byte budget across one route() call. */
  private final class Budget(var remaining: Long) {
    def charge(n: Long): Boolean = { remaining -= n; remaining >= 0 }
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
      : Either[Rejected, Routed] =
    routeDepth(blob, maxOut, 0, new Budget(maxOut.toLong))

  /** Inner-level dispatch with a strict-UTF-8 `text` fallback: a blob
    * that is NO known container but decodes as UTF-8 is the most
    * common wild wrapper/member payload (`.txt.gz`, `.csv` in a zip).
    * Top-level (depth 0) behavior is unchanged — a bare text blob is
    * not a container, the census must say so. */
  private def routeDepth(blob: Array[Byte], maxOut: Int, depth: Int,
      budget: Budget): Either[Rejected, Routed] =
    dispatch(blob, maxOut, depth, budget) match {
      case Left(Rejected("not_a_container")) if depth > 0 =>
        CharsetSniff.decodeStrict(blob, 0, "UTF-8") match {
          case Some(s) => Right(Routed("text", s, 1L))
          case None => Left(Rejected("not_a_container"))
        }
      case other => other
    }

  private def dispatch(blob: Array[Byte], maxOut: Int, depth: Int,
      budget: Budget): Either[Rejected, Routed] =
    if (blob == null || blob.length < 4)
      Left(Rejected("not_a_container"))
    else if (SevenZip.looksLike7z(blob))
      SevenZip.parse(blob, maxOut) match {
        case Left(r) => Left(Rejected(r))
        case Right(p) =>
          routeMembers("7z", p.members.map(m => m.name -> Some(m.body)),
            maxOut, depth, budget)
      }
    else if (Rar.generation(blob) != 0)
      Rar.parse(blob, maxOut) match {
        case Left(r) => Left(Rejected(r))
        case Right(p) =>
          // compressed rar members are censused, not extracted (decode
          // is not public): their fate says so by name
          routeMembers(s"rar${p.generation}",
            p.members.map(m => m.name -> m.body), maxOut, depth, budget)
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
          routeMembers("tar", ms.map(m => m.name -> Some(m.body)),
            maxOut, depth, budget)
      }
    else wrapper(blob) match {
      case Some((ext, dec)) =>
        if (depth + 1 > MaxDepth) Left(Rejected("wrapper_depth_exceeded"))
        else dec() match {
          case Left(r) => Left(Rejected(r))
          case Right(inner) =>
            if (!budget.charge(inner.length.toLong))
              Left(Rejected("ingest_bomb"))
            else routeDepth(inner, maxOut, depth + 1, budget).map(r =>
              r.copy(format = s"${r.format}.$ext"))
        }
      case None =>
        OfficeRouter.route(blob) match {
          case Left(OfficeRouter.Rejected("unrouted_zip")) =>
            routeZipMembers(blob, maxOut, depth, budget)
          case Left(r) => Left(Rejected(r.reason))
          case Right(r) => Right(Routed(r.format, r.text, r.units))
        }
    }

  /** Per-member census of a valid zip the office family does not
    * claim: parse once more (cheap — the CD walk), then the shared
    * member recursion. */
  private def routeZipMembers(blob: Array[Byte], maxOut: Int, depth: Int,
      budget: Budget): Either[Rejected, Routed] =
    ZipArchive.parse(blob) match {
      case Left(r) => Left(Rejected(r.reason)) // unreachable after OfficeRouter
      case Right(members) =>
        routeMembers("zip", members.map(m => m.name -> Some(m.body)),
          maxOut, depth, budget)
    }

  /** Shared per-member recursion for every member-bearing container
    * (zip / tar / 7z / rar): each extracted member body re-enters the
    * full dispatch one level deeper (office-first again: a DOCX
    * member stays a DOCX), so data members — parquet, Avro, SQLite,
    * tar.gz, nested archives — land in their real parsers. A member
    * that is no known container censuses as strict-UTF-8 `text`; a
    * non-UTF-8 non-container carries `member_not_utf8`; a member the
    * parser censused but could not extract (compressed RAR) carries
    * `member_not_extracted`; past the shared depth budget,
    * `wrapper_depth_exceeded`. The container itself always routes —
    * fates are per member, in member order:
    * `<name>=<format>` / `<name>!<reason>`. */
  private def routeMembers(format: String,
      members: Seq[(String, Option[Array[Byte]])], maxOut: Int, depth: Int,
      budget: Budget): Either[Rejected, Routed] = {
    val fates = Seq.newBuilder[String]
    val texts = Seq.newBuilder[String]
    members.foreach { case (name, bodyOpt) =>
      bodyOpt match {
        case None => fates += s"$name!member_not_extracted"
        case Some(body) =>
          if (!budget.charge(body.length.toLong))
            return Left(Rejected("ingest_bomb"))
          if (depth + 1 > MaxDepth)
            fates += s"$name!wrapper_depth_exceeded"
          else routeDepth(body, maxOut, depth + 1, budget) match {
            case Right(r) =>
              fates += s"$name=${r.format}"
              if (r.text.nonEmpty) texts += r.text
            case Left(Rejected("not_a_container")) =>
              // at depth > 0 the text fallback already ran, so this can
              // only be a NON-UTF-8 blob that is no known container
              fates += s"$name!member_not_utf8"
            case Left(r) => fates += s"$name!${r.reason}"
          }
      }
    }
    Right(Routed(format, texts.result().mkString("\n"),
      members.length.toLong, fates.result()))
  }
}
