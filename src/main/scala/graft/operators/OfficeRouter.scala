package graft.operators

/** Office/e-book format ROUTER — the dispatch a real ingest runs on a
  * mixed blob column: detect the concrete format from the container's
  * own declarations (never the file extension, which crawls lie
  * about), then route to the right extractor:
  *
  *   - zip + `mimetype` = `application/epub+zip`            → [[Epub]]
  *   - zip + `mimetype` = `application/vnd.oasis...text`    → [[Odt]]
  *   - zip + `[Content_Types].xml` declaring wordprocessingml /
  *     spreadsheetml / presentationml main parts → [[Docx]] /
  *     [[Xlsx]] / [[Pptx]]
  *   - a valid zip that is none of these → `unrouted_zip` (named —
  *     route those shards onward, don't guess);
  *   - CFB magic (`D0 CF 11 E0`) → the legacy binary Office family:
  *     a `WordDocument` stream routes to [[Doc]] (text via the piece
  *     table), `Workbook`/`Book` to [[Xls]] (BIFF8 shared-string text
  *     + cells; BIFF5 `Book` rejects with its version name),
  *     `PowerPoint Document` to [[Ppt]] (record-tree text atoms);
  *     any other compound file is `ole2_unknown`; a malformed one
  *     is `cfb_<reason>`.
  *     Before round 14 these all fell through as `not_a_container`,
  *     which made the fate census blind to how much legacy Office a
  *     shard carries;
  *   - a MALFORMED zip (truncated, encrypted, bad descriptor, zip64
  *     violation, ...) → its `zip_*` reason straight from
  *     [[ZipArchive]] — the fate census counts failure classes, it
  *     doesn't flatten them;
  *   - not a zip and not CFB → `not_a_container`.
  *
  * One pass over the member list for detection; extraction reuses the
  * format operators verbatim, so the router adds no parsing of its
  * own to maintain. Per-row, no shuffle.
  */
object OfficeRouter {

  /** format ∈ docx/xlsx/pptx/epub/odt; text = the extractor's body
    * text; units = the format's natural count (paragraphs / cells /
    * slides / spine items / paragraphs). */
  final case class Routed(format: String, text: String, units: Long)

  final case class Rejected(reason: String)

  def route(blob: Array[Byte]): Either[Rejected, Routed] =
    if (Cfb.looksLikeCfb(blob)) routeCfb(blob)
    else ZipArchive.parse(blob) match {
      case Left(r) => Left(Rejected(r.reason)) // zip_* named fates
      case Right(members) =>
        val byName = members.map(m => m.name -> m).toMap
        val mime = byName.get("mimetype")
          .map(m => new String(m.body, "US-ASCII"))
        val contentTypes = byName.get("[Content_Types].xml")
          .flatMap(m => CharsetSniff.decodeStrict(m.body, 0, "UTF-8"))
        mime match {
          case Some("application/epub+zip") =>
            Epub.extract(blob) match {
              case Right(e) => Right(Routed("epub", e.text, e.nSpine))
              case Left(r) => Left(Rejected(r.reason))
            }
          case Some("application/vnd.oasis.opendocument.text") =>
            Odt.extract(blob) match {
              case Right(e) => Right(Routed("odt", e.text, e.nParagraphs))
              case Left(r) => Left(Rejected(r.reason))
            }
          case _ =>
            contentTypes match {
              case Some(ct) if ct.contains("wordprocessingml.document.main") =>
                Docx.extract(blob) match {
                  case Right(e) => Right(Routed("docx", e.text, e.nParagraphs))
                  case Left(r) => Left(Rejected(r.reason))
                }
              case Some(ct) if ct.contains("spreadsheetml.sheet.main") =>
                Xlsx.extract(blob) match {
                  case Right(e) =>
                    Right(Routed("xlsx", e.sharedText, e.nCells))
                  case Left(r) => Left(Rejected(r.reason))
                }
              case Some(ct) if ct.contains("presentationml.presentation.main") =>
                Pptx.extract(blob) match {
                  case Right(e) => Right(Routed("pptx", e.text, e.nSlides))
                  case Left(r) => Left(Rejected(r.reason))
                }
              case _ => Left(Rejected("unrouted_zip"))
            }
        }
    }

  /** Legacy compound-file dispatch: the format is declared by the
    * directory entry NAMES ([MS-DOC]/[MS-XLS]/[MS-PPT] all pin
    * theirs), never the extension. */
  private def routeCfb(blob: Array[Byte]): Either[Rejected, Routed] =
    Cfb.parse(blob) match {
      case Left(reason) => Left(Rejected(s"cfb_$reason"))
      case Right(parsed) =>
        val names = parsed.streams.keySet
        if (names.contains("WordDocument"))
          Doc.extractFromCfb(parsed) match {
            case Right(e) => Right(Routed("doc", e.text, e.nParagraphs))
            case Left(r) => Left(Rejected(r.reason))
          }
        else if (names.contains("Workbook") || names.contains("Book"))
          Xls.extractFromCfb(parsed) match {
            case Right(e) => Right(Routed("xls", e.sstText, e.nLabelCells))
            case Left(r) => Left(Rejected(r.reason))
          }
        else if (names.contains("PowerPoint Document"))
          Ppt.extractFromCfb(parsed) match {
            case Right(e) => Right(Routed("ppt", e.text, e.nSlides))
            case Left(r) => Left(Rejected(r.reason))
          }
        else Left(Rejected("ole2_unknown"))
    }
}
