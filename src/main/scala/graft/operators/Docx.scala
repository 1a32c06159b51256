package graft.operators

/** DOCX text extraction — the office-document format crawled corpora
  * actually carry. A .docx is OPC: a ZIP (ECMA-376 Part 2) whose
  * `word/document.xml` member holds WordprocessingML — paragraphs
  * (`<w:p>`) of runs (`<w:r>`) whose text lives in `<w:t>` elements,
  * with explicit `<w:tab/>` and `<w:br/>` marks. Both halves already
  * exist in this repo — [[ZipArchive]] walks the container and
  * [[XmlWalk]] walks the tree — this operator is the composition.
  *
  * Extraction model (the text a curation pipeline wants):
  *   - each `<w:p>` becomes one paragraph; paragraphs join with '\n';
  *   - within a paragraph, every `<w:t>` run's character data
  *     concatenates in document order — runs SPLIT by formatting
  *     boundaries (the classic Word quirk: one visual word split
  *     across three runs) reassemble with no separator;
  *   - `<w:tab/>` appends '\t', `<w:br/>` and `<w:cr/>` append '\n';
  *   - text outside `<w:t>` (style names, instrText field codes,
  *     deleted-revision `<w:delText>`) is NOT body text and is
  *     dropped — extracting field instructions as prose is the
  *     classic naive-extractor bug;
  *   - tables fall out naturally: their cells contain `<w:p>`.
  *
  * Reject-don't-guess, each with a named fate: a blob that isn't a
  * valid ZIP (the `zip_*` fate straight from [[ZipArchive]]),
  * has no `word/document.xml`
  * (`missing_document_xml`), whose document part isn't strict UTF-8
  * (`document_not_utf8`), or whose XML is malformed (the walk's named
  * reason, prefixed `xml_`) quarantines instead of yielding partial
  * text. Per-row byte work — no shuffle; linear over a 100 TB corpus.
  */
object Docx {

  /** Extracted body text. `nParagraphs` counts `<w:p>` elements,
    * `nRuns` counts `<w:t>` elements (split runs count individually —
    * the census side of the run-reassembly contract). */
  final case class Extracted(text: String, nParagraphs: Long, nRuns: Long)

  final case class Rejected(reason: String)

  private final class WmlHandler extends XmlWalk.Handler {
    private val paragraphs = Seq.newBuilder[String]
    private var para: java.lang.StringBuilder = null
    private var inT = 0
    var nParagraphs = 0L
    var nRuns = 0L
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = name match {
      case "w:p" =>
        // OOXML forbids nested w:p; tolerate by flushing the outer
        // (reject-don't-guess applies to GRAMMAR, and nesting here is
        // valid XML — the flush keeps every char attributed somewhere)
        if (para != null) flushPara()
        para = new java.lang.StringBuilder
      case "w:t" => if (para != null) { inT += 1; nRuns += 1 }
      case "w:tab" => if (para != null) para.append('\t')
      case "w:br" | "w:cr" => if (para != null) para.append('\n')
      case _ => ()
    }
    override def endElement(name: String, depth: Int): Unit = name match {
      case "w:p" => if (para != null) flushPara()
      case "w:t" => if (inT > 0) inT -= 1
      case _ => ()
    }
    override def text(decoded: String, cdata: Boolean): Unit =
      if (inT > 0 && para != null) para.append(decoded)
    private def flushPara(): Unit = {
      paragraphs += para.toString
      para = null
      nParagraphs += 1
    }
    def result: String = paragraphs.result().mkString("\n")
  }

  /** Extract body text from a .docx blob. */
  def extract(blob: Array[Byte]): Either[Rejected, Extracted] =
    ZipArchive.parse(blob) match {
      case Left(r) => Left(Rejected(r.reason))
      case Right(members) =>
        members.find(_.name == "word/document.xml") match {
          case None => Left(Rejected("missing_document_xml"))
          case Some(m) =>
            CharsetSniff.decodeStrict(m.body, 0, "UTF-8") match {
              case None => Left(Rejected("document_not_utf8"))
              case Some(xml) =>
                val h = new WmlHandler
                XmlWalk.walk(xml, h) match {
                  case Left(reason) => Left(Rejected(s"xml_$reason"))
                  case Right(()) =>
                    Right(Extracted(h.result, h.nParagraphs, h.nRuns))
                }
            }
        }
    }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fixture writer: a minimal valid OPC package ([Content_Types].xml,
    * package rels, word/document.xml) through the real ZIP writer.
    * Paragraph text splits into MULTIPLE runs at word boundaries (the
    * split-run reassembly path is always exercised); '\t' becomes
    * `<w:tab/>`. A `w:instrText` field code plants non-body text the
    * extractor must DROP. */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map { p =>
      val runs = p.split("((?<= )|(?=\t))", -1).filter(_.nonEmpty).map { seg =>
        if (seg == "\t") "<w:r><w:tab/></w:r>"
        else s"""<w:r><w:t xml:space="preserve">${esc(seg)}</w:t></w:r>"""
      }.mkString
      s"<w:p><w:pPr><w:pStyle w:val=\"Normal\"/></w:pPr>$runs</w:p>"
    }.mkString
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        "<w:body>" +
        // a field-code run BEFORE the real content: its instrText must
        // not leak into extracted text
        """<w:p><w:r><w:instrText xml:space="preserve"> PAGE </w:instrText></w:r></w:p>""" +
        body +
        "</w:body></w:document>"
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>""" +
        "</Types>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>""" +
        "</Relationships>"
    ZipArchive.write(Seq(
      ZipArchive.ZipMember("[Content_Types].xml", contentTypes.getBytes("UTF-8")),
      ZipArchive.ZipMember("_rels/.rels", rels.getBytes("UTF-8")),
      ZipArchive.ZipMember("word/document.xml", doc.getBytes("UTF-8"))),
      deflated = _ => true)
  }
}
