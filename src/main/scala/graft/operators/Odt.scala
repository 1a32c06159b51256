package graft.operators

/** ODT text extraction — the OpenDocument sibling of [[Docx]]
  * (LibreOffice/OpenOffice exports are a real fraction of crawled
  * office documents): an OCF-like zip whose body text lives in
  * `content.xml` under `office:body`/`office:text`.
  *
  * Extraction rules (OpenDocument v1.2 text content):
  *   - `text:p` and `text:h` elements are paragraphs, joined '\n';
  *   - `text:span` (formatting) is transparent — split runs
  *     reassemble; `text:tab` is '\t', `text:line-break` is '\n';
  *   - `text:s` is a run of spaces (`text:c` count attr, default 1) —
  *     the whitespace-compression quirk naive extractors drop;
  *   - `text:note` content (footnotes) is NOT body text — the
  *     ODT-specific naive-extractor leak;
  *   - the `mimetype` member, when present, must declare
  *     `application/vnd.oasis.opendocument.text`.
  *
  * Named fates: bad zip, wrong mimetype, missing content.xml,
  * malformed XML (`xml_`-prefixed), non-UTF-8. Per-row byte work, no
  * shuffle.
  */
object Odt {

  final case class Extracted(text: String, nParagraphs: Long, nNotes: Long)

  final case class Rejected(reason: String)

  private final class OdtBomb(val n: Int) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class OdtHandler extends XmlWalk.Handler {
    private val paragraphs = Seq.newBuilder[String]
    private var para: java.lang.StringBuilder = null
    private var noteDepth = 0
    var nParagraphs = 0L
    var nNotes = 0L
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = name match {
      case "text:p" | "text:h" =>
        if (noteDepth == 0) {
          if (para != null) flush()
          para = new java.lang.StringBuilder
        }
      case "text:note" => noteDepth += 1; nNotes += 1
      case "text:tab" => if (noteDepth == 0 && para != null) para.append('\t')
      case "text:line-break" =>
        if (noteDepth == 0 && para != null) para.append('\n')
      case "text:s" =>
        if (noteDepth == 0 && para != null) {
          val n = attrs.collectFirst { case ("text:c", v) => v }
            .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(1)
          // text:c is attacker-controlled amplification: a few input
          // bytes can declare billions of spaces. Every other expansion
          // path here (bzip2/xz/lz4/zstd) threads a bomb cap; this one
          // caps too — no legitimate document runs a 1M-space gap.
          if (n < 0 || n > 1000000) throw new OdtBomb(n)
          var k = 0
          while (k < n) { para.append(' '); k += 1 }
        }
      case _ => () // text:span etc: transparent
    }
    override def endElement(name: String, depth: Int): Unit = name match {
      case "text:p" | "text:h" => if (noteDepth == 0 && para != null) flush()
      case "text:note" => noteDepth -= 1
      case _ => ()
    }
    override def text(decoded: String, cdata: Boolean): Unit =
      if (noteDepth == 0 && para != null) para.append(decoded)
    private def flush(): Unit = {
      paragraphs += para.toString
      para = null
      nParagraphs += 1
    }
    def result: String = paragraphs.result().mkString("\n")
  }

  def extract(blob: Array[Byte]): Either[Rejected, Extracted] =
    ZipArchive.parse(blob) match {
      case Left(r) => Left(Rejected(r.reason))
      case Right(members) =>
        val byName = members.map(m => m.name -> m).toMap
        byName.get("mimetype").foreach { m =>
          if (new String(m.body, "US-ASCII") !=
            "application/vnd.oasis.opendocument.text")
            return Left(Rejected("bad_mimetype"))
        }
        byName.get("content.xml") match {
          case None => Left(Rejected("missing_content_xml"))
          case Some(m) =>
            CharsetSniff.decodeStrict(m.body, 0, "UTF-8") match {
              case None => Left(Rejected("content_not_utf8"))
              case Some(xml) =>
                val h = new OdtHandler
                try XmlWalk.walk(xml, h) match {
                  case Left(reason) => Left(Rejected(s"xml_$reason"))
                  case Right(()) =>
                    Right(Extracted(h.result, h.nParagraphs, h.nNotes))
                } catch {
                  case _: OdtBomb => Left(Rejected("space_run_bomb"))
                }
            }
        }
    }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fixture writer: paragraphs split into `text:span` runs at word
    * boundaries; double spaces become `text:s text:c="2"`; a footnote
    * carries decoy text the extractor must drop. */
  def write(paragraphs: Seq[String], withNote: Boolean = true): Array[Byte] = {
    val body = paragraphs.zipWithIndex.map { case (p, i) =>
      val runs = p.split("(?<= )").filter(_.nonEmpty).map { seg =>
        if (seg.forall(_ == ' ')) // space run -> the text:s form
          s"""<text:s text:c="${seg.length}"/>"""
        else if (seg == "\t") "<text:tab/>"
        else s"""<text:span>${esc(seg)}</text:span>"""
      }.mkString
      val note =
        if (withNote && i == 0)
          """<text:note text:note-class="footnote"><text:note-body>""" +
            """<text:p>FOOTNOTE DECOY</text:p></text:note-body></text:note>"""
        else ""
      s"<text:p>$runs$note</text:p>"
    }.mkString
    val content =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">""" +
        s"""<office:body><office:text>$body</office:text></office:body>""" +
        "</office:document-content>"
    ZipArchive.write(Seq(
      ZipArchive.ZipMember("mimetype",
        "application/vnd.oasis.opendocument.text".getBytes("US-ASCII")),
      ZipArchive.ZipMember("content.xml", content.getBytes("UTF-8"))),
      deflated = _ != 0)
  }
}
