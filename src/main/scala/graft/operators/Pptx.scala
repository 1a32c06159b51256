package graft.operators

/** PPTX text extraction — the third office format (same OPC
  * container as [[Docx]]/[[Xlsx]], DrawingML text bodies): slide
  * decks are a real fraction of crawled document corpora, and their
  * extractable text lives in `<a:t>` runs inside `<a:p>` paragraphs
  * inside shape text bodies on `ppt/slides/slideN.xml` parts.
  *
  * Extraction rules (the [[Docx]] contract transposed):
  *   - slides are read in NUMERIC order of their part names (slide2
  *     before slide10 — lexicographic order is the naive bug here);
  *   - within a slide, each `<a:p>` is one paragraph; `<a:t>` runs
  *     concatenate across formatting splits; `<a:br/>` is a newline;
  *   - paragraphs join with '\n', slides with '\n' as well;
  *   - speaker notes (`ppt/notesSlides/...`) are counted but NOT body
  *     text — extracting presenter notes as slide content is the
  *     naive-extractor bug on this format.
  *
  * Named fates: bad zip, no slides, malformed XML (`xml_`-prefixed),
  * non-UTF-8 parts. Per-row byte work, no shuffle.
  */
object Pptx {

  final case class Extracted(
      nSlides: Long,
      nNotesSlides: Long,
      text: String)

  final case class Rejected(reason: String)

  private final class SlideHandler extends XmlWalk.Handler {
    private val sb = new java.lang.StringBuilder
    private var para: java.lang.StringBuilder = null
    private var inT = 0
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = name match {
      case "a:p" =>
        if (para != null) flush()
        para = new java.lang.StringBuilder
      case "a:t" => if (para != null) inT += 1
      case "a:br" => if (para != null) para.append('\n')
      case _ => ()
    }
    override def endElement(name: String, depth: Int): Unit = name match {
      case "a:p" => if (para != null) flush()
      case "a:t" => if (inT > 0) inT -= 1
      case _ => ()
    }
    override def text(decoded: String, cdata: Boolean): Unit =
      if (inT > 0 && para != null) para.append(decoded)
    private def flush(): Unit = {
      if (sb.length > 0) sb.append('\n')
      sb.append(para)
      para = null
    }
    def result: String = sb.toString
  }

  private val SlideName = "ppt/slides/slide([0-9]+)\\.xml".r

  def extract(blob: Array[Byte]): Either[Rejected, Extracted] =
    ZipArchive.parse(blob) match {
      case Left(r) => Left(Rejected(r.reason))
      case Right(members) =>
        val slides = members.flatMap(m => m.name match {
          case SlideName(n) => Some((n.toInt, m))
          case _ => None
        }).sortBy(_._1) // NUMERIC slide order
        if (slides.isEmpty) return Left(Rejected("missing_slides"))
        val nNotes = members.count(_.name.startsWith("ppt/notesSlides/"))
        val texts = Seq.newBuilder[String]
        slides.foreach { case (_, m) =>
          CharsetSniff.decodeStrict(m.body, 0, "UTF-8") match {
            case None => return Left(Rejected("part_not_utf8"))
            case Some(xml) =>
              val h = new SlideHandler
              XmlWalk.walk(xml, h) match {
                case Left(reason) => return Left(Rejected(s"xml_$reason"))
                case Right(()) => texts += h.result
              }
          }
        }
        Right(Extracted(slides.length, nNotes, texts.result().mkString("\n")))
    }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fixture writer: `slides(k)` = that slide's paragraphs, each
    * split into multiple `<a:t>` runs at word boundaries; 12+ slides
    * exercise the numeric-vs-lexicographic ordering trap. A notes
    * slide carries decoy text the extractor must not leak. */
  def write(slides: Seq[Seq[String]], withNotes: Boolean = true): Array[Byte] = {
    def slideXml(paras: Seq[String]): String = {
      val body = paras.map { p =>
        val runs = p.split("(?<= )").filter(_.nonEmpty).map(seg =>
          s"""<a:r><a:t>${esc(seg)}</a:t></a:r>""").mkString
        s"<a:p>$runs</a:p>"
      }.mkString
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""" +
        s"""<p:cSld><p:spTree><p:sp><p:txBody>$body</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"""
    }
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>""" +
        "</Types>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>""" +
        "</Relationships>"
    val presentation =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>"""
    val notes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<p:notes xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main">""" +
        """<p:cSld><p:spTree><p:sp><p:txBody><a:p><a:r><a:t>PRESENTER NOTES DECOY</a:t></a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld></p:notes>"""
    val slideMembers = slides.zipWithIndex.map { case (paras, k) =>
      ZipArchive.ZipMember(s"ppt/slides/slide${k + 1}.xml",
        slideXml(paras).getBytes("UTF-8"))
    }
    val noteMembers =
      if (withNotes)
        Seq(ZipArchive.ZipMember("ppt/notesSlides/notesSlide1.xml",
          notes.getBytes("UTF-8")))
      else Seq.empty
    ZipArchive.write(
      Seq(ZipArchive.ZipMember("[Content_Types].xml",
        contentTypes.getBytes("UTF-8")),
        ZipArchive.ZipMember("_rels/.rels", rels.getBytes("UTF-8")),
        ZipArchive.ZipMember("ppt/presentation.xml",
          presentation.getBytes("UTF-8"))) ++ slideMembers ++ noteMembers,
      deflated = _ => true)
  }
}
