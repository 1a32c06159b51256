package graft.operators

/** EPUB text extraction — the e-book format crawled corpora carry
  * beside office documents: an OCF zip whose reading order lives in
  * the OPF package document. Rides [[ZipArchive]] + [[XmlWalk]] (the
  * DOCX composition with one more indirection level).
  *
  * Walk (per the public OCF/OPF specifications):
  *   1. the `mimetype` member must hold exactly
  *      `application/epub+zip` (the OCF signature);
  *   2. `META-INF/container.xml` names the package document via the
  *      first `<rootfile full-path=...>`;
  *   3. the OPF package: `<dc:title>`/`<dc:language>` metadata, the
  *      `<manifest>` of `<item id= href= media-type=>` entries, and
  *      the `<spine>` of `<itemref idref=>` — READING ORDER IS THE
  *      SPINE, not zip member order (the naive-extractor bug this
  *      operator exists to not have);
  *   4. each spine chapter (resolved relative to the OPF directory)
  *      is XHTML; its body text concatenates in document order with
  *      '\n' between block paragraphs (`<p>`), chapters joined by
  *      '\n' in spine order. `<head>` content (title/style) is NOT
  *      body text and is dropped.
  *
  * Reject-don't-guess with named fates: bad zip, wrong/missing
  * mimetype, missing container/rootfile/OPF, a spine idref without a
  * manifest item, a chapter member missing from the zip, malformed
  * XML anywhere (prefixed `xml_`). Per-row byte work, no shuffle.
  */
object Epub {

  final case class Extracted(
      title: String,
      language: String,
      nManifest: Long,
      nSpine: Long,
      text: String)

  final case class Rejected(reason: String)

  /** Text collector for one XHTML chapter: body text only, '\n'
    * between `<p>` blocks. */
  private final class ChapterHandler extends XmlWalk.Handler {
    private val sb = new java.lang.StringBuilder
    private var inBody = 0
    private var inHead = 0
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = name match {
      case "body" => inBody += 1
      case "head" => inHead += 1
      case "p" | "div" | "h1" | "h2" | "h3" | "br" =>
        if (inBody > 0 && sb.length > 0 &&
          sb.charAt(sb.length - 1) != '\n') sb.append('\n')
      case _ => ()
    }
    override def endElement(name: String, depth: Int): Unit = name match {
      case "body" => inBody -= 1
      case "head" => inHead -= 1
      case _ => ()
    }
    override def text(decoded: String, cdata: Boolean): Unit =
      if (inBody > 0 && inHead == 0) sb.append(decoded)
    def result: String = sb.toString
  }

  /** Metadata/manifest/spine collector for the OPF package. */
  private final class OpfHandler extends XmlWalk.Handler {
    var title = ""
    var language = ""
    val manifest = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val spine = Seq.newBuilder[String]
    private var capture: StringBuilder = null
    private var captureInto = ""
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = name match {
      case "dc:title" | "dc:language" =>
        capture = new StringBuilder; captureInto = name
      case "item" =>
        val id = attrs.collectFirst { case ("id", v) => v }
        val href = attrs.collectFirst { case ("href", v) => v }
        for (i <- id; h <- href) manifest(i) = h
      case "itemref" =>
        attrs.collectFirst { case ("idref", v) => v }.foreach(spine += _)
      case _ => ()
    }
    override def endElement(name: String, depth: Int): Unit =
      if (capture != null && name == captureInto) {
        if (name == "dc:title") title = capture.toString.trim
        else language = capture.toString.trim
        capture = null
      }
    override def text(decoded: String, cdata: Boolean): Unit =
      if (capture != null) capture.append(decoded)
  }

  def extract(blob: Array[Byte]): Either[Rejected, Extracted] =
    ZipArchive.parse(blob) match {
      case Left(r) => Left(Rejected(r.reason))
      case Right(members) =>
        val byName = members.map(m => m.name -> m).toMap
        byName.get("mimetype") match {
          case None => return Left(Rejected("missing_mimetype"))
          case Some(m) =>
            if (new String(m.body, "US-ASCII") != "application/epub+zip")
              return Left(Rejected("bad_mimetype"))
        }
        def xmlOf(name: String, missing: String): Either[Rejected, String] =
          byName.get(name) match {
            case None => Left(Rejected(missing))
            case Some(m) => CharsetSniff.decodeStrict(m.body, 0, "UTF-8")
              .toRight(Rejected("part_not_utf8"))
          }
        // container.xml -> rootfile path
        var opfPath: String = null
        xmlOf("META-INF/container.xml", "missing_container") match {
          case Left(r) => return Left(r)
          case Right(xml) =>
            val h = new XmlWalk.Handler {
              override def startElement(name: String,
                  attrs: Seq[(String, String)], depth: Int): Unit =
                if (name == "rootfile" && opfPath == null)
                  attrs.collectFirst { case ("full-path", v) => v }
                    .foreach(opfPath = _)
            }
            XmlWalk.walk(xml, h) match {
              case Left(reason) => return Left(Rejected(s"xml_$reason"))
              case Right(()) => ()
            }
        }
        if (opfPath == null) return Left(Rejected("missing_rootfile"))
        val opf = new OpfHandler
        xmlOf(opfPath, "missing_opf") match {
          case Left(r) => return Left(r)
          case Right(xml) => XmlWalk.walk(xml, opf) match {
            case Left(reason) => return Left(Rejected(s"xml_$reason"))
            case Right(()) => ()
          }
        }
        val opfDir = {
          val cut = opfPath.lastIndexOf('/')
          if (cut < 0) "" else opfPath.substring(0, cut + 1)
        }
        val spine = opf.spine.result()
        if (spine.isEmpty) return Left(Rejected("empty_spine"))
        val chapters = Seq.newBuilder[String]
        spine.foreach { idref =>
          opf.manifest.get(idref) match {
            case None => return Left(Rejected("spine_idref_unresolved"))
            case Some(href) =>
              xmlOf(opfDir + href, "missing_chapter") match {
                case Left(r) => return Left(r)
                case Right(xml) =>
                  val h = new ChapterHandler
                  XmlWalk.walk(xml, h) match {
                    case Left(reason) => return Left(Rejected(s"xml_$reason"))
                    case Right(()) => chapters += h.result
                  }
              }
          }
        }
        Right(Extracted(opf.title, opf.language, opf.manifest.size,
          spine.size, chapters.result().mkString("\n")))
    }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fixture writer: a minimal valid OCF/OPF package with `nChapters`
    * XHTML chapters (each one `<p>` per paragraph), the spine
    * DELIBERATELY listing chapters in reverse file-name order so a
    * member-order reader misassembles the book. */
  def write(title: String, language: String,
      chapterParagraphs: Seq[Seq[String]]): Array[Byte] = {
    val n = chapterParagraphs.length
    val containerXml =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
        """<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles></container>"""
    // spine order: LAST file first — reading order is the spine
    val spineOrder = (0 until n).reverse
    val manifest = (0 until n).map(i =>
      s"""<item id="ch$i" href="chap$i.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString
    val spineXml = spineOrder.map(i => s"""<itemref idref="ch$i"/>""").mkString
    val opf =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">""" +
        """<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">""" +
        s"""<dc:identifier id="uid">urn:uuid:0</dc:identifier>""" +
        s"""<dc:title>${esc(title)}</dc:title>""" +
        s"""<dc:language>${esc(language)}</dc:language>""" +
        "</metadata>" +
        s"""<manifest>$manifest</manifest><spine>$spineXml</spine></package>"""
    val chapterMembers = chapterParagraphs.zipWithIndex.map { case (paras, i) =>
      val body = paras.map(p => s"<p>${esc(p)}</p>").mkString
      val xhtml =
        """<?xml version="1.0" encoding="UTF-8"?>""" +
          """<html xmlns="http://www.w3.org/1999/xhtml">""" +
          s"""<head><title>chapter $i</title></head><body>$body</body></html>"""
      ZipArchive.ZipMember(s"OEBPS/chap$i.xhtml", xhtml.getBytes("UTF-8"))
    }
    ZipArchive.write(
      ZipArchive.ZipMember("mimetype",
        "application/epub+zip".getBytes("US-ASCII")) +:
        ZipArchive.ZipMember("META-INF/container.xml",
          containerXml.getBytes("UTF-8")) +:
        ZipArchive.ZipMember("OEBPS/content.opf", opf.getBytes("UTF-8")) +:
        chapterMembers,
      // OCF: mimetype STORED (member 0), the rest deflated
      deflated = _ != 0)
  }
}
