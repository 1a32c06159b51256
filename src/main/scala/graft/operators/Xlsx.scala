package graft.operators

/** XLSX census + text extraction — the spreadsheet sibling of [[Docx]]
  * (same OPC container, SpreadsheetML instead of WordprocessingML):
  * crawled corpora and data dumps carry `.xlsx` everywhere a table was
  * exported. Rides [[ZipArchive]] + [[XmlWalk]] like DOCX.
  *
  * Parts walked (ECMA-376): `xl/workbook.xml` (sheet census),
  * `xl/sharedStrings.xml` (the string table — `<si>` entries whose
  * `<t>` runs reassemble exactly like DOCX split runs, including the
  * rich-text `<r><t>` form), and each `xl/worksheets/sheetN.xml`
  * (rows, cells with their `r` address, `t` type — `s` shared string,
  * `str`/`inlineStr` literal, default numeric — and `<v>` values).
  *
  * Census: sheet/row/cell counts, numeric cell count and EXACT sum
  * (values parse as longs in this engine's fixtures; a non-integer
  * numeric cell is counted but contributes its truncated long — the
  * census is a triage, not a calculator), shared-string count and the
  * md5 of the newline-joined string table (the text a curation
  * pipeline wants out of a spreadsheet).
  *
  * Reject-don't-guess with named fates: bad zip, missing workbook,
  * malformed XML (prefixed `xml_`), a shared-string index out of
  * range, or a non-UTF-8 part all quarantine. Per-row byte work, no
  * shuffle.
  */
object Xlsx {

  final case class Extracted(
      nSheets: Long,
      nRows: Long,
      nCells: Long,
      nNumeric: Long,
      nShared: Long,
      numericSum: Long,
      sharedText: String)

  final case class Rejected(reason: String)

  /** Collects `<si>` string items; within one si, every `<t>` run
    * concatenates (split rich-text runs reassemble). */
  private final class SharedStringsHandler extends XmlWalk.Handler {
    val strings = Seq.newBuilder[String]
    private var cur: java.lang.StringBuilder = null
    private var inT = 0
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = name match {
      case "si" => cur = new java.lang.StringBuilder
      case "t" => if (cur != null) inT += 1
      case _ => ()
    }
    override def endElement(name: String, depth: Int): Unit = name match {
      case "si" => if (cur != null) { strings += cur.toString; cur = null }
      case "t" => if (inT > 0) inT -= 1
      case _ => ()
    }
    override def text(decoded: String, cdata: Boolean): Unit =
      if (inT > 0 && cur != null) cur.append(decoded)
  }

  private final class SheetHandler(shared: IndexedSeq[String])
      extends XmlWalk.Handler {
    var nRows = 0L
    var nCells = 0L
    var nNumeric = 0L
    var numericSum = 0L
    var bad: String = null
    private var cellType = ""
    private var inV = 0
    private var v: java.lang.StringBuilder = null
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = name match {
      case "row" => nRows += 1
      case "c" =>
        nCells += 1
        cellType = attrs.collectFirst { case ("t", t) => t }.getOrElse("n")
      case "v" => inV += 1; v = new java.lang.StringBuilder
      case _ => ()
    }
    override def text(decoded: String, cdata: Boolean): Unit =
      if (inV > 0) v.append(decoded)
    override def endElement(name: String, depth: Int): Unit = name match {
      case "v" =>
        inV -= 1
        val raw = v.toString.trim
        cellType match {
          case "s" =>
            // shared-string reference: must be a valid table index
            try {
              val idx = raw.toInt
              if (idx < 0 || idx >= shared.length)
                bad = "shared_string_out_of_range"
            } catch { case _: NumberFormatException =>
              bad = "bad_shared_string_ref"
            }
          case "n" =>
            nNumeric += 1
            try numericSum += java.lang.Double.parseDouble(raw).toLong
            catch { case _: NumberFormatException => bad = "bad_numeric_cell" }
          case _ => () // str / inlineStr / b: counted, not summed
        }
      case _ => ()
    }
  }

  /** Extract census + string table from an .xlsx blob. */
  def extract(blob: Array[Byte]): Either[Rejected, Extracted] =
    ZipArchive.parse(blob) match {
      case Left(r) => Left(Rejected(r.reason))
      case Right(members) =>
        val byName = members.map(m => m.name -> m).toMap
        if (!byName.contains("xl/workbook.xml"))
          return Left(Rejected("missing_workbook"))
        def xmlOf(name: String): Either[Rejected, String] =
          CharsetSniff.decodeStrict(byName(name).body, 0, "UTF-8")
            .toRight(Rejected("part_not_utf8"))
        // workbook: count <sheet> elements
        var nSheets = 0L
        val wbHandler = new XmlWalk.Handler {
          override def startElement(name: String,
              attrs: Seq[(String, String)], depth: Int): Unit =
            if (name == "sheet") nSheets += 1
        }
        xmlOf("xl/workbook.xml") match {
          case Left(r) => return Left(r)
          case Right(xml) => XmlWalk.walk(xml, wbHandler) match {
            case Left(reason) => return Left(Rejected(s"xml_$reason"))
            case Right(()) => ()
          }
        }
        // shared strings (optional part)
        val shared: IndexedSeq[String] =
          if (!byName.contains("xl/sharedStrings.xml")) IndexedSeq.empty
          else xmlOf("xl/sharedStrings.xml") match {
            case Left(r) => return Left(r)
            case Right(xml) =>
              val h = new SharedStringsHandler
              XmlWalk.walk(xml, h) match {
                case Left(reason) => return Left(Rejected(s"xml_$reason"))
                case Right(()) => h.strings.result().toIndexedSeq
              }
          }
        // every worksheet part, in name order (deterministic)
        val sheets = members.filter(m =>
          m.name.startsWith("xl/worksheets/") && m.name.endsWith(".xml"))
          .sortBy(_.name)
        if (sheets.isEmpty) return Left(Rejected("missing_worksheets"))
        var nRows = 0L; var nCells = 0L; var nNumeric = 0L
        var numericSum = 0L
        sheets.foreach { m =>
          CharsetSniff.decodeStrict(m.body, 0, "UTF-8") match {
            case None => return Left(Rejected("part_not_utf8"))
            case Some(xml) =>
              val h = new SheetHandler(shared)
              XmlWalk.walk(xml, h) match {
                case Left(reason) => return Left(Rejected(s"xml_$reason"))
                case Right(()) =>
                  if (h.bad != null) return Left(Rejected(h.bad))
                  nRows += h.nRows; nCells += h.nCells
                  nNumeric += h.nNumeric; numericSum += h.numericSum
              }
          }
        }
        Right(Extracted(nSheets, nRows, nCells, nNumeric, shared.length,
          numericSum, shared.mkString("\n")))
    }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Fixture writer: one sheet, a shared-string header row (the first
    * header cell carries arbitrary corpus text as SPLIT rich-text
    * runs), numeric body rows. Valid OPC through the real ZIP
    * writer. */
  def write(headerStrings: Seq[String], body: Seq[Seq[Long]]): Array[Byte] = {
    def colName(j: Int): String = {
      // A, B, .., Z, AA, ..
      var n = j
      val sb = new StringBuilder
      while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
      sb.toString
    }
    val sst = headerStrings.zipWithIndex.map { case (s, i) =>
      if (i == 0) {
        // split rich-text runs at word boundaries, the DOCX quirk
        val runs = s.split("(?<= )").filter(_.nonEmpty).map(seg =>
          s"""<r><t xml:space="preserve">${esc(seg)}</t></r>""").mkString
        s"<si>$runs</si>"
      } else s"""<si><t xml:space="preserve">${esc(s)}</t></si>"""
    }.mkString
    val sharedXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${headerStrings.length}" uniqueCount="${headerStrings.length}">$sst</sst>"""
    val headerRow = headerStrings.indices.map(j =>
      s"""<c r="${colName(j)}1" t="s"><v>$j</v></c>""").mkString
    val bodyRows = body.zipWithIndex.map { case (row, i) =>
      val cells = row.zipWithIndex.map { case (value, j) =>
        s"""<c r="${colName(j)}${i + 2}"><v>$value</v></c>"""
      }.mkString
      s"""<row r="${i + 2}">$cells</row>"""
    }.mkString
    val sheetXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        s"""<sheetData><row r="1">$headerRow</row>$bodyRows</sheetData></worksheet>"""
    val workbookXml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>""" +
        "</Relationships>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>""" +
        "</Types>"
    ZipArchive.write(Seq(
      ZipArchive.ZipMember("[Content_Types].xml", contentTypes.getBytes("UTF-8")),
      ZipArchive.ZipMember("_rels/.rels", rels.getBytes("UTF-8")),
      ZipArchive.ZipMember("xl/workbook.xml", workbookXml.getBytes("UTF-8")),
      ZipArchive.ZipMember("xl/_rels/workbook.xml.rels", wbRels.getBytes("UTF-8")),
      ZipArchive.ZipMember("xl/sharedStrings.xml", sharedXml.getBytes("UTF-8")),
      ZipArchive.ZipMember("xl/worksheets/sheet1.xml", sheetXml.getBytes("UTF-8"))),
      deflated = _ => true)
  }
}
