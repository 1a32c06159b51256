package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class XlsxEpubSpec extends AnyFunSuite {

  test("xlsx write/extract round-trips census and string table") {
    val headers = Seq("report of widget counts", "col 1", "col 2")
    val body = Seq(Seq(10L, 20L, 30L), Seq(1L, 2L, 3L))
    val ex = Xlsx.extract(Xlsx.write(headers, body)).toOption.get
    assert(ex.nSheets == 1)
    assert(ex.nRows == 3) // header + 2 body rows
    assert(ex.nCells == 9)
    assert(ex.nNumeric == 6)
    assert(ex.numericSum == 66)
    assert(ex.nShared == 3)
    // the first header string was written as SPLIT rich-text runs and
    // must reassemble exactly
    assert(ex.sharedText == headers.mkString("\n"))
  }

  test("xlsx entities and empty body survive") {
    val ex = Xlsx.extract(Xlsx.write(Seq("a & b < c"), Seq.empty)).toOption.get
    assert(ex.sharedText == "a & b < c" && ex.nRows == 1 && ex.nNumeric == 0)
  }

  test("xlsx named rejections: zip, workbook, shared index, xml") {
    assert(Xlsx.extract("nope".getBytes) == Left(Xlsx.Rejected("not_a_container")))
    val noWb = ZipArchive.write(Seq(
      ZipArchive.ZipMember("xl/other.xml", "<a/>".getBytes)), _ => false)
    assert(Xlsx.extract(noWb) == Left(Xlsx.Rejected("missing_workbook")))
    // out-of-range shared-string reference
    val blob = Xlsx.write(Seq("h"), Seq(Seq(1L)))
    val members = ZipArchive.parse(blob).toOption.get.map { m =>
      if (m.name == "xl/worksheets/sheet1.xml")
        m.copy(body = new String(m.body, "UTF-8")
          .replace("""t="s"><v>0</v>""", """t="s"><v>9</v>""")
          .getBytes("UTF-8"))
      else m
    }
    assert(Xlsx.extract(ZipArchive.write(members, _ => false)) ==
      Left(Xlsx.Rejected("shared_string_out_of_range")))
    // malformed worksheet xml
    val badXml = ZipArchive.parse(blob).toOption.get.map { m =>
      if (m.name == "xl/worksheets/sheet1.xml")
        m.copy(body = "<worksheet><sheetData>".getBytes("UTF-8"))
      else m
    }
    assert(Xlsx.extract(ZipArchive.write(badXml, _ => false)) ==
      Left(Xlsx.Rejected("xml_truncated_xml")))
  }

  test("epub write/extract: spine order wins over member order") {
    val chapters = Seq(
      Seq("first chapter opening", "first chapter close"),
      Seq("second chapter only paragraph"),
      Seq("third chapter a", "third chapter b"))
    val blob = Epub.write("A Book & Title", "en", chapters)
    val ex = Epub.extract(blob).toOption.get
    assert(ex.title == "A Book & Title")
    assert(ex.language == "en")
    assert(ex.nManifest == 3 && ex.nSpine == 3)
    // the fixture spine lists chapters in REVERSE file order: reading
    // order must follow the spine
    val expected = chapters.reverse.map(_.mkString("\n")).mkString("\n")
    assert(ex.text == expected)
  }

  test("epub head content never leaks into body text") {
    val ex = Epub.extract(Epub.write("t", "de", Seq(Seq("body only"))))
      .toOption.get
    assert(!ex.text.contains("chapter")) // <head><title>chapter 0</title>
    assert(ex.text == "body only")
  }

  test("epub named rejections: mimetype, container, spine, chapter") {
    assert(Epub.extract("zzz".getBytes) == Left(Epub.Rejected("not_a_container")))
    val good = Epub.write("t", "en", Seq(Seq("p")))
    val members = ZipArchive.parse(good).toOption.get
    // wrong mimetype content
    val badMime = members.map(m =>
      if (m.name == "mimetype") m.copy(body = "text/plain".getBytes) else m)
    assert(Epub.extract(ZipArchive.write(badMime, _ => false)) ==
      Left(Epub.Rejected("bad_mimetype")))
    // drop the container
    val noContainer = members.filterNot(_.name == "META-INF/container.xml")
    assert(Epub.extract(ZipArchive.write(noContainer, _ => false)) ==
      Left(Epub.Rejected("missing_container")))
    // spine pointing at a manifest id that does not exist
    val badSpine = members.map(m =>
      if (m.name == "OEBPS/content.opf")
        m.copy(body = new String(m.body, "UTF-8")
          .replace("""idref="ch0"""", """idref="ghost"""").getBytes("UTF-8"))
      else m)
    assert(Epub.extract(ZipArchive.write(badSpine, _ => false)) ==
      Left(Epub.Rejected("spine_idref_unresolved")))
    // chapter member missing from the zip
    val noChap = members.filterNot(_.name == "OEBPS/chap0.xhtml")
    assert(Epub.extract(ZipArchive.write(noChap, _ => false)) ==
      Left(Epub.Rejected("missing_chapter")))
  }
}
