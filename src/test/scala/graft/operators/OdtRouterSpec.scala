package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class OdtRouterSpec extends AnyFunSuite {

  test("odt write/extract round-trips spans, space runs, tabs") {
    val paras = Seq("hello split span world", "second paragraph here")
    val ex = Odt.extract(Odt.write(paras)).toOption.get
    assert(ex.text == paras.mkString("\n"))
    assert(ex.nParagraphs == 2 && ex.nNotes == 1)
    // double and triple spaces ride text:s and must reassemble
    val spaced = Seq("a  b", "c   d")
    assert(Odt.extract(Odt.write(spaced, withNote = false)).toOption.get
      .text == spaced.mkString("\n"))
  }

  test("odt footnote content never leaks into body text") {
    val ex = Odt.extract(Odt.write(Seq("body text only"))).toOption.get
    assert(!ex.text.contains("DECOY"))
    assert(ex.text == "body text only")
  }

  test("odt named rejections") {
    assert(Odt.extract("x".getBytes) == Left(Odt.Rejected("not_a_container")))
    val wrongMime = ZipArchive.write(Seq(
      ZipArchive.ZipMember("mimetype", "text/plain".getBytes),
      ZipArchive.ZipMember("content.xml", "<a/>".getBytes)), _ => false)
    assert(Odt.extract(wrongMime) == Left(Odt.Rejected("bad_mimetype")))
    val noContent = ZipArchive.write(Seq(
      ZipArchive.ZipMember("styles.xml", "<a/>".getBytes)), _ => false)
    assert(Odt.extract(noContent) ==
      Left(Odt.Rejected("missing_content_xml")))
    val badXml = ZipArchive.write(Seq(
      ZipArchive.ZipMember("content.xml",
        "<office:document-content>".getBytes)), _ => false)
    assert(Odt.extract(badXml) == Left(Odt.Rejected("xml_truncated_xml")))
    // text:s amplification: a few bytes declaring 2e9 spaces is a
    // decompression-bomb-class expansion and must reject, not allocate
    val bomb = ZipArchive.write(Seq(
      ZipArchive.ZipMember("content.xml",
        ("""<office:document-content><office:body><office:text>""" +
          """<text:p>a<text:s text:c="2000000000"/>b</text:p>""" +
          """</office:text></office:body></office:document-content>""")
          .getBytes)), _ => false)
    assert(Odt.extract(bomb) == Left(Odt.Rejected("space_run_bomb")))
  }

  test("router detects every format from container declarations") {
    val docx = Docx.write(Seq("docx body paragraph"))
    val xlsx = Xlsx.write(Seq("xlsx header"), Seq(Seq(1L, 2L)))
    val pptx = Pptx.write(Seq(Seq("pptx slide text")))
    val epub = Epub.write("T", "en", Seq(Seq("epub chapter text")))
    val odt = Odt.write(Seq("odt paragraph text"))
    assert(OfficeRouter.route(docx).toOption.get.format == "docx")
    assert(OfficeRouter.route(xlsx).toOption.get.format == "xlsx")
    assert(OfficeRouter.route(pptx).toOption.get.format == "pptx")
    assert(OfficeRouter.route(epub).toOption.get.format == "epub")
    assert(OfficeRouter.route(odt).toOption.get.format == "odt")
    // extraction rides the format operators verbatim
    assert(OfficeRouter.route(docx).toOption.get.text.endsWith(
      "docx body paragraph"))
    assert(OfficeRouter.route(epub).toOption.get.text == "epub chapter text")
  }

  test("router names the unroutable cases") {
    assert(OfficeRouter.route("junk".getBytes) ==
      Left(OfficeRouter.Rejected("not_a_container")))
    val plainZip = ZipArchive.write(Seq(
      ZipArchive.ZipMember("readme.txt", "hi".getBytes)), _ => false)
    assert(OfficeRouter.route(plainZip) ==
      Left(OfficeRouter.Rejected("unrouted_zip")))
  }

  test("router routes legacy CFB office by directory-entry names") {
    // .doc extracts for real through the piece table
    val doc = Doc.write(Seq("legacy word body", "second paragraph"))
    val routed = OfficeRouter.route(doc).toOption.get
    assert(routed.format == "doc")
    assert(routed.text == "legacy word body\nsecond paragraph\n")
    assert(routed.units == 2)
    // .xls extracts for real through the BIFF8 walk
    val xls = Xls.write(Seq("Sheet1"), Seq("cell text", "more"),
      Seq(2.0), labelsPerSheet = 3)
    val routedXls = OfficeRouter.route(xls).toOption.get
    assert(routedXls.format == "xls")
    assert(routedXls.text == "cell text\nmore")
    assert(routedXls.units == 3)
    // a Workbook stream that isn't BIFF carries the parser's reason
    val junkWb = Cfb.write(Seq("Workbook" -> Array.fill[Byte](600)(1)))
    assert(OfficeRouter.route(junkWb).isLeft)
    // BIFF5 ("Book") rejects with its version name
    val book = Xls.write(Seq("S"), Seq("x"), Nil, labelsPerSheet = 1)
    val parsed5 = Cfb.parse(book).toOption.get
    val wb5 = parsed5.streams("Workbook").clone()
    wb5(4) = 0x00; wb5(5) = 0x05
    assert(OfficeRouter.route(Cfb.write(Seq("Book" -> wb5))) ==
      Left(OfficeRouter.Rejected("biff_version_unsupported_0x0500")))
    // .ppt extracts for real through the record-tree walk
    val ppt = Ppt.write(Seq("slide one text", "second slide"))
    val routedPpt = OfficeRouter.route(ppt).toOption.get
    assert(routedPpt.format == "ppt")
    assert(routedPpt.text == "slide one text\nsecond slide")
    assert(routedPpt.units == 2)
    // a PowerPoint Document stream that isn't records carries a reason
    val junkPpt = Cfb.write(Seq(
      "PowerPoint Document" -> Array.fill[Byte](600)(3),
      "Current User" -> Array.fill[Byte](20)(4)))
    assert(OfficeRouter.route(junkPpt).isLeft)
    // a compound file that is none of the three
    val other = Cfb.write(Seq("Contents" -> Array.fill[Byte](100)(5)))
    assert(OfficeRouter.route(other) ==
      Left(OfficeRouter.Rejected("ole2_unknown")))
    // a malformed compound file carries the parser's named reason
    val broken = java.util.Arrays.copyOf(doc, 400)
    assert(OfficeRouter.route(broken) ==
      Left(OfficeRouter.Rejected("cfb_truncated_cfb")))
  }
}
