package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class DocxSpec extends AnyFunSuite {

  test("write/extract round-trips paragraphs with split runs") {
    val paras = Seq("hello split run world", "second\tparagraph here")
    val blob = Docx.write(paras)
    val ex = Docx.extract(blob).toOption.get
    // the writer prepends a field-code-only paragraph (no body text)
    assert(ex.text == "\n" + paras.mkString("\n"))
    assert(ex.nParagraphs == paras.length + 1)
    // runs split at word boundaries: each space-separated word is a run
    assert(ex.nRuns > paras.length)
  }

  test("field-code instrText never leaks into body text") {
    val ex = Docx.extract(Docx.write(Seq("body"))).toOption.get
    assert(!ex.text.contains("PAGE"))
  }

  test("entities in content survive the round trip") {
    val p = "a & b < c > d"
    val ex = Docx.extract(Docx.write(Seq(p))).toOption.get
    assert(ex.text.endsWith(p))
  }

  test("tabs and multiple paragraphs preserve order and separators") {
    val ex = Docx.extract(Docx.write(Seq("a\tb", "c", "d"))).toOption.get
    assert(ex.text == "\na\tb\nc\nd")
  }

  test("named rejections: bad zip, missing part, malformed xml, non-utf8") {
    assert(Docx.extract("not a zip".getBytes("UTF-8")) ==
      Left(Docx.Rejected("not_a_container")))
    val noDoc = ZipArchive.write(
      Seq(ZipArchive.ZipMember("word/other.xml", "<a/>".getBytes("UTF-8"))),
      _ => false)
    assert(Docx.extract(noDoc) == Left(Docx.Rejected("missing_document_xml")))
    val badXml = ZipArchive.write(
      Seq(ZipArchive.ZipMember("word/document.xml",
        "<w:document><w:body>".getBytes("UTF-8"))), _ => false)
    assert(Docx.extract(badXml) == Left(Docx.Rejected("xml_truncated_xml")))
    val badUtf8 = ZipArchive.write(
      Seq(ZipArchive.ZipMember("word/document.xml",
        Array[Byte]('<'.toByte, 'a'.toByte, 0xC3.toByte, '>'.toByte))),
      _ => false)
    assert(Docx.extract(badUtf8) == Left(Docx.Rejected("document_not_utf8")))
  }

  test("document.xml with a DTD quarantines by name (billion-laughs gate)") {
    val dtd = ZipArchive.write(
      Seq(ZipArchive.ZipMember("word/document.xml",
        ("<?xml version=\"1.0\"?><!DOCTYPE w [<!ENTITY x \"y\">]>" +
          "<w:document/>").getBytes("UTF-8"))), _ => false)
    assert(Docx.extract(dtd) == Left(Docx.Rejected("xml_dtd_unsupported")))
  }

  test("table cells contribute their paragraphs in document order") {
    // hand-built WML: a table with two cells, each one paragraph
    val xml = "<w:document><w:body>" +
      "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell one</w:t></w:r></w:p></w:tc>" +
      "<w:tc><w:p><w:r><w:t>cell two</w:t></w:r></w:p></w:tc></w:tr></w:tbl>" +
      "<w:p><w:r><w:t>after</w:t></w:r></w:p>" +
      "</w:body></w:document>"
    val blob = ZipArchive.write(
      Seq(ZipArchive.ZipMember("word/document.xml", xml.getBytes("UTF-8"))),
      _ => true)
    val ex = Docx.extract(blob).toOption.get
    assert(ex.text == "cell one\ncell two\nafter")
    assert(ex.nParagraphs == 3 && ex.nRuns == 3)
  }
}
