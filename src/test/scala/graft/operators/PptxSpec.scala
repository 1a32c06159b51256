package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PptxSpec extends AnyFunSuite {

  test("write/extract round-trips slides with split runs") {
    val slides = Seq(
      Seq("title slide words here", "subtitle line"),
      Seq("second slide bullet one", "second slide bullet two"))
    val ex = Pptx.extract(Pptx.write(slides)).toOption.get
    assert(ex.nSlides == 2 && ex.nNotesSlides == 1)
    assert(ex.text == slides.map(_.mkString("\n")).mkString("\n"))
  }

  test("slides order numerically, not lexicographically") {
    // 12 slides: lexicographic member order would read slide10,11,12
    // between slide1 and slide2
    val slides = (1 to 12).map(k => Seq(s"slide $k content"))
    val ex = Pptx.extract(Pptx.write(slides, withNotes = false)).toOption.get
    assert(ex.nSlides == 12)
    assert(ex.text == (1 to 12).map(k => s"slide $k content").mkString("\n"))
  }

  test("presenter notes never leak into slide text") {
    val ex = Pptx.extract(Pptx.write(Seq(Seq("only body")))).toOption.get
    assert(!ex.text.contains("DECOY"))
    assert(ex.text == "only body")
  }

  test("named rejections: zip, slides, xml") {
    assert(Pptx.extract("x".getBytes) == Left(Pptx.Rejected("not_a_container")))
    val noSlides = ZipArchive.write(Seq(
      ZipArchive.ZipMember("ppt/presentation.xml", "<p/>".getBytes)),
      _ => false)
    assert(Pptx.extract(noSlides) == Left(Pptx.Rejected("missing_slides")))
    val badXml = ZipArchive.write(Seq(
      ZipArchive.ZipMember("ppt/slides/slide1.xml",
        "<p:sld><p:cSld>".getBytes)), _ => false)
    assert(Pptx.extract(badXml) == Left(Pptx.Rejected("xml_truncated_xml")))
  }
}
