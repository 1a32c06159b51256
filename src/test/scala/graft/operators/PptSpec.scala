package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Legacy .ppt record-tree text extraction (the [MS-PPT] binary, not
  * OOXML Pptx): container recursion, byte vs UTF-16 text atoms, decoy
  * atoms skipped, named rejections. Construct-and-cross-check. */
class PptSpec extends AnyFunSuite {

  test("slide text extracts through byte and UTF-16 atoms") {
    val slides = Seq("ascii slide text", "unicode 中文 slide", "third")
    val ex = Ppt.extract(Ppt.write(slides)).toOption.get
    assert(ex.text == slides.mkString("\n"))
    assert(ex.nSlides == 3)
    assert(ex.nTextAtoms == 3)
    assert(!ex.text.contains("decoy"))
  }

  test("named rejections") {
    assert(Ppt.extract("junk".getBytes) == Left(Ppt.Rejected("cfb_not_cfb")))
    val noDoc = Cfb.write(Seq("Current User" -> Array.fill[Byte](24)(1)))
    assert(Ppt.extractFromCfb(Cfb.parse(noDoc).toOption.get) ==
      Left(Ppt.Rejected("missing_powerpoint_document")))
    val good = Ppt.write(Seq("one slide"))
    val parsed = Cfb.parse(good).toOption.get
    val doc = parsed.streams("PowerPoint Document")
    // a record lying past its parent
    val lie = doc.clone()
    lie(4) = 0xFF.toByte; lie(5) = 0xFF.toByte // Document recLen
    assert(Ppt.extractFromCfb(Cfb.parse(Cfb.write(Seq(
      "PowerPoint Document" -> lie,
      "Current User" -> parsed.streams("Current User"))))
      .toOption.get) == Left(Ppt.Rejected("record_overruns_parent")))
    // an odd-length UTF-16 atom
    val ex = Ppt.write(Seq("中文")) // forces a TextCharsAtom
    val p2 = Cfb.parse(ex).toOption.get
    val d2 = p2.streams("PowerPoint Document").clone()
    // find the TextCharsAtom (0x0FA0) and shrink its len to odd
    var i = 0
    var at = -1
    while (at < 0 && i + 8 <= d2.length) {
      if (((d2(i + 2) & 0xff) | ((d2(i + 3) & 0xff) << 8)) == 0x0FA0) at = i
      else i += 1
    }
    d2(at + 4) = 3
    assert(Ppt.extractFromCfb(Cfb.parse(Cfb.write(Seq(
      "PowerPoint Document" -> d2,
      "Current User" -> p2.streams("Current User"))))
      .toOption.get) == Left(Ppt.Rejected("bad_text_atom")))
    // encryption rejects by name: plant a CryptSession10Container
    val crypt = Array[Byte](0x0F, 0x00, 0x14, 0x2F, 0, 0, 0, 0)
    assert(Ppt.extractFromCfb(Cfb.parse(Cfb.write(Seq(
      "PowerPoint Document" -> (crypt ++ doc),
      "Current User" -> parsed.streams("Current User"))))
      .toOption.get) == Left(Ppt.Rejected("ppt_encrypted")))
  }
}
