package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class RtfSpec extends AnyFunSuite {

  test("write/extract round-trips paragraphs, escapes, unicode") {
    val paras = Seq(
      "plain ascii text",
      "café – naïve",          // cp1252 \'xx escapes
      "snow ☃ and 中",     // \uN escapes with ? fallback
      "braces {x} and back\\slash",
      "tab\there")
    val ex = Rtf.extract(Rtf.write(paras)).toOption.get
    assert(ex.text == paras.mkString("\n"))
  }

  test("decoy destinations never leak") {
    val ex = Rtf.extract(Rtf.write(Seq("body only"))).toOption.get
    assert(!ex.text.contains("DECOY"))
    assert(ex.text == "body only")
    assert(ex.nSkipped >= 1) // the \*\generator group at minimum
  }

  test("uc fallback skipping: no double emission") {
    // \uc2 demands TWO fallback chars skipped after each \u
    val doc = "{\\rtf1\\ansi\\uc2 a\\u9731 ??b}".getBytes("ISO-8859-1")
    assert(Rtf.extract(doc).toOption.get.text == "a☃b")
    // \uc0: no fallback present
    val doc0 = "{\\rtf1\\ansi\\uc0 a\\u9731 b}".getBytes("ISO-8859-1")
    assert(Rtf.extract(doc0).toOption.get.text == "a☃b")
  }

  test("fldrslt kept, fldinst dropped") {
    val doc = ("{\\rtf1\\ansi{\\field{\\*\\fldinst HYPERLINK \"x\"}" +
      "{\\fldrslt visible link text}} tail}").getBytes("ISO-8859-1")
    val ex = Rtf.extract(doc).toOption.get
    assert(ex.text == "visible link text tail")
  }

  test("bin skips raw bytes including braces") {
    val head = "{\\rtf1\\ansi a\\bin5 ".getBytes("ISO-8859-1")
    val bin = Array[Byte]('}', '{', 0, '}', '\\')
    val tail = "b}".getBytes("ISO-8859-1")
    val ex = Rtf.extract(head ++ bin ++ tail).toOption.get
    assert(ex.text == "ab")
  }

  test("named rejections") {
    assert(Rtf.extract("hello".getBytes) == Left(Rtf.Rejected("not_rtf")))
    assert(Rtf.extract("{\\rtf1 unclosed".getBytes) ==
      Left(Rtf.Rejected("unbalanced_groups")))
    assert(Rtf.extract("{\\rtf1 x}}".getBytes) ==
      Left(Rtf.Rejected("unbalanced_groups")))
    assert(Rtf.extract("{\\rtf1 \\'zq}".getBytes) ==
      Left(Rtf.Rejected("bad_hex_escape")))
    assert(Rtf.extract("{\\rtf1\\ansicpg932 x}".getBytes) ==
      Left(Rtf.Rejected("codepage_unsupported_932")))
    assert(Rtf.extract("{\\rtf1 \\bin99 x}".getBytes) ==
      Left(Rtf.Rejected("truncated_rtf")))
  }

  test("raw unescaped cp1252 high bytes map like the escaped ones") {
    // generators often write cp1252 bytes directly instead of \'xx;
    // 0x93/0x94 are curly quotes, not C1 controls (advice r13)
    val blob = "{\\rtf1 a".getBytes("ISO-8859-1") ++
      Array[Byte](0x93.toByte, 'q'.toByte, 0x94.toByte) ++
      " bé}".getBytes("ISO-8859-1")
    val ex = Rtf.extract(blob).toOption.get
    assert(ex.text == "a“q” bé")
  }
}
