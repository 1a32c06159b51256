package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PdfSpec extends AnyFunSuite {

  private def doc(pages: Pdf.Page*): Array[Byte] = Pdf.write(pages)

  test("round-trip: literal, TJ array, and hex pages extract verbatim") {
    val blob = doc(
      Pdf.Page(Seq(Pdf.Lit("hello world")), flate = false),
      Pdf.Page(Seq(Pdf.Arr(Seq("part one, ", "part two, ", "part three"))),
        flate = true),
      Pdf.Page(Seq(Pdf.Hex("hex page §3 ✓")), flate = false))
    assert(Pdf.extractText(blob) ===
      Some(Seq("hello world", "part one, part two, part three",
        "hex page §3 ✓")))
  }

  test("escapes round-trip: parens, backslash, CR/LF, octal-range bytes") {
    val nasty = "a(b)c\\d \r\n e\rf\ng (nested (deep)) end"
    val blob = doc(Pdf.Page(Seq(Pdf.Lit(nasty)), flate = true))
    assert(Pdf.extractText(blob) === Some(Seq(nasty)))
  }

  test("multiple ops on one page concatenate in content order") {
    val blob = doc(Pdf.Page(
      Seq(Pdf.Lit("A"), Pdf.Arr(Seq("B", "C")), Pdf.Hex("D")), flate = false))
    assert(Pdf.extractText(blob) === Some(Seq("ABCD")))
  }

  test("flate and plain streams extract identically") {
    val txt = "same text either way"
    val a = doc(Pdf.Page(Seq(Pdf.Lit(txt)), flate = true))
    val b = doc(Pdf.Page(Seq(Pdf.Lit(txt)), flate = false))
    assert(Pdf.extractText(a) === Pdf.extractText(b))
  }

  test("in-string EOL normalization: raw CR and CRLF read back as LF") {
    // hand-built content with RAW (unescaped) CRLF inside the literal —
    // the spec says both collapse to a single LF on read
    val content = "BT /F1 12 Tf (x\r\ny\rz) Tj ET".getBytes("UTF-8")
    val blob = handBuilt(content)
    assert(Pdf.extractText(blob) === Some(Seq("x\ny\nz")))
  }

  /** Assemble a 1-page PDF around an arbitrary content stream, with a
    * correct xref — the knob fuzz tests then twist one field at a time. */
  private def handBuilt(content: Array[Byte],
      length: Int = -1, xrefShift: Int = 0,
      trailerExtra: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("UTF-8"))
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    w("%PDF-1.4\n")
    offs += out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs += out.size(); w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offs += out.size(); w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    offs += out.size()
    val len = if (length >= 0) length else content.length
    w(s"4 0 obj\n<< /Length $len >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    val xrefAt = out.size() + xrefShift
    w("xref\n0 5\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 5 /Root 1 0 R$trailerExtra >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  private val okContent = "BT (t) Tj ET".getBytes("UTF-8")

  test("hand-built baseline parses (the fuzz knobs start from green)") {
    assert(Pdf.extractText(handBuilt(okContent)) === Some(Seq("t")))
  }

  test("hostile streams quarantine to None, never partial pages") {
    val good = doc(Pdf.Page(Seq(Pdf.Lit("x")), flate = false))
    // bad header
    assert(Pdf.extractText("%PNG-1.4 not a pdf at all".getBytes("UTF-8")).isEmpty)
    // truncated anywhere in the xref/trailer tail
    assert(Pdf.extractText(good.dropRight(30)).isEmpty)
    // startxref pointing into the void
    assert(Pdf.extractText(handBuilt(okContent, xrefShift = 9999)).isEmpty)
    assert(Pdf.extractText(handBuilt(okContent, xrefShift = -3)).isEmpty)
    // overstated /Length runs past EOF
    assert(Pdf.extractText(handBuilt(okContent, length = 100000)).isEmpty)
    // understated /Length: endstream is not where the length says
    assert(Pdf.extractText(handBuilt(okContent, length = 2)).isEmpty)
    // incremental-update chain (out of subset) quarantines
    assert(Pdf.extractText(handBuilt(okContent,
      trailerExtra = " /Prev 42")).isEmpty)
    // text operator outside BT/ET
    assert(Pdf.extractText(handBuilt("(t) Tj".getBytes("UTF-8"))).isEmpty)
    // unbalanced BT
    assert(Pdf.extractText(handBuilt("BT (t) Tj".getBytes("UTF-8"))).isEmpty)
    // unbalanced parens swallow the rest of the stream
    assert(Pdf.extractText(handBuilt("BT ((t) Tj ET".getBytes("UTF-8"))).isEmpty)
    // corrupt flate bytes under a /Filter
    val fl = doc(Pdf.Page(Seq(Pdf.Lit("x")), flate = true))
    val i = indexOfSlice(fl, "stream\n".getBytes("UTF-8")) + 8
    val corrupt = fl.clone(); corrupt(i) = (corrupt(i) ^ 0x55).toByte
    assert(Pdf.extractText(corrupt).isEmpty)
  }

  test("reference cycle in the page tree quarantines") {
    // Pages node whose Kids include itself
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("UTF-8"))
    val offs = scala.collection.mutable.ArrayBuffer[Int]()
    w("%PDF-1.4\n")
    offs += out.size(); w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offs += out.size(); w("2 0 obj\n<< /Type /Pages /Kids [2 0 R] /Count 1 >>\nendobj\n")
    val xrefAt = out.size()
    w("xref\n0 3\n0000000000 65535 f \n")
    offs.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 3 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    assert(Pdf.extractText(out.toByteArray).isEmpty)
  }

  test("random byte junk never throws, always None") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      assert(Pdf.extractText(b).isEmpty)
    }
    // junk that starts with a plausible header
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](64 + rnd.nextInt(400))
      rnd.nextBytes(b)
      System.arraycopy("%PDF-1.4\n".getBytes("UTF-8"), 0, b, 0, 9)
      assert(Pdf.extractText(b).isEmpty)
    }
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
