package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BIFF8 .xls census + shared-string text: the SST continuation quirk
  * (a string split mid-characters across a Continue record WITH the
  * compression flag flipped) is planted in every default fixture. No
  * .xls generator exists on-system — construct-and-cross-check. */
class XlsSpec extends AnyFunSuite {

  test("sheets, SST text, and numeric cells extract exactly") {
    val strings = Seq("first shared string", "segundo", "третья строка")
    val numbers = Seq(1.5, -2.25, 1e10)
    val blob = Xls.write(Seq("Data", "Ark2"), strings, numbers,
      labelsPerSheet = 4)
    val ex = Xls.extract(blob).toOption.get
    assert(ex.biffVersion == 8)
    assert(ex.sheetNames == Seq("Data", "Ark2"))
    assert(ex.nStrings == 3)
    assert(ex.sstText == strings.mkString("\n"))
    assert(ex.nLabelCells == 8)
    // per sheet: 3 Numbers + 1 RK (42 + sheetIndex)
    assert(ex.nNumberCells == 8)
    assert(ex.numericSum == 2 * numbers.sum + 42 + 43)
  }

  test("the SST Continue split re-declares the compression flag") {
    // the first string is ascii, split after 3 chars; the tail rides
    // the Continue as UTF-16 — a reader ignoring the re-flag produces
    // interleaved garbage
    val strings = Seq("abcdefghij", "tail")
    val ex = Xls.extract(Xls.write(Seq("S"), strings, Nil,
      labelsPerSheet = 1)).toOption.get
    assert(ex.sstText == "abcdefghij\ntail")
    // and the unsplit form agrees
    val ex2 = Xls.extract(Xls.write(Seq("S"), strings, Nil,
      labelsPerSheet = 1, splitSst = false)).toOption.get
    assert(ex2.sstText == ex.sstText)
  }

  test("named rejections") {
    assert(Xls.extract("junk".getBytes) ==
      Left(Xls.Rejected("cfb_not_cfb")))
    val noWb = Cfb.write(Seq("Whatever" -> Array.fill[Byte](64)(1)))
    assert(Xls.extractFromCfb(Cfb.parse(noWb).toOption.get) ==
      Left(Xls.Rejected("missing_workbook")))
    val good = Xls.write(Seq("S"), Seq("str"), Seq(1.0), labelsPerSheet = 2)
    val parsed = Cfb.parse(good).toOption.get
    val wb = parsed.streams("Workbook")

    // encrypted: plant a FilePass record right after the globals BOF
    val bofLen = 4 + 16
    val filePass = Array[Byte](0x2F, 0x00, 0x02, 0x00, 0x01, 0x00)
    val enc = wb.take(bofLen) ++ filePass ++ wb.drop(bofLen)
    assert(Xls.extractFromCfb(Cfb.parse(Cfb.write(Seq(
      "Workbook" -> enc))).toOption.get) ==
      Left(Xls.Rejected("xls_encrypted")))

    // BIFF5 version word
    val b5 = wb.clone(); b5(4) = 0x00; b5(5) = 0x05
    assert(Xls.extractFromCfb(Cfb.parse(Cfb.write(Seq(
      "Workbook" -> b5))).toOption.get) ==
      Left(Xls.Rejected("biff_version_unsupported_0x0500")))

    // a LabelSst pointing past the SST
    val labelAt = {
      var p = 0
      var found = -1
      while (found < 0 && p + 4 <= wb.length) {
        if (((wb(p) & 0xff) | ((wb(p + 1) & 0xff) << 8)) == 0x00FD)
          found = p
        else p += 4 + ((wb(p + 2) & 0xff) | ((wb(p + 3) & 0xff) << 8))
      }
      found
    }
    val oob = wb.clone(); oob(labelAt + 4 + 6) = 9 // isst = 9 > 0
    assert(Xls.extractFromCfb(Cfb.parse(Cfb.write(Seq(
      "Workbook" -> oob))).toOption.get) ==
      Left(Xls.Rejected("sst_index_out_of_range")))

    // truncated mid-record
    assert(Xls.extractFromCfb(Cfb.parse(Cfb.write(Seq(
      "Workbook" -> wb.take(30)))).toOption.get).isLeft)
  }
}
