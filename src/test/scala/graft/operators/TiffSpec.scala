package graft.operators

import graft.SparkSuite

class TiffSpec extends SparkSuite {

  private def gray(w: Int, h: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h)(i =>
      ((seed + 3L * (i % w) + 7L * (i / w)) % 256).toByte)

  test("strip layouts roundtrip across both endians and strip sizes") {
    for {
      (w, h) <- Seq((5, 4), (9, 13), (21, 16), (1, 1), (7, 1), (1, 9))
      rps <- Seq(1, 2, 3, h, h + 5) // incl. single-strip and over-tall
      little <- Seq(true, false)
    } {
      val px = gray(w, h, seed = w * 7L + h + rps)
      val enc = Tiff.encodeGray(w, h, px, rps, little)
      val dec = Tiff.decodeGray(enc)
      assert(dec.isDefined, s"${w}x$h rps=$rps little=$little")
      val (dw, dh, dp) = dec.get
      assert(dw == w && dh == h && dp.toSeq == px.toSeq,
        s"${w}x$h rps=$rps little=$little pixels differ")
    }
  }

  test("hostile inputs reject: bad magic, strip escapes, short strip, compression") {
    val good = Tiff.encodeGray(9, 8, gray(9, 8, 3), rowsPerStrip = 3,
      littleEndian = true)
    assert(Tiff.decodeGray(good).isDefined)

    // wrong byte-order mark / magic
    val bom = good.clone(); bom(0) = 'X'
    assert(Tiff.decodeGray(bom).isEmpty)
    val magic = good.clone(); magic(2) = 43
    assert(Tiff.decodeGray(magic).isEmpty)

    // truncation: strips fall off the end of the file
    assert(Tiff.decodeGray(good.dropRight(10)).isEmpty)

    // a LYING compression tag rejects: claiming LZW over raw strip
    // bytes must fail the strict decode, not pass them through (entry
    // 3 = compression; II: IFD at 8, entry 3 value at 10+3*12+8)
    val comp = good.clone()
    comp(10 + 3 * 12 + 8) = 5 // LZW label on uncompressed data
    assert(Tiff.decodeGray(comp).isEmpty)
    // an UNSUPPORTED compression rejects by name (CCITT G4 fax)
    val fax = good.clone()
    fax(10 + 3 * 12 + 8) = 4
    assert(Tiff.decodeGray(fax).isEmpty)

    // photometric 0 (WhiteIsZero) is out of contract — reject, don't
    // silently invert
    val photo = good.clone()
    photo(10 + 4 * 12 + 8) = 0
    assert(Tiff.decodeGray(photo).isEmpty)

    // descending tags reject: swap the first two entries wholesale
    val swapped = good.clone()
    for (k <- 0 until 12) {
      val t = swapped(10 + k)
      swapped(10 + k) = swapped(10 + 12 + k)
      swapped(10 + 12 + k) = t
    }
    assert(Tiff.decodeGray(swapped).isEmpty)
  }

  test("a lying strip byte count rejects instead of mis-tiling") {
    // single-strip image: byte count inline in entry 8 (StripByteCounts)
    val enc = Tiff.encodeGray(6, 4, gray(6, 4, 9), rowsPerStrip = 4,
      littleEndian = true)
    assert(Tiff.decodeGray(enc).isDefined)
    val lying = enc.clone()
    val cntValueAt = 10 + 8 * 12 + 8 // entry 8, LONG inline value
    lying(cntValueAt) = (lying(cntValueAt) - 1).toByte // one byte short
    assert(Tiff.decodeGray(lying).isEmpty)
  }
}
