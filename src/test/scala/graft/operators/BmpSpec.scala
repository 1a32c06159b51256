package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BMP contracts: bit-exact roundtrips through both pixel-data grammars
  * (BI_RGB and BI_RLE8), the BGR swizzle and bottom-up flip, and
  * reject-don't-guess on hostile streams.
  */
class BmpSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  test("gray BI_RGB roundtrips bit-exact across dims incl. padded strides") {
    for ((w, h) <- Seq((1, 1), (4, 4), (5, 3), (7, 2), (13, 9))) {
      val px = gray(w, h)((x, y) => 17 * x + 31 * y + 5)
      val got = Bmp.decodeGray(Bmp.encodeGray(w, h, px))
        .getOrElse(fail(s"decode failed ${w}x$h"))
      assert(got._1 == w && got._2 == h && got._3.sameElements(px))
    }
  }

  test("gray BI_RLE8 roundtrips runs, literals, and mixed rows") {
    val patterns = Seq[(Int, Int, (Int, Int) => Int)](
      (9, 4, (_, _) => 7), // one long run per row
      (9, 4, (x, y) => 13 * x + y), // all literals
      (12, 5, (x, y) => if (x < 6) 3 else 11 * x + y), // run then literal
      (8, 3, (x, _) => if (x % 2 == 0) 1 else 2), // alternating, no runs
      (300, 2, (x, y) => if (x < 290) 9 else x + y)) // >255 run split
    for ((w, h, f) <- patterns) {
      val px = gray(w, h)(f)
      val got = Bmp.decodeGray(Bmp.encodeGrayRle8(w, h, px))
        .getOrElse(fail(s"rle decode failed ${w}x$h"))
      assert(got._3.sameElements(px), s"rle mismatch ${w}x$h")
    }
  }

  test("24-bpp color roundtrips the BGR swizzle and row flip") {
    val (w, h) = (5, 4)
    val rgb = Array.tabulate(3 * w * h)(j => (j * 7 + 3).toByte)
    val got = Bmp.decodeColor(Bmp.encodeColor(w, h, rgb)).get
    assert(got._1 == w && got._2 == h && got._3.sameElements(rgb))
  }

  test("hostile streams: truncations and flips reject or leave pixels intact") {
    val px = gray(9, 5)((x, y) => 19 * x + 3 * y)
    for (blob <- Seq(Bmp.encodeGray(9, 5, px), Bmp.encodeGrayRle8(9, 5, px))) {
      val want = Bmp.decodeGray(blob).get._3.toSeq
      for (cut <- Seq(3, 13, 53, blob.length / 2, blob.length - 1))
        assert(Bmp.decodeGray(blob.take(cut)).isEmpty, s"truncation at $cut")
      for (pos <- blob.indices by 5) {
        val mut = blob.clone()
        mut(pos) = (mut(pos) ^ 0x5a).toByte
        Bmp.decodeGray(mut) match {
          case None => () // rejected: fine
          case Some((_, _, p)) =>
            // an accepted flip must have hit pixel data (gray value
            // changes) — never silently corrupt the geometry
            assert(p.length == px.length, s"flip at $pos changed geometry")
        }
      }
    }
  }

  test("RLE deltas, unknown compression, and non-identity palettes reject") {
    val px = gray(6, 3)((x, y) => x + y)
    val rle = Bmp.encodeGrayRle8(6, 3, px)
    // compression code 2 (RLE4) in the header
    val badComp = rle.clone(); badComp(30) = 2
    assert(Bmp.decodeGray(badComp).isEmpty)
    // break the palette ramp: entry 0 becomes non-gray
    val badPal = rle.clone(); badPal(54) = 99
    assert(Bmp.decodeGray(badPal).isEmpty)
    assert(Bmp.decodeIndexed(badPal).isDefined) // indexed path still fine
    // oversized declared dims
    val huge = Bmp.encodeGray(6, 3, px).clone()
    huge(18) = 0; huge(19) = 0; huge(20) = 1 // w = 65536
    huge(22) = 0; huge(23) = 0; huge(24) = 1 // h = 65536 -> 2^32 px
    assert(Bmp.decodeGray(huge).isEmpty)
  }

  test("pixels referencing undeclared palette entries reject") {
    // declare a 4-entry palette (biClrUsed=4) but keep pixel values >= 4:
    // the indices point at undefined entries — a guessed image, so None
    val px = gray(6, 3)((x, y) => 50 + x + y)
    val blob = Bmp.encodeGray(6, 3, px).clone()
    blob(46) = 4; blob(47) = 0; blob(48) = 0; blob(49) = 0 // biClrUsed = 4
    assert(Bmp.decodeIndexed(blob).isEmpty)
    assert(Bmp.decodeGray(blob).isEmpty)
    // in-range indices under the same truncated palette still decode
    val small = gray(6, 3)((x, y) => (x + y) % 4)
    val ok = Bmp.encodeGray(6, 3, small).clone()
    ok(46) = 4; ok(47) = 0; ok(48) = 0; ok(49) = 0
    assert(Bmp.decodeIndexed(ok).isDefined)
  }

  test("rows with trailing garbage after EOB reject") {
    val px = gray(5, 3)((x, y) => 2 * x + y)
    val rle = Bmp.encodeGrayRle8(5, 3, px)
    assert(Bmp.decodeGray(rle :+ 0.toByte).isEmpty)
  }
}
