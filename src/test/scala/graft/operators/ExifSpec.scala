package graft.operators

import graft.SparkSuite

class ExifSpec extends SparkSuite {

  private def jpeg(seed: Long): Array[Byte] = {
    val w = 16; val h = 8
    Jpeg.encodeGray(w, h,
      Array.tabulate(w * h)(i => ((seed + i) % 256).toByte))
  }

  test("roundtrip in both byte orders; pixel decode survives the APP1") {
    for (little <- Seq(true, false)) {
      val app1 = Exif.app1Exif(6, "cam-3", "2024:05:17 10:30:00", little)
      val p = Exif.withApp1(jpeg(11), app1)
      val meta = Exif.exifFromJpeg(p)
      assert(meta.contains(Exif.ExifMeta(6, "cam-3", "2024:05:17 10:30:00")),
        s"littleEndian=$little")
      // the spliced segment must not disturb the entropy stream
      val dec = Jpeg.decodeGray(p)
      assert(dec.isDefined && dec.get._1 == 16 && dec.get._2 == 8)
    }
  }

  test("a JPEG without APP1 yields None, not a fabricated row") {
    assert(Exif.exifFromJpeg(jpeg(5)).isEmpty)
  }

  test("hostile TIFF structures reject") {
    val good = Exif.app1Exif(2, "cam-1", "2024:01:02 10:30:00", littleEndian = true)
    def withSeg(seg: Array[Byte]) = Exif.withApp1(jpeg(7), seg)
    assert(Exif.exifFromJpeg(withSeg(good)).isDefined)

    // wrong byte-order mark
    val badBom = good.clone(); badBom(10) = 'X'
    assert(Exif.exifFromJpeg(withSeg(badBom)).isEmpty)

    // bad TIFF magic
    val badMagic = good.clone(); badMagic(12) = 43
    assert(Exif.exifFromJpeg(withSeg(badMagic)).isEmpty)

    // IFD offset escaping the segment (II: bytes 14..17 hold the offset)
    val badIfd = good.clone(); badIfd(14) = 0xff.toByte; badIfd(15) = 0x7f
    assert(Exif.exifFromJpeg(withSeg(badIfd)).isEmpty)

    // orientation out of 1..8: entry 2 value field — locate and zero it.
    // II layout: TIFF base at 10; IFD at base+8; entry 1 (orientation)
    // value at base+8+2+12+8
    val badOri = good.clone()
    val oriOff = 10 + 8 + 2 + 12 + 8
    badOri(oriOff) = 0; badOri(oriOff + 1) = 0
    assert(Exif.exifFromJpeg(withSeg(badOri)).isEmpty)

    // truncated mid-APP1: the declared length points past the buffer
    assert(Exif.exifFromJpeg(withSeg(good).take(30)).isEmpty)

    // descending tags reject: swap the Make and Orientation entries
    val swapped = good.clone()
    val e0 = 10 + 8 + 2
    for (k <- 0 until 12) {
      val t = swapped(e0 + k)
      swapped(e0 + k) = swapped(e0 + 12 + k)
      swapped(e0 + 12 + k) = t
    }
    assert(Exif.exifFromJpeg(withSeg(swapped)).isEmpty)
  }

  test("orientation transforms: involutions, 90° inverses, dim swaps") {
    val w = 5; val h = 3
    val px = Array.tabulate(w * h)(i => (i * 11 % 256).toByte)
    def apply(o: Int, iw: Int, ih: Int, p: Array[Byte]) =
      Multimodal.applyOrientation(iw, ih, p, o)
    // identity
    assert(apply(1, w, h, px)._3.toSeq == px.toSeq)
    // flips and 180 are involutions
    for (o <- Seq(2, 3, 4)) {
      val (w2, h2, p2) = apply(o, w, h, px)
      assert(w2 == w && h2 == h)
      assert(apply(o, w2, h2, p2)._3.toSeq == px.toSeq, s"o=$o not involution")
      assert(p2.toSeq != px.toSeq, s"o=$o left pixels unchanged — vacuous")
    }
    // transposes are involutions and swap dims
    for (o <- Seq(5, 7)) {
      val (w2, h2, p2) = apply(o, w, h, px)
      assert(w2 == h && h2 == w)
      assert(apply(o, w2, h2, p2)._3.toSeq == px.toSeq, s"o=$o not involution")
    }
    // 6 and 8 are mutual inverses (rotate 90 each way)
    val (w6, h6, p6) = apply(6, w, h, px)
    assert(w6 == h && h6 == w)
    assert(apply(8, w6, h6, p6)._3.toSeq == px.toSeq)
    val (w8, h8, p8) = apply(8, w, h, px)
    assert(apply(6, w8, h8, p8)._3.toSeq == px.toSeq)
  }

  test("EXIF orientation drives the transform end-to-end on a real JPEG") {
    // the q162 fixture family: read orientation from APP1, normalize the
    // decoded plane — dims must swap exactly when the tag says so
    for (o <- 1 to 8) {
      val app1 = Exif.app1Exif(o, "cam-1", "2024:01:01 10:30:00",
        littleEndian = o % 2 == 0)
      val p = Exif.withApp1(jpeg(o.toLong), app1)
      val meta = Exif.exifFromJpeg(p).get
      val (w, h, px) = Jpeg.decodeGray(p).get
      val (ow, oh, out) = Multimodal.applyOrientation(w, h, px, meta.orientation)
      if (o >= 5) assert(ow == h && oh == w) else assert(ow == w && oh == h)
      assert(out.length == px.length)
    }
  }

  test("a missing NUL terminator on an ASCII value rejects") {
    val good = Exif.app1Exif(1, "cam-0", "2024:01:01 10:30:00", littleEndian = true)
    // Make data area starts at TIFF base + 50 (the builder's layout);
    // its last byte is the NUL — overwrite it
    val makeLen = "cam-0".length + 1
    val bad = good.clone()
    bad(10 + 50 + makeLen - 1) = 'Z'
    assert(Exif.exifFromJpeg(Exif.withApp1(jpeg(3), bad)).isEmpty)
  }
}
