package graft.operators

import graft.SparkSuite

class PngAdam7Spec extends SparkSuite {

  private def gray(w: Int, h: Int, seed: Long): Array[Byte] =
    Array.tabulate(w * h)(i =>
      ((seed + 3L * (i % w) + 7L * (i / w)) % 256).toByte)

  test("Adam7 grayscale roundtrips pixel-exactly across the dimension sweep") {
    // 1x1 (pass 1 only), 1xN / Nx1 (most passes empty), and sizes
    // crossing every pass-geometry boundary up to >8 in both axes
    for (w <- Seq(1, 2, 3, 4, 5, 7, 8, 9, 16, 21); h <- Seq(1, 2, 3, 5, 8, 13, 16)) {
      val px = gray(w, h, seed = w * 31L + h)
      val img = Multimodal.pngDecode(Multimodal.pngGrayAdam7(w, h, px))
      assert(img.isDefined, s"${w}x$h failed to decode")
      assert(img.get.w == w && img.get.h == h && img.get.color_type == 0)
      assert(img.get.px.toSeq == px.toSeq, s"${w}x$h pixels differ")
    }
  }

  test("interlaced decode equals the sequential decode of the same pixels") {
    for ((w, h) <- Seq((9, 10), (17, 5), (3, 12))) {
      val px = gray(w, h, seed = 99L + w)
      val seq = Multimodal.pngDecode(Multimodal.pngGray(w, h, px)).get
      val adm = Multimodal.pngDecode(Multimodal.pngGrayAdam7(w, h, px)).get
      assert(seq.px.toSeq == adm.px.toSeq)
    }
  }

  test("Adam7 truecolor and palette (all depths) roundtrip") {
    val w = 11; val h = 9
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37 + 5) % 256).toByte)
    val rgbImg = Multimodal.pngDecode(Multimodal.pngRgbAdam7(w, h, rgb)).get
    assert(rgbImg.channels == 3 && rgbImg.px.toSeq == rgb.toSeq)

    for (depth <- Seq(1, 2, 4, 8)) {
      val n = 1 << math.min(depth, 3) // palette entries <= 8
      val pal = Array.tabulate(n * 3)(i => ((i * 53 + 11) % 256).toByte)
      val idx = Array.tabulate(w * h)(i => (i % n).toByte)
      val img = Multimodal.pngDecode(
        Multimodal.pngIndexedAdam7(w, h, idx, pal, depth)).get
      val expected = idx.flatMap(j =>
        Seq(pal(j * 3), pal(j * 3 + 1), pal(j * 3 + 2)))
      assert(img.channels == 3 && img.px.toSeq == expected.toSeq,
        s"depth $depth")
    }
  }

  test("interlaced and sequential files differ only in IHDR flag and stream") {
    // the interlace byte is load-bearing: flipping it without re-laying
    // out the stream must fail (raw length no longer matches the pass
    // geometry) — a decoder that ignores the flag cannot pass this
    val w = 9; val h = 10
    val px = gray(w, h, seed = 7)
    val adm = Multimodal.pngGrayAdam7(w, h, px)
    // locate IHDR interlace byte: sig(8) + len(4) + type(4) + 13 bytes
    val flagOff = 8 + 4 + 4 + 12
    assert(adm(flagOff) == 1)
    val flipped = adm.clone()
    flipped(flagOff) = 0
    // CRC now mismatches → reject (reject-don't-guess, not a scrambled image)
    assert(Multimodal.pngDecode(flipped).isEmpty)
  }

  test("hostile inputs reject: truncated stream, bad filter, interlace method 2") {
    val w = 8; val h = 8
    val px = gray(w, h, seed = 3)
    val good = Multimodal.pngGrayAdam7(w, h, px)
    assert(Multimodal.pngDecode(good).isDefined)
    // truncation anywhere in the file fails the chunk walk or inflate
    assert(Multimodal.pngDecode(good.dropRight(7)).isEmpty)
    // an unknown interlace method must reject even with a fixed CRC
    val bad = good.clone()
    val ihdrData = 8 + 8
    bad(ihdrData + 12) = 2
    val crc = new java.util.zip.CRC32()
    crc.update(bad, 8 + 4, 4 + 13)
    val c = crc.getValue.toInt
    bad(ihdrData + 13) = (c >> 24).toByte
    bad(ihdrData + 14) = (c >> 16).toByte
    bad(ihdrData + 15) = (c >> 8).toByte
    bad(ihdrData + 16) = c.toByte
    assert(Multimodal.pngDecode(bad).isEmpty)
  }
}
