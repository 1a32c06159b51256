package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** WebP YUV->RGBA pinned against libwebp's own `WebPDecodeRGBA` output
  * (the .rgba dumps beside every checked-in lossy/alpha fixture): the
  * full chain — graft's RFC 6386 decode to YUV, fancy upsampling,
  * fixed-point matrix, ALPH merge — must be SAMPLE-EXACT on real
  * libwebp-encoded files across content shapes, ragged sizes (33x21,
  * 129x65), qualities 20..95, and alpha. */
class WebpRgbSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/webp/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def expectedRgba(name: String): (Int, Int, Array[Byte]) = {
    val d = resource(name)
    val w = (d(0) & 0xff) | ((d(1) & 0xff) << 8) | ((d(2) & 0xff) << 16) |
      ((d(3) & 0xff) << 24)
    val h = (d(4) & 0xff) | ((d(5) & 0xff) << 8) | ((d(6) & 0xff) << 16) |
      ((d(7) & 0xff) << 24)
    (w, h, java.util.Arrays.copyOfRange(d, 8, d.length))
  }

  private def check(stem: String): Unit = {
    val (w, h, want) = expectedRgba(s"$stem.rgba")
    val yuv = Vp8.decode(resource(s"$stem.webp")) match {
      case Right(v) => v
      case Left(r) => fail(s"$stem: ${r.reason}")
    }
    assert(yuv.w == w && yuv.h == h, stem)
    val got = WebpRgb.toRgba(yuv)
    assert(got.length == want.length, stem)
    val firstDiff = got.zip(want).indexWhere(p => p._1 != p._2)
    assert(firstDiff == -1,
      s"$stem: first RGBA byte diff at $firstDiff " +
        s"(pixel ${firstDiff / 4} channel ${firstDiff % 4})")
  }

  test("lossy fixtures: RGBA sample-exact vs WebPDecodeRGBA") {
    (0 until 8).foreach(i => check(s"lossy_$i"))
  }

  test("alpha fixtures: RGBA incl. the A channel sample-exact") {
    (0 until 3).foreach(i => check(s"alpha_$i"))
  }

  test("toArgb packs the same samples for the shared color space") {
    val yuv = Vp8.decode(resource("lossy_4.webp")).toOption.get
    val rgba = WebpRgb.toRgba(yuv)
    val argb = WebpRgb.toArgb(yuv)
    (0 until yuv.w * yuv.h).foreach { k =>
      val o = k * 4
      val want = ((rgba(o + 3) & 0xff) << 24) | ((rgba(o) & 0xff) << 16) |
        ((rgba(o + 1) & 0xff) << 8) | (rgba(o + 2) & 0xff)
      assert(argb(k) == want)
    }
  }

  test("constant-chroma image: upsampling is exact pass-through (the q244 oracle's premise)") {
    // encode a frame whose U/V planes are constant: the 9/3/3/1 filter
    // of a constant plane is the constant, so the SQL oracle can apply
    // the matrix to (yFormula, cu, cv) directly
    val blob = Vp8.encode(32, 32,
      (mx, my) => (40 + 29 * mx + 31 * my) % 256,
      (_, _) => 90, (_, _) => 170)
    val yuv = Vp8.decode(blob).toOption.get
    val rgba = WebpRgb.toRgba(yuv)
    (0 until 32 * 32).foreach { k =>
      val y = yuv.y(k) & 0xff
      assert((rgba(k * 4) & 0xff) == WebpRgb.yuvToR(y, 170))
      assert((rgba(k * 4 + 1) & 0xff) == WebpRgb.yuvToG(y, 90, 170))
      assert((rgba(k * 4 + 2) & 0xff) == WebpRgb.yuvToB(y, 90))
    }
  }
}
