package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Interop against the REFERENCE implementation: the checked-in
  * fixtures were encoded by the system libwebp and the expected planes
  * are libwebp's OWN decode (tools/make_webp_fixtures.py) — so these
  * pin graft's from-scratch VP8 decoder bit-for-bit against real
  * streams carrying everything a fixture encoder can't fake honestly:
  * probability updates, segmentation as the encoder emits it, every
  * intra mode the encoder picks, and the loop filter. */
class Vp8InteropSpec extends AnyFunSuite {

  private val dir = java.nio.file.Paths.get("src/test/resources/graft/webp")

  private def read(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(dir.resolve(name))

  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  for (i <- 0 until 8) {
    test(s"lossy_$i decodes bit-exactly to libwebp's own YUV output") {
      val blob = read(s"lossy_$i.webp")
      val exp = read(s"lossy_$i.yuv")
      val w = le32(exp, 0); val h = le32(exp, 4)
      val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
      val got = Vp8.decode(blob)
      assert(got.isRight, s"$got")
      val yuv = got.toOption.get
      assert((yuv.w, yuv.h) == (w, h))
      val yOff = 8
      val uOff = yOff + w * h
      val vOff = uOff + uvW * uvH
      var bad = 0
      var firstBad = ""
      var k = 0
      while (k < w * h) {
        if (yuv.y(k) != exp(yOff + k)) {
          bad += 1
          if (firstBad.isEmpty)
            firstBad = s"y[${k % w},${k / w}]: got ${yuv.y(k) & 0xff} want ${exp(yOff + k) & 0xff}"
        }
        k += 1
      }
      k = 0
      while (k < uvW * uvH) {
        if (yuv.u(k) != exp(uOff + k)) { bad += 1; if (firstBad.isEmpty) firstBad = s"u[$k]" }
        if (yuv.v(k) != exp(vOff + k)) { bad += 1; if (firstBad.isEmpty) firstBad = s"v[$k]" }
        k += 1
      }
      assert(bad == 0, s"$bad mismatched samples; first: $firstBad")
    }
  }

  test("container sniff: detectFormat + imageDims on real webp files") {
    for (i <- 0 until 8) {
      val blob = read(s"lossy_$i.webp")
      val exp = read(s"lossy_$i.yuv")
      assert(Multimodal.detectFormat(blob) == "webp")
      assert(Multimodal.imageDims(blob).contains((le32(exp, 0), le32(exp, 4))))
    }
    for (i <- 0 until 7) {
      val blob = read(s"lossless_$i.webp")
      val exp = read(s"lossless_$i.argb")
      assert(Multimodal.detectFormat(blob) == "webp")
      assert(Multimodal.imageDims(blob).contains((le32(exp, 0), le32(exp, 4))))
    }
  }

  for (i <- 0 until 7) {
    test(s"lossless_$i (real libwebp VP8L) decodes bit-exactly to ARGB") {
      val blob = read(s"lossless_$i.webp")
      val exp = read(s"lossless_$i.argb")
      val w = le32(exp, 0); val h = le32(exp, 4)
      val got = Vp8l.decode(blob)
      assert(got.isRight, s"$got")
      val (gw, gh, px) = got.toOption.get
      assert((gw, gh) == (w, h))
      var bad = 0
      var first = ""
      var k = 0
      while (k < w * h) {
        // expected file is big-endian ARGB per pixel (WebPDecodeARGB)
        val o = 8 + k * 4
        val want = ((exp(o) & 0xff) << 24) | ((exp(o + 1) & 0xff) << 16) |
          ((exp(o + 2) & 0xff) << 8) | (exp(o + 3) & 0xff)
        if (px(k) != want) {
          bad += 1
          if (first.isEmpty) first = f"px[$k]: got ${px(k)}%08x want $want%08x"
        }
        k += 1
      }
      assert(bad == 0, s"$bad mismatched pixels; first: $first")
    }
  }

  for (i <- 0 until 3) {
    test(s"alpha_$i (VP8X + ALPH) decodes color AND alpha bit-exactly") {
      val blob = read(s"alpha_$i.webp")
      val exp = read(s"alpha_$i.yuva")
      val w = le32(exp, 0); val h = le32(exp, 4)
      val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
      val got = Vp8.decode(blob)
      assert(got.isRight, s"$got")
      val yuv = got.toOption.get
      assert((yuv.w, yuv.h) == (w, h))
      assert(yuv.alpha.isDefined, "ALPH chunk must yield an alpha plane")
      val yOff = 8
      val uOff = yOff + w * h
      val vOff = uOff + uvW * uvH
      val aOff = vOff + uvW * uvH
      var bad = 0
      var first = ""
      var k = 0
      while (k < w * h) {
        if (yuv.y(k) != exp(yOff + k)) { bad += 1; if (first.isEmpty) first = s"y[$k]" }
        if (yuv.alpha.get(k) != exp(aOff + k)) {
          bad += 1
          if (first.isEmpty)
            first = s"a[${k % w},${k / w}]: got ${yuv.alpha.get(k) & 0xff} want ${exp(aOff + k) & 0xff}"
        }
        k += 1
      }
      k = 0
      while (k < uvW * uvH) {
        if (yuv.u(k) != exp(uOff + k)) { bad += 1; if (first.isEmpty) first = s"u[$k]" }
        if (yuv.v(k) != exp(vOff + k)) { bad += 1; if (first.isEmpty) first = s"v[$k]" }
        k += 1
      }
      assert(bad == 0, s"$bad mismatched samples; first: $first")
    }
  }
}
