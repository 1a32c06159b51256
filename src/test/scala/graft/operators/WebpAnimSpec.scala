package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Animated WebP walk: frames re-framed from graft-encoded stills
  * (whose bitstreams are reference-sealed against libwebp) must decode
  * back to the exact per-frame pixels, placement, timing, and flags;
  * plus the hostile sweep. */
class WebpAnimSpec extends AnyFunSuite {

  private def lossyStill(id: Long, w: Int, h: Int): Array[Byte] =
    Vp8.encode(w, h,
      (mx, my) => ((id * 7 + 29 * mx + 31 * my) % 256).toInt,
      (mx, my) => ((id * 11 + 13 * mx) % 256).toInt,
      (mx, my) => ((id * 5 + 17 * my) % 256).toInt)

  private def losslessStill(id: Long, w: Int, h: Int): Array[Byte] = {
    val px = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      (0xff << 24) | (((id * 3 + x) % 256).toInt << 16) |
        (((id * 5 + y) % 256).toInt << 8) | ((id + x + y) % 256).toInt
    }
    Vp8l.encode(w, h, px, cacheBits = 3)
  }

  test("mixed lossless/lossy animation roundtrips frames exactly") {
    for (id <- 0L until 4L) {
      val stills = Seq(
        (0, 0, 40, 1, losslessStill(id, 20, 12)),
        (10, 4, 66, 2, lossyStill(id, 32, 16)), // no-blend flag
        (2, 6, 100, 3, losslessStill(id + 9, 8, 5))) // dispose+no-blend
      val blob = WebpAnim.encode(64, 32, 0x80FF0000, 3, stills)
      val got = WebpAnim.decode(blob)
      assert(got.isRight, s"id=$id: $got")
      val anim = got.toOption.get
      assert((anim.canvasW, anim.canvasH) == (64, 32))
      assert(anim.backgroundArgb == 0x80FF0000)
      assert(anim.loopCount == 3)
      assert(anim.frames.length == 3)
      val f0 = anim.frames(0)
      assert((f0.x, f0.y, f0.w, f0.h, f0.durationMs) == (0, 0, 20, 12, 40))
      assert(!f0.noBlend && f0.disposeToBackground)
      assert(f0.argb.isDefined)
      // frame pixels equal a direct still decode
      assert(f0.argb.get.toSeq ==
        Vp8l.decode(losslessStill(id, 20, 12)).toOption.get._3.toSeq)
      val f1 = anim.frames(1)
      assert((f1.x, f1.y, f1.w, f1.h) == (10, 4, 32, 16))
      assert(f1.noBlend && !f1.disposeToBackground)
      assert(f1.yuv.isDefined)
      assert(f1.yuv.get.y.toSeq ==
        Vp8.decode(lossyStill(id, 32, 16)).toOption.get.y.toSeq)
      val f2 = anim.frames(2)
      assert(f2.noBlend && f2.disposeToBackground)
    }
  }

  test("lossy frame with ALPH inside ANMF decodes its alpha") {
    val alpha = Array.tabulate[Byte](24 * 16)(k => (k * 3).toByte)
    val still = Vp8.wrapWithAlpha(lossyStill(2, 24, 16), alpha, 24, 16, filter = 3)
    val blob = WebpAnim.encode(24, 16, 0, 0, Seq((0, 0, 50, 0, still)))
    val anim = WebpAnim.decode(blob).toOption.get
    assert(anim.frames.head.yuv.get.alpha.get.toSeq == alpha.toSeq)
  }

  test("named rejections: not animated, frame off canvas, no frames") {
    val still = lossyStill(1, 16, 16)
    assert(WebpAnim.decode(still) == Left(WebpAnim.Rejected("not_animated_webp")))
    val off = WebpAnim.encode(20, 20, 0, 0, Seq((8, 8, 10, 0, lossyStill(1, 16, 16))))
    assert(WebpAnim.decode(off) == Left(WebpAnim.Rejected("frame_outside_canvas")))
  }

  test("truncation sweep never crashes") {
    val blob = WebpAnim.encode(40, 24, 0, 1,
      Seq((0, 0, 30, 0, losslessStill(3, 40, 24)),
        (8, 8, 30, 0, lossyStill(3, 16, 16))))
    (0 until blob.length by 3).foreach { cut =>
      WebpAnim.decode(java.util.Arrays.copyOf(blob, cut)) match {
        case Left(_) => ()
        case Right(a) => assert(a.frames.nonEmpty)
      }
    }
  }

  test("bit-flip sweep never crashes") {
    val blob = WebpAnim.encode(24, 16, 0, 1,
      Seq((0, 0, 30, 0, losslessStill(5, 24, 16))))
    (0 until blob.length).foreach { i =>
      val c = blob.clone()
      c(i) = (c(i) ^ 0x08).toByte
      WebpAnim.decode(c)
      ()
    }
  }

  // ---- canvas composition (round 12) ----

  private def argbStill(w: Int, h: Int, px: Array[Int]): Array[Byte] =
    Vp8l.encode(w, h, px, cacheBits = 2)

  test("rect-clipped blend: a blending frame touches ONLY its rect") {
    // frame 0 fills the canvas opaque; frame 1 blends a small rect with
    // a mix of opaque, transparent, and fractional alpha
    val base = Array.fill(16 * 8)(0xff102030)
    val patch = Array.tabulate(4 * 4) { k =>
      val a = Seq(255, 0, 128, 64)(k % 4)
      (a << 24) | 0x00ffeedd
    }
    val anim = WebpAnim.decode(WebpAnim.encode(16, 8, 0, 0, Seq(
      (0, 0, 10, 0, argbStill(16, 8, base)),
      (4, 2, 10, 0, argbStill(4, 4, patch))))).toOption.get
    val Seq(c0, c1) = WebpAnim.compose(anim)
    assert(c0.argb.forall(_ == 0xff102030))
    (0 until 16 * 8).foreach { k =>
      val x = k % 16; val y = k / 16
      val inRect = x >= 4 && x < 8 && y >= 2 && y < 6
      if (!inRect) assert(c1.argb(k) == 0xff102030, s"outside rect at $x,$y")
      else {
        val src = patch((y - 2) * 4 + (x - 4))
        assert(c1.argb(k) == WebpAnim.blendPixel(src, 0xff102030))
      }
    }
    // fractional alpha onto an opaque background: da=255 collapses the
    // formula to a=255, ch = (sc*sa + dc*(255-sa))/255 — check exactly
    val mixed = WebpAnim.blendPixel((128 << 24) | 0x00ffeedd, 0xff102030)
    assert((mixed >>> 24) == 255)
    assert(((mixed >> 16) & 0xff) == (0xff * 128 + 0x10 * 127) / 255)
    assert(((mixed >> 8) & 0xff) == (0xee * 128 + 0x20 * 127) / 255)
    assert((mixed & 0xff) == (0xdd * 128 + 0x30 * 127) / 255)
    // and onto a fractional-alpha background, the full non-premult form
    val m2 = WebpAnim.blendPixel((100 << 24) | 0x00804020,
      (50 << 24) | 0x00103050)
    val scale = 50 * (255 - 100) / 255
    val a2 = 100 + scale
    assert((m2 >>> 24) == a2)
    assert(((m2 >> 16) & 0xff) == (0x80 * 100 + 0x10 * scale) / a2)
  }

  test("no-blend REPLACES, including transparent source pixels over old content") {
    val base = Array.fill(8 * 8)(0xffaabbcc)
    val patch = Array.fill(4 * 4)(0x00112233) // fully transparent, rgb set
    val anim = WebpAnim.decode(WebpAnim.encode(8, 8, 0, 0, Seq(
      (0, 0, 10, 0, argbStill(8, 8, base)),
      (2, 2, 10, 2, argbStill(4, 4, patch))))).toOption.get // flags=2: no-blend
    val c1 = WebpAnim.compose(anim)(1)
    assert(c1.argb(3 * 8 + 3) == 0x00112233, "replace must copy RGBA verbatim")
    assert(c1.argb(0) == 0xffaabbcc)
  }

  test("dispose-to-background clears the rect for the NEXT frame only") {
    val base = Array.fill(8 * 8)(0xff445566)
    val tiny = Array.fill(2 * 2)(0xffffffff)
    val anim = WebpAnim.decode(WebpAnim.encode(8, 8, 0, 0, Seq(
      (0, 0, 10, 1, argbStill(8, 8, base)), // flags=1: dispose
      (0, 0, 10, 2, argbStill(2, 2, tiny))))).toOption.get
    val Seq(c0, c1) = WebpAnim.compose(anim)
    assert(c0.argb.forall(_ == 0xff445566), "dispose happens AFTER display")
    assert(c1.argb(0) == 0xffffffff.toInt)
    assert(c1.argb(5) == 0, "disposed region is transparent under frame 1")
  }

  test("lossy frames compose through the WebPDecodeRGBA-pinned space") {
    val anim = WebpAnim.decode(WebpAnim.encode(32, 16, 0, 0, Seq(
      (0, 0, 10, 0, lossyStill(9, 32, 16))))).toOption.get
    val c0 = WebpAnim.compose(anim).head
    val yuv = anim.frames.head.yuv.get
    assert(c0.argb.toSeq == WebpRgb.toArgb(yuv).toSeq)
  }
}
