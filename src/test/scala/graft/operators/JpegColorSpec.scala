package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Color baseline JPEG: 4:2:0 and 4:4:4 roundtrips on lossy-pipeline
  * fixed points (flat regions + DC quant step 8), the fixed-point
  * YCbCr→RGB, table-id bindings, and hostile streams.
  */
class JpegColorSpec extends AnyFunSuite {

  /** Planes flat per 8x8 (Y) and per 16x16 (chroma) — exact through
    * subsampling, DCT, and quantization. */
  private def planes(w: Int, h: Int, id: Long)
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val yP = Array.tabulate(w * h) { k =>
      val bx = (k % w) / 8; val by = (k / w) / 8
      ((id + 5L * bx + 9L * by) % 256).toByte
    }
    val cbP = Array.tabulate(w * h) { k =>
      val mx = (k % w) / 16; val my = (k / w) / 16
      ((id * 3 + 7L * mx + 11L * my) % 256).toByte
    }
    val crP = Array.tabulate(w * h) { k =>
      val mx = (k % w) / 16; val my = (k / w) / 16
      ((id * 5 + 13L * mx + 3L * my) % 256).toByte
    }
    (yP, cbP, crP)
  }

  private def expectRgb(w: Int, h: Int,
      yP: Array[Byte], cbP: Array[Byte], crP: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](3 * w * h)
    for (k <- 0 until w * h) {
      val (r, g, b) = Jpeg.ycbcrToRgb(yP(k) & 0xff, cbP(k) & 0xff, crP(k) & 0xff)
      out(3 * k) = r.toByte; out(3 * k + 1) = g.toByte; out(3 * k + 2) = b.toByte
    }
    out
  }

  test("4:2:0 roundtrip is exact on MCU-flat fixtures") {
    for (id <- Seq(0L, 7L, 200L); (w, h) <- Seq((16, 16), (32, 16), (32, 48))) {
      val (yP, cbP, crP) = planes(w, h, id)
      val enc = Jpeg.encodeColor420(w, h, yP, cbP, crP)
      val (dw, dh, rgb) = Jpeg.decodeRgb(enc).getOrElse(fail(s"decode failed id=$id"))
      assert((dw, dh) == (w, h))
      assert(rgb.sameElements(expectRgb(w, h, yP, cbP, crP)),
        s"pixel mismatch id=$id ${w}x$h")
    }
  }

  test("4:4:4 roundtrip is exact on block-flat fixtures") {
    val w = 24; val h = 16
    // 4:4:4 has no subsampling, so chroma only needs to be flat per 8x8
    val (yP, _, _) = planes(w, h, 3L)
    val cbP = Array.tabulate(w * h) { k =>
      val bx = (k % w) / 8; val by = (k / w) / 8
      ((40 + 17L * bx + 29L * by) % 256).toByte
    }
    val crP = Array.tabulate(w * h)(k => 200.toByte)
    val enc = Jpeg.encodeColor444(w, h, yP, cbP, crP)
    val (dw, dh, rgb) = Jpeg.decodeRgb(enc).getOrElse(fail("decode failed"))
    assert((dw, dh) == (w, h))
    assert(rgb.sameElements(expectRgb(w, h, yP, cbP, crP)))
  }

  test("non-MCU-aligned dimensions crop correctly (4:2:0)") {
    val w = 24; val h = 20 // MCU grid 2x2, right/bottom partially covered
    val (yP, cbP, crP) = planes(w, h, 9L)
    val enc = Jpeg.encodeColor420(w, h, yP, cbP, crP)
    val (dw, dh, rgb) = Jpeg.decodeRgb(enc).getOrElse(fail("decode failed"))
    assert((dw, dh) == (w, h) && rgb.length == 3 * w * h)
    // interior MCU-flat region decodes exactly (edge replication only
    // affects padded samples outside the crop)
    val exp = expectRgb(w, h, yP, cbP, crP)
    assert(rgb.sameElements(exp))
  }

  test("fixed-point YCbCr->RGB: neutral chroma is identity, extremes clamp") {
    assert(Jpeg.ycbcrToRgb(128, 128, 128) == ((128, 128, 128)))
    assert(Jpeg.ycbcrToRgb(0, 128, 128) == ((0, 0, 0)))
    assert(Jpeg.ycbcrToRgb(255, 128, 128) == ((255, 255, 255)))
    val (r1, _, _) = Jpeg.ycbcrToRgb(255, 128, 255)
    assert(r1 == 255) // clamped, not wrapped
    val (_, _, b2) = Jpeg.ycbcrToRgb(0, 0, 128)
    assert(b2 == 0)
    // sanity vs the float formula within 1 count
    for (y <- Seq(10, 100, 250); cb <- Seq(5, 130, 250); cr <- Seq(5, 130, 250)) {
      val (r, g, b) = Jpeg.ycbcrToRgb(y, cb, cr)
      def cl(v: Double) = math.max(0, math.min(255, v))
      assert(math.abs(r - cl(y + 1.402 * (cr - 128))) <= 1.0)
      assert(math.abs(g - cl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))) <= 1.0)
      assert(math.abs(b - cl(y + 1.772 * (cb - 128))) <= 1.0)
    }
  }

  test("API contracts: gray streams refuse decodeRgb and vice versa") {
    val gray = Jpeg.encodeGray(16, 16, Array.fill(256)(77.toByte))
    assert(Jpeg.decodeRgb(gray).isEmpty)
    assert(Jpeg.decodeGray(gray).nonEmpty)
    val (yP, cbP, crP) = planes(16, 16, 1L)
    val color = Jpeg.encodeColor420(16, 16, yP, cbP, crP)
    assert(Jpeg.decodeGray(color).isEmpty)
    assert(Jpeg.decodeRgb(color).nonEmpty)
  }

  test("hostile streams return None, never throw") {
    val (yP, cbP, crP) = planes(16, 16, 4L)
    val good = Jpeg.encodeColor420(16, 16, yP, cbP, crP)
    // truncations: anything cut inside headers or entropy data is None;
    // a cut past the last MCU's bits (trailing pad/EOI) legitimately
    // still decodes — the decoder never requires EOI, like the gray path.
    // Either way: no throw.
    for (n <- 0 until good.length by 7) {
      val r = Jpeg.decodeRgb(good.take(n))
      if (n < good.length / 2) assert(r.isEmpty, s"truncated at $n")
    }
    // unsupported sampling: patch SOF0's Y sampling byte 0x22 -> 0x21
    val sofAt = {
      var i = 2
      var at = -1
      while (at < 0) {
        val m = good(i + 1) & 0xff
        val len = ((good(i + 2) & 0xff) << 8) | (good(i + 3) & 0xff)
        if (m == 0xc0) at = i + 4
        else i += 2 + len
      }
      at
    }
    val patched = good.clone()
    assert((patched(sofAt + 7) & 0xff) == 0x22)
    patched(sofAt + 7) = 0x21.toByte // 4:1:1-style: out of contract
    assert(Jpeg.decodeRgb(patched).isEmpty)
    // garbage
    assert(Jpeg.decodeRgb(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decodeRgb(Array.fill(64)(0xff.toByte)).isEmpty)
  }

  test("byte-flip fuzz: corrupted streams never throw") {
    val (yP, cbP, crP) = planes(32, 32, 11L)
    val good = Jpeg.encodeColor420(32, 32, yP, cbP, crP)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val bad = good.clone()
      // flip 1-3 random bytes anywhere (headers, tables, entropy data)
      for (_ <- 0 to rnd.nextInt(3)) {
        val at = rnd.nextInt(bad.length)
        bad(at) = (bad(at) ^ (1 << rnd.nextInt(8))).toByte
      }
      // any outcome but an exception is acceptable: None, or a decode of
      // the corrupted-but-still-wellformed stream
      Jpeg.decodeRgb(bad)
      Jpeg.decodeGray(bad)
    }
  }
}
