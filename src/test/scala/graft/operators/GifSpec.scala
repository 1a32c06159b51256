package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** GIF LZW is lossless: roundtrips must be BIT-EXACT for any index
  * pattern — including patterns that drive the variable code width
  * through every boundary and overflow the 4096-entry dictionary, the
  * two places an encoder/decoder width-schedule mismatch hides.
  */
class GifSpec extends AnyFunSuite {

  private def pal(n: Int): Array[Int] =
    Array.tabulate(n)(c => ((37 * c + 11) % 256 << 16) |
      ((59 * c + 3) % 256 << 8) | ((83 * c + 7) % 256))

  private def roundtrip(w: Int, h: Int, palette: Array[Int],
      idx: Array[Byte]): Unit = {
    val enc = Gif.encodeIndexed(w, h, palette, idx)
    val (dw, dh, dpal, didx) = Gif.decodeIndexed(enc)
      .getOrElse(fail(s"decode failed ${w}x$h pal=${palette.length}"))
    assert((dw, dh) == (w, h))
    assert(dpal.sameElements(palette))
    assert(didx.sameElements(idx), s"index mismatch ${w}x$h pal=${palette.length}")
  }

  test("bit-exact roundtrips across palette sizes and patterns") {
    val rnd = new scala.util.Random(3)
    for (bits <- Seq(1, 2, 3, 4, 8); (w, h) <- Seq((1, 1), (7, 3), (16, 16), (61, 33))) {
      val n = 1 << bits
      // random pattern — exercises fresh dictionary entries
      roundtrip(w, h, pal(n), Array.fill(w * h)(rnd.nextInt(n).toByte))
      // runs — exercises KwKwK and deep prefix chains
      roundtrip(w, h, pal(n),
        Array.tabulate(w * h)(k => ((k / 7) % n).toByte))
      // constant — the degenerate single-entry chain
      roundtrip(w, h, pal(n), Array.fill(w * h)((n - 1).toByte))
    }
  }

  test("dictionary overflow: a large noisy image forces the 4096 reset") {
    val rnd = new scala.util.Random(17)
    val w = 256; val h = 128 // 32k indices over 256 colors: dict overflows
    roundtrip(w, h, pal(256), Array.fill(w * h)(rnd.nextInt(256).toByte))
    // and with 2-bit palette (longer chains per entry, later overflow)
    roundtrip(w, h, pal(4), Array.fill(w * h)(rnd.nextInt(4).toByte))
  }

  test("interlaced images round-trip bit-exactly and differ only in row placement") {
    val rnd = new scala.util.Random(11)
    // heights hitting every pass-boundary shape, incl. h < 8 (some
    // passes empty) and h = 1 (only pass 1)
    for ((w, h) <- Seq((7, 1), (5, 3), (8, 8), (13, 9), (16, 29))) {
      val idx = Array.fill(w * h)(rnd.nextInt(4).toByte)
      val ijpg = Gif.encodeIndexed(w, h, pal(4), idx, interlaced = true)
      // the flag is actually set in the emitted descriptor
      assert((ijpg(13 + 3 * 4 + 9) & 0xff) == 0x40)
      val got = Gif.decodeIndexed(ijpg)
      assert(got.exists(_._4.toSeq == idx.toSeq), s"${w}x$h interlaced")
      // sequential encode of the same pixels decodes identically: the
      // interlace is pure framing
      assert(Gif.decodeIndexed(Gif.encodeIndexed(w, h, pal(4), idx))
        .exists(_._4.toSeq == idx.toSeq))
      // and the permutation really is the 4-pass order: sequentially
      // encoding the pass-ordered rows yields the SAME entropy bytes —
      // only the descriptor's interlace flag differs (byte 34 here:
      // 13 header + 12 palette + offset 9 into the descriptor)
      val seq = Gif.encodeIndexed(w, h, pal(4),
        Gif.interlaceRows(h).flatMap(r => idx.slice(r * w, r * w + w)))
      assert(seq.drop(35).toSeq == ijpg.drop(35).toSeq, s"${w}x$h entropy")
    }
  }

  test("animated streams: per-frame round-trip, GCE skip, hostile variants") {
    val rnd = new scala.util.Random(23)
    val (w, h) = (9, 7)
    val frames = (0 until 4).map(_ =>
      Array.fill(w * h)(rnd.nextInt(4).toByte))
    val anim = Gif.encodeAnimated(w, h, pal(4), frames, delayCs = 5)
    val got = Gif.decodeFrames(anim)
    assert(got.exists { case (gw, gh, _, fs) =>
      gw == w && gh == h && fs.length == 4 &&
        fs.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq } })
    // the still-image view is frame 0
    assert(Gif.decodeIndexed(anim).exists(_._4.toSeq == frames.head.toSeq))
    // a single-frame still decodes as a 1-frame animation
    assert(Gif.decodeFrames(Gif.encodeIndexed(w, h, pal(4), frames.head))
      .exists(_._4.length == 1))
    // truncation mid-way through a later frame: None, not a prefix
    assert(Gif.decodeFrames(anim.dropRight(10)).isEmpty)
    // trailer excised: None (the stream never terminates cleanly)
    assert(Gif.decodeFrames(anim.dropRight(1)).isEmpty)
    // interlaced animation round-trips too
    val ianim = Gif.encodeAnimated(w, h, pal(4), frames, interlaced = true)
    assert(Gif.decodeFrames(ianim).exists(
      _._4.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq }))
  }

  test("animated allocation cap: total pixels across frames, not per canvas") {
    // LZW expands ~1000x, so a small stream declaring a 64M-pixel budget
    // across MANY frames must reject before allocating frame n+1 — the
    // per-canvas cap alone lets sw*sh*nFrames grow unbounded
    val (w, h) = (2048, 2048) // 4,194,304 px/frame: 16 frames sit exactly at 2^26
    val zero = new Array[Byte](w * h)
    val ok = Gif.encodeAnimated(w, h, pal(4), Seq.fill(16)(zero))
    assert(Gif.decodeFrames(ok).exists(_._4.length == 16))
    val bomb = Gif.encodeAnimated(w, h, pal(4), Seq.fill(17)(zero))
    assert(Gif.decodeFrames(bomb).isEmpty,
      "17 full-canvas frames cross the total-pixel cap and must reject")
  }

  test("decodeRgb maps through the palette") {
    val palette = pal(4)
    val idx = Array[Byte](0, 1, 2, 3)
    val (w, h, rgb) = Gif.decodeRgb(Gif.encodeIndexed(2, 2, palette, idx)).get
    assert((w, h) == (2, 2))
    for (k <- 0 until 4) {
      val c = palette(idx(k))
      assert((rgb(3 * k) & 0xff) == ((c >> 16) & 0xff))
      assert((rgb(3 * k + 1) & 0xff) == ((c >> 8) & 0xff))
      assert((rgb(3 * k + 2) & 0xff) == (c & 0xff))
    }
  }

  test("extension blocks are skipped; contract violations return None") {
    val palette = pal(4)
    val idx = Array.tabulate(48)(k => (k % 4).toByte)
    val good = Gif.encodeIndexed(8, 6, palette, idx)
    // splice a graphic-control extension after the color table
    val at = 13 + 3 * 4
    val ext = Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = good.take(at) ++ ext ++ good.drop(at)
    assert(Gif.decodeIndexed(spliced).nonEmpty, "extension must be skipped")
    // local color table flag set -> None (off-contract)
    val bad = good.clone()
    val imgFlags = at + 9 // image descriptor flags byte
    assert((bad(imgFlags - 9) & 0xff) == 0x2c, "descriptor offset wrong")
    bad(imgFlags) = 0x80.toByte
    assert(Gif.decodeIndexed(bad).isEmpty)
    // truncations never throw; header-region cuts are None
    for (n <- 0 until good.length by 5) {
      val r = Gif.decodeIndexed(good.take(n))
      if (n < good.length / 2) assert(r.isEmpty, s"truncated at $n")
    }
    // byte-flip fuzz: never throws
    val rnd = new scala.util.Random(5)
    for (_ <- 1 to 300) {
      val fz = good.clone()
      fz(rnd.nextInt(fz.length)) = (fz(rnd.nextInt(fz.length)) ^ (1 << rnd.nextInt(8))).toByte
      Gif.decodeIndexed(fz)
    }
  }

  // ---- full-fidelity animation + composition (round 12) ----

  private val Pal4 = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff)

  test("sub-rect frames with disposal + transparency round-trip through decodeAnim") {
    val frames = Seq(
      Gif.AnimFrame(0, 0, 8, 6, 5, 0, -1,
        Array.tabulate[Byte](48)(k => (k % 4).toByte)),
      Gif.AnimFrame(2, 1, 4, 3, 7, 2, 1,
        Array.tabulate[Byte](12)(k => ((k + 1) % 4).toByte)),
      Gif.AnimFrame(1, 2, 3, 3, 9, 3, 0,
        Array.tabulate[Byte](9)(k => ((k + 2) % 4).toByte)))
    val blob = Gif.encodeAnimatedComposed(8, 6, Pal4, frames)
    val Some((w, h, pal, got)) = Gif.decodeAnim(blob)
    assert((w, h) == (8, 6) && pal.toSeq == Pal4.toSeq)
    assert(got.length == 3)
    got.zip(frames).foreach { case (g, f) =>
      assert((g.x, g.y, g.w, g.h) == (f.x, f.y, f.w, f.h))
      assert((g.delayCs, g.disposal, g.transparentIndex) ==
        (f.delayCs, f.disposal, f.transparentIndex))
      assert(g.indices.toSeq == f.indices.toSeq)
    }
    // the strict full-canvas decodeFrames contract must NOT accept it
    assert(Gif.decodeFrames(blob).isEmpty)
  }

  test("composition: transparent index skips, disposal 2 clears, disposal 3 restores") {
    // frame 0: full canvas color 1 (keep); frame 1: rect color 2 with
    // disposal 2; frame 2: rect color 3 with disposal 3; frame 3: tiny
    // dot — shows what survived the two disposals
    val frames = Seq(
      Gif.AnimFrame(0, 0, 6, 4, 1, 0, -1, Array.fill[Byte](24)(1)),
      Gif.AnimFrame(1, 1, 3, 2, 1, 2, -1, Array.fill[Byte](6)(2)),
      Gif.AnimFrame(0, 0, 2, 2, 1, 3, -1, Array.fill[Byte](4)(3)),
      Gif.AnimFrame(5, 3, 1, 1, 1, 0, -1, Array.fill[Byte](1)(2)))
    val canvases = Gif.compose(6, 4, Pal4, frames)
    val red = 0xff000000 | Pal4(1)
    val green = 0xff000000 | Pal4(2)
    val blue = 0xff000000 | Pal4(3)
    assert(canvases(0).forall(_ == red))
    assert(canvases(1)(1 * 6 + 1) == green)
    // after frame 1's disposal-2, its rect is TRANSPARENT (erasing
    // frame 0's paint under it); frame 2 shows the hole (where its own
    // 2x2 rect does not cover it) + its own rect
    assert(canvases(2)(0) == blue)
    assert(canvases(2)(2 * 6 + 2) == 0, "disposal-2 hole")
    assert(canvases(2)(3 * 6 + 5) == red, "untouched corner keeps frame 0")
    // frame 2 had disposal 3: its paint must vanish at frame 3, while
    // the disposal-2 hole persists (restore-previous includes it)
    assert(canvases(3)(0) == red, "restore-to-previous undoes frame 2")
    assert(canvases(3)(2 * 6 + 2) == 0, "hole survives the restore")
    assert(canvases(3)(3 * 6 + 5) == green)
    // transparent-index pixels leave the canvas untouched
    val tFrames = Seq(
      Gif.AnimFrame(0, 0, 2, 1, 1, 0, -1, Array[Byte](1, 1)),
      Gif.AnimFrame(0, 0, 2, 1, 1, 0, 3, Array[Byte](3, 2)))
    val t = Gif.compose(2, 1, Pal4, tFrames)
    assert(t(1)(0) == red, "transparent index must not paint")
    assert(t(1)(1) == green)
  }

  test("hostile animation streams reject, never throw") {
    val good = Gif.encodeAnimatedComposed(8, 6, Pal4, Seq(
      Gif.AnimFrame(0, 0, 8, 6, 5, 0, -1,
        Array.tabulate[Byte](48)(k => (k % 4).toByte)),
      Gif.AnimFrame(2, 1, 4, 3, 7, 2, 1,
        Array.tabulate[Byte](12)(k => ((k + 1) % 4).toByte))))
    assert(Gif.decodeAnim(good).isDefined)
    for (n <- 0 until good.length by 3)
      Gif.decodeAnim(good.take(n)) // must not throw
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val fz = good.clone()
      fz(rnd.nextInt(fz.length)) =
        (fz(rnd.nextInt(fz.length)) ^ (1 << rnd.nextInt(8))).toByte
      Gif.decodeAnim(fz)
    }
    // a frame rect leaving the canvas rejects
    val off = good.clone()
    // (easier via encode-time require: out-of-canvas rect must throw)
    intercept[IllegalArgumentException] {
      Gif.encodeAnimatedComposed(8, 6, Pal4, Seq(
        Gif.AnimFrame(6, 4, 4, 4, 1, 0, -1, Array.fill[Byte](16)(0))))
    }
    off(0) = off(0) // keep the val used
  }
}
