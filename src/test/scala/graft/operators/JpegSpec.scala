package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JpegSpec extends AnyFunSuite {

  test("block-flat planes round-trip EXACTLY through the lossy pipeline") {
    // flat 8x8 blocks -> DC-only spectrum; DC quant step 8 makes the
    // quantizer lossless on integers (F00 = 8*s) — the q93 oracle's
    // entire premise, so it is asserted here, not assumed
    for (id <- Seq(0L, 7L, 100L, 255L)) {
      val w = 16; val h = 24
      val px = Array.tabulate(w * h) { k =>
        val bx = (k % w) / 8; val by = (k / w) / 8
        ((id + 5L * bx + 9L * by) % 256).toByte
      }
      val jpg = Jpeg.encodeGray(w, h, px)
      // a real interchange stream: SOI + EOI framing
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8)
      assert((jpg(jpg.length - 2) & 0xff) == 0xff &&
        (jpg(jpg.length - 1) & 0xff) == 0xd9)
      val got = Jpeg.decodeGray(jpg)
      assert(got.exists { case (gw, gh, gpx) =>
        gw == w && gh == h && gpx.toSeq == px.toSeq }, s"id=$id")
    }
  }

  test("arbitrary planes round-trip within quantization tolerance") {
    // non-flat content exercises the AC path: runs, ZRL, EOB, magnitude
    // bits of both signs, multi-block DC prediction — and the error must
    // stay within what AC quant step 16 can introduce
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 20) {
      val w = 9 + rnd.nextInt(16) // deliberately non-block-aligned
      val h = 9 + rnd.nextInt(16)
      val px = Array.tabulate(w * h) { k =>
        val x = k % w; val y = k / w
        // smooth gradient + mild seeded noise: realistic spectra without
        // saturating the 10-bit AC category ceiling
        ((8 * x + 5 * y + rnd.nextInt(32)) % 256).toByte
      }
      val jpg = Jpeg.encodeGray(w, h, px)
      val (gw, gh, gpx) = Jpeg.decodeGray(jpg).get
      assert(gw == w && gh == h)
      val maxErr = px.indices.map(k => math.abs((px(k) & 0xff) - (gpx(k) & 0xff))).max
      assert(maxErr <= 24, s"trial $trial: max pixel error $maxErr")
    }
  }

  test("FF00 byte stuffing is produced and unstuffed correctly") {
    // Random smooth content rarely emits a 0xFF entropy byte under the
    // low-valued canonical tables, so FORCE it: blocks alternating flat
    // 0 / flat 255 give DC diffs of ±255 — category 8 with magnitude
    // bits 11111111 — and each 20-bit block rotates the bit phase, so
    // across a few widths one run of eight 1s lands byte-aligned,
    // becomes FF, and must be stuffed (and unstuffed, since the flat
    // blocks also round-trip exactly).
    def sosEnd(jpg: Array[Byte]): Int = {
      var i = 2
      while (true) {
        val m = jpg(i + 1) & 0xff
        val len = ((jpg(i + 2) & 0xff) << 8) | (jpg(i + 3) & 0xff)
        if (m == 0xda) return i + 2 + len else i += 2 + len
      }
      -1
    }
    var sawStuffing = false
    for ((w, h) <- Seq((16, 16), (24, 16), (32, 32), (40, 8), (48, 16))) {
      val px = Array.tabulate(w * h) { k =>
        val bx = (k % w) / 8; val by = (k / w) / 8
        (if ((bx + by) % 2 == 0) 0 else 255).toByte
      }
      val jpg = Jpeg.encodeGray(w, h, px)
      (sosEnd(jpg) until jpg.length - 2).foreach { j =>
        if ((jpg(j) & 0xff) == 0xff && (jpg(j + 1) & 0xff) == 0x00)
          sawStuffing = true
      }
      // flat blocks: the stuffed stream still round-trips EXACTLY
      assert(Jpeg.decodeGray(jpg).exists(_._3.toSeq == px.toSeq), s"${w}x$h")
    }
    assert(sawStuffing,
      "no FF00 stuffing across the forcing fixtures — encoder never " +
        "emitted a 0xFF entropy byte, so the unstuffing path is untested")
  }

  test("restart markers: DRI intervals round-trip, hostile variants rejected") {
    val w = 40; val h = 24 // 5x3 = 15 MCUs
    val px = Array.tabulate(w * h) { k =>
      val bx = (k % w) / 8; val by = (k / w) / 8
      ((3 + 5L * bx + 9L * by) % 256).toByte
    }
    def rstPositions(jpg: Array[Byte]): Seq[Int] =
      (2 until jpg.length - 1).filter(i => (jpg(i) & 0xff) == 0xff &&
        (jpg(i + 1) & 0xff) >= 0xd0 && (jpg(i + 1) & 0xff) <= 0xd7)
    // intervals that divide 15, don't divide it, force index cycling
    // (ri=1 -> 14 markers wraps RST0..RST7 twice), and exceed the MCU
    // count (DRI present, zero markers)
    for (ri <- Seq(1, 2, 3, 5, 7, 100)) {
      val jpg = Jpeg.encodeGray(w, h, px, restartInterval = ri)
      val nMarkers = rstPositions(jpg).size
      assert(nMarkers == (15 - 1) / ri,
        s"ri=$ri: expected ${(15 - 1) / ri} restart markers, found $nMarkers")
      assert(Jpeg.decodeGray(jpg).exists { case (gw, gh, gpx) =>
        gw == w && gh == h && gpx.toSeq == px.toSeq }, s"ri=$ri")
    }
    // ri=0 stays the legacy stream: no DRI, no markers, byte-identical
    assert(Jpeg.encodeGray(w, h, px).toSeq ==
      Jpeg.encodeGray(w, h, px, restartInterval = 0).toSeq)
    assert(rstPositions(Jpeg.encodeGray(w, h, px)).isEmpty)

    // AC-heavy noise content still round-trips within quant tolerance
    // across a restart boundary
    val rnd = new scala.util.Random(7)
    val noisy = Array.tabulate(w * h) { k =>
      ((8 * (k % w) + 5 * (k / w) + rnd.nextInt(32)) % 256).toByte
    }
    val njpg = Jpeg.encodeGray(w, h, noisy, restartInterval = 4)
    val (_, _, npx) = Jpeg.decodeGray(njpg).get
    assert(noisy.indices.map(k =>
      math.abs((noisy(k) & 0xff) - (npx(k) & 0xff))).max <= 24)

    // hostile variants, all rejected rather than resynced into garbage:
    val good = Jpeg.encodeGray(w, h, px, restartInterval = 2)
    val p0 = rstPositions(good).head
    // (a) wrong cycle index — RST0 flipped to RST5
    val wrongIdx = good.clone(); wrongIdx(p0 + 1) = 0xd5.toByte
    assert(Jpeg.decodeGray(wrongIdx).isEmpty)
    // (b) marker excised — entropy bytes from the next segment read as
    // a continuation and the cycle check or block structure breaks
    val excised = good.take(p0) ++ good.drop(p0 + 2)
    assert(Jpeg.decodeGray(excised).isEmpty)
    // (c) DRI promises an interval the stream never delivers
    val plain = Jpeg.encodeGray(w, h, px) // no markers
    val sosLess = plain.take(2)
    val dri = Array(0xff, 0xdd, 0x00, 0x04, 0x00, 0x02).map(_.toByte)
    val injected = sosLess ++ dri ++ plain.drop(2)
    assert(Jpeg.decodeGray(injected).isEmpty)
    // (d) truncation INSIDE a later restart segment
    assert(Jpeg.decodeGray(good.take(good.length - 6)).isEmpty)
    // (e) malformed DRI length
    val badDri = good.clone()
    val driAt = (2 until badDri.length - 1).find(i =>
      (badDri(i) & 0xff) == 0xff && (badDri(i + 1) & 0xff) == 0xdd).get
    badDri(driAt + 3) = 0x05.toByte // len 5: body != 2 bytes
    assert(Jpeg.decodeGray(badDri).isEmpty)
  }

  test("out-of-contract and hostile streams are rejected, never mis-decoded") {
    val good = Jpeg.encodeGray(16, 16, Array.tabulate(256)(_.toByte))
    assert(Jpeg.decodeGray(good).isDefined)
    // truncated entropy data
    assert(Jpeg.decodeGray(good.take(good.length - 8)).isEmpty)
    // truncated mid-segment
    assert(Jpeg.decodeGray(good.take(20)).isEmpty)
    // not a JPEG at all
    assert(Jpeg.decodeGray(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Jpeg.decodeGray(Multimodal.pngGray(4, 4,
      Array.tabulate(16)(_.toByte))).isEmpty)
    // progressive (SOF2) is out of contract: flip the SOF marker
    val prog = good.clone()
    val sof = (2 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    assert(Jpeg.decodeGray(prog).isEmpty)
    // hostile dims: CRC-free format, so just rewrite SOF h/w to huge
    val bomb = good.clone()
    bomb(sof + 5) = 0xff.toByte; bomb(sof + 6) = 0xff.toByte // h = 65535
    bomb(sof + 7) = 0xff.toByte; bomb(sof + 8) = 0xff.toByte // w = 65535
    assert(Jpeg.decodeGray(bomb).isEmpty) // 4G px > the 64M px cap
  }
}
