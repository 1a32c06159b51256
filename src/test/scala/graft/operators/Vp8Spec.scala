package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8 lossy key frames: the fixture encoder emits DC-only residuals at
  * quantizer 0 where reconstruction is an exact integer identity, so
  * decode must replay the target planes BIT-FOR-BIT; plus the hostile
  * discipline (truncation/flip sweeps, named rejections). Real-encoder
  * interop (libwebp-produced files incl. loop filter and probability
  * updates) lives in Vp8InteropSpec over checked-in fixtures.
  */
class Vp8Spec extends AnyFunSuite {

  test("bool coder roundtrip: deterministic bit/prob schedule") {
    val probs = Array.tabulate(4000)(k => 1 + (k * 37 + (k * k) % 91) % 254)
    val bits = Array.tabulate(4000)(k => (k * 7 + k / 13 + (k % 5) * (k % 3)) % 2)
    val be = new Vp8.BoolEncoder
    probs.indices.foreach(k => be.bool(probs(k), bits(k)))
    val blob = be.finish()
    val bd = new Vp8.BoolDecoder(blob, 0, blob.length)
    probs.indices.foreach { k =>
      assert(bd.bool(probs(k)) == bits(k), s"bit $k")
    }
  }

  test("bool coder roundtrip: literals and signed literals") {
    val be = new Vp8.BoolEncoder
    (0 until 300).foreach { k =>
      be.literal(1 + k % 8, k % (1 << (1 + k % 8)))
      be.signedLiteral(4, (k % 31) - 15)
    }
    val blob = be.finish()
    val bd = new Vp8.BoolDecoder(blob, 0, blob.length)
    (0 until 300).foreach { k =>
      assert(bd.literal(1 + k % 8) == k % (1 << (1 + k % 8)), s"lit $k")
      assert(bd.signedLiteral(4) == (k % 31) - 15, s"slit $k")
    }
  }

  private def tY(id: Long)(mx: Int, my: Int): Int =
    ((id * 7 + 29 * mx + 31 * my) % 256).toInt
  private def tU(id: Long)(mx: Int, my: Int): Int =
    ((id * 11 + 13 * mx + 17 * my) % 256).toInt
  private def tV(id: Long)(mx: Int, my: Int): Int =
    ((id * 5 + 19 * mx + 23 * my) % 256).toInt

  private def checkExact(id: Long, w: Int, h: Int, parts: Int = 1,
      seg: Boolean = false): Unit = {
    val blob = Vp8.encode(w, h, tY(id), tU(id), tV(id),
      nTokenParts = parts, withSegmentation = seg)
    val got = Vp8.decode(blob)
    assert(got.isRight, s"id=$id w=$w h=$h: $got")
    val yuv = got.toOption.get
    assert((yuv.w, yuv.h) == (w, h))
    var py = 0
    while (py < h) {
      var px = 0
      while (px < w) {
        val want = tY(id)(px / 16, py / 16)
        val gotv = yuv.y(py * w + px) & 0xff
        assert(gotv == want, s"id=$id y($px,$py): $gotv != $want")
        px += 1
      }
      py += 1
    }
    val uvW = yuv.uvW; val uvH = yuv.uvH
    py = 0
    while (py < uvH) {
      var px = 0
      while (px < uvW) {
        assert((yuv.u(py * uvW + px) & 0xff) == tU(id)(px / 8, py / 8),
          s"id=$id u($px,$py)")
        assert((yuv.v(py * uvW + px) & 0xff) == tV(id)(px / 8, py / 8),
          s"id=$id v($px,$py)")
        px += 1
      }
      py += 1
    }
  }

  test("pixel replay: many shapes, incl. non-MB-multiple crops") {
    for (id <- 0L until 6L) {
      val w = 16 + (id % 4).toInt * 16 + (id % 5).toInt // ragged widths
      val h = 16 + (id % 3).toInt * 16 + (id % 7).toInt
      checkExact(id, w, h)
    }
  }

  test("pixel replay: token partitions 2/4/8 interleave rows correctly") {
    Seq(2, 4, 8).foreach(p => checkExact(100 + p, 67, 83, parts = p))
  }

  test("pixel replay: segment map decodes (all-zero feature data)") {
    checkExact(55, 50, 34, seg = true)
  }

  test("pixel replay: single-MB and single-row extremes") {
    checkExact(7, 16, 16)
    checkExact(8, 5, 3)
    checkExact(9, 130, 16)
  }

  test("loop filter on: deterministic, dimension-preserving, off-fixture") {
    val blob = Vp8.encode(48, 48, tY(3), tU(3), tV(3), filterLevel = 26)
    val a = Vp8.decode(blob)
    val b = Vp8.decode(blob.clone())
    assert(a.isRight && b.isRight)
    assert(a.toOption.get.y.toSeq == b.toOption.get.y.toSeq)
    // filtering must only touch pixels near edges by bounded amounts —
    // on a constant-per-MB image the MB interiors stay exact
    val yuv = a.toOption.get
    val mid = (16 * 8 + 8) // center of MB (0,0)
    assert((yuv.y(8 * 48 + 8) & 0xff) == tY(3)(0, 0))
    assert(mid > 0)
  }

  test("simple filter path runs") {
    val blob = Vp8.encode(32, 32, tY(4), tU(4), tV(4),
      filterLevel = 20, simpleFilter = true)
    assert(Vp8.decode(blob).isRight)
  }

  /** Hand-assemble a VP8X container around a raw VP8 chunk payload. */
  private def vp8x(vp8Chunk: Array[Byte], flags: Int,
      extraChunks: Seq[(String, Array[Byte])] = Seq.empty): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def chunk(cc: String, body: Array[Byte]): Unit = {
      out.write(cc.getBytes("US-ASCII")); le32(body.length)
      out.write(body, 0, body.length)
      if ((body.length & 1) == 1) out.write(0)
    }
    out.write("RIFF".getBytes("US-ASCII")); le32(0) // size patched below
    out.write("WEBP".getBytes("US-ASCII"))
    val x = new Array[Byte](10)
    x(0) = flags.toByte // LE flag word, low byte carries the known bits
    chunk("VP8X", x)
    extraChunks.foreach { case (cc, b) => chunk(cc, b) }
    chunk("VP8 ", vp8Chunk)
    val bytes = out.toByteArray
    val size = bytes.length - 8
    bytes(4) = (size & 0xff).toByte; bytes(5) = ((size >> 8) & 0xff).toByte
    bytes(6) = ((size >> 16) & 0xff).toByte; bytes(7) = ((size >> 24) & 0xff).toByte
    bytes
  }

  test("VP8X EXIF chunk feeds the JPEG tier's TIFF walk") {
    val riff = Vp8.encode(16, 16, tY(2), tU(2), tV(2))
    val chunkLen = (riff(16) & 0xff) | ((riff(17) & 0xff) << 8) |
      ((riff(18) & 0xff) << 16)
    val vp8Chunk = java.util.Arrays.copyOfRange(riff, 20, 20 + chunkLen)
    // WebP EXIF chunk = the APP1 payload (Exif\0\0 + TIFF) without the
    // JPEG marker framing
    val tiff = Exif.app1Exif(6, "graftcam", "2024:02:03 04:05:06",
      littleEndian = true).drop(4)
    val blob = vp8x(vp8Chunk, flags = 0x08, Seq(("EXIF", tiff)))
    assert(Vp8.decode(blob).isRight)
    val meta = Vp8.metadataChunk(blob, "EXIF").flatMap(Exif.exifFromTiff)
    assert(meta.isDefined)
    assert(meta.get.orientation == 6)
    assert(meta.get.make == "graftcam")
    assert(meta.get.datetime == "2024:02:03 04:05:06")
    assert(Vp8.metadataChunk(blob, "XMP ").isEmpty)
    assert(Vp8.metadataChunk(riff, "EXIF").isEmpty) // plain container
  }

  test("named rejections: container, start code, interframe") {
    assert(Vp8.decode("junk".getBytes("US-ASCII")) ==
      Left(Vp8.Rejected("bad_container")))
    val good = Vp8.encode(16, 16, tY(1), tU(1), tV(1))
    val inter = good.clone()
    inter(20) = (inter(20) | 1).toByte // frame type bit -> interframe
    assert(Vp8.decode(inter) == Left(Vp8.Rejected("not_a_keyframe")))
    val sc = good.clone()
    sc(23) = 0x00 // start code byte
    assert(Vp8.decode(sc) == Left(Vp8.Rejected("bad_start_code")))
  }

  test("VP8X stills: metadata-bearing container unwraps; alpha/anim reject") {
    val riff = Vp8.encode(33, 21, tY(9), tU(9), tV(9))
    val plain = Vp8.decode(riff).toOption.get
    // extract the raw VP8 chunk payload from the plain container
    val chunkLen = (riff(16) & 0xff) | ((riff(17) & 0xff) << 8) |
      ((riff(18) & 0xff) << 16)
    val vp8Chunk = java.util.Arrays.copyOfRange(riff, 20, 20 + chunkLen)
    // EXIF flag + an EXIF chunk before the image: decodes identically
    val exif = Array.tabulate[Byte](23)(k => (k * 3).toByte) // odd -> pad path
    val withMeta = vp8x(vp8Chunk, flags = 0x08, Seq(("EXIF", exif)))
    val got = Vp8.decode(withMeta)
    assert(got.isRight, s"$got")
    assert(got.toOption.get.y.toSeq == plain.y.toSeq)
    assert(got.toOption.get.u.toSeq == plain.u.toSeq)
    // animation rejects by name; hostile ALPH chunks quarantine
    assert(Vp8.decode(vp8x(vp8Chunk, flags = 0x02)) ==
      Left(Vp8.Rejected("vp8x_animation_unsupported")))
    val badAlph = Vp8.decode(vp8x(vp8Chunk, flags = 0x10,
      Seq(("ALPH", Array[Byte](1, 2, 3))))) // lossless-coded garbage
    assert(badAlph.isLeft, s"$badAlph")
    assert(Vp8.decode(vp8x(vp8Chunk, flags = 0x10,
      Seq(("ALPH", Array[Byte](2))))) == // reserved compression method
      Left(Vp8.Rejected("bad_alpha_compression")))
    // raw (uncompressed, unfiltered) ALPH decodes to its plane
    val rawAlpha = Array.tabulate[Byte](33 * 21)(k => (k * 7).toByte)
    val withAlpha = Vp8.decode(vp8x(vp8Chunk, flags = 0x10,
      Seq(("ALPH", Array[Byte](0) ++ rawAlpha))))
    assert(withAlpha.isRight, s"$withAlpha")
    assert(withAlpha.toOption.get.alpha.get.toSeq == rawAlpha.toSeq)
    assert(withAlpha.toOption.get.y.toSeq == plain.y.toSeq)
    // no image chunk at all
    val noImg = vp8x(Array.empty[Byte], flags = 0)
    val trimmed = java.util.Arrays.copyOf(noImg, noImg.length - 8) // drop VP8 hdr
    trimmed(4) = ((trimmed.length - 8) & 0xff).toByte
    assert(Vp8.decode(trimmed) == Left(Vp8.Rejected("vp8x_no_image_chunk")))
  }

  test("truncation sweep never crashes") {
    val good = Vp8.encode(35, 29, tY(6), tU(6), tV(6))
    (0 until good.length by 2).foreach { cut =>
      Vp8.decode(java.util.Arrays.copyOf(good, cut)) match {
        case Left(_) => ()
        case Right(yuv) => assert(yuv.y.length == yuv.w * yuv.h)
      }
    }
  }

  test("bit-flip sweep never crashes") {
    val good = Vp8.encode(33, 21, tY(2), tU(2), tV(2))
    (0 until good.length).foreach { i =>
      val c = good.clone()
      c(i) = (c(i) ^ 0x40).toByte
      Vp8.decode(c) // must not throw
      ()
    }
  }

  test("transforms: IWHT and IDCT integer identities the encoder relies on") {
    // DC-only Y2 of 64r distributes 8r to every subblock DC
    for (r <- -200 to 200 by 7) {
      val y2 = new Array[Int](16); y2(0) = 64 * r
      assert(Vp8.inverseWht(y2).forall(_ == 8 * r), s"r=$r")
      val blk = new Array[Int](16); blk(0) = 8 * r
      assert(Vp8.idct4x4(blk).forall(_ == r), s"idct r=$r")
    }
  }
}
