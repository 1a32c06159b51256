package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG-in-AVI: round-trip through the real container + codec
  * composition, plus the hostile-stream fuzz the reject-don't-guess
  * contract requires (the Warc/Gif pattern: corrupt input quarantines,
  * never guesses). */
class MjpegAviSpec extends AnyFunSuite {

  /** Block-flat frames survive the lossy JPEG pipeline exactly. */
  private def flatFrames(w: Int, h: Int, n: Int, id: Long): Seq[Array[Byte]] =
    (0 until n).map(f => Array.tabulate(w * h) { k =>
      val bx = (k % w) / 8; val by = (k / w) / 8
      ((id + 5L * bx + 9L * by + 11L * f) % 256).toByte
    })

  test("multi-frame round-trip is pixel-exact on block-flat fixtures") {
    for (id <- Seq(1L, 7L, 20L)) {
      val (w, h, n) = (8 * (1 + (id % 2).toInt), 8 * (1 + (id % 3).toInt),
        1 + (id % 4).toInt)
      val frames = flatFrames(w, h, n, id)
      val avi = Multimodal.aviMjpeg(w, h, frames)
      val got = Multimodal.aviMjpegFrames(avi)
      assert(got.exists { case (gw, gh, fs) =>
        gw == w && gh == h && fs.length == n &&
          fs.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq }
      }, s"id=$id")
    }
  }

  test("contract violations return None, never garbage") {
    val frames = flatFrames(16, 8, 3, 5L)
    val good = Multimodal.aviMjpeg(16, 8, frames)
    assert(Multimodal.aviMjpegFrames(good).isDefined)

    // the gray decoder must refuse an MJPEG stream and vice versa
    assert(Multimodal.aviGrayFrames(good).isEmpty)
    val gray = Multimodal.aviGray(16, 8, frames)
    assert(Multimodal.aviMjpegFrames(gray).isEmpty)

    // corrupt a byte inside the first JPEG's entropy data: the frame
    // fails to decode (or decodes off-canvas) and the CLIP rejects
    val movi = good.indexOfSlice("movi".getBytes("US-ASCII"))
    val dc = good.indexOfSlice("00dc".getBytes("US-ASCII"), movi)
    val corrupt = good.clone()
    // flip bytes through the frame body until decode fails (some flips
    // land in skippable segments); at least one must reject the clip
    val rejected = (20 until 80).exists { off =>
      val c = good.clone()
      c(dc + 8 + off) = (c(dc + 8 + off) ^ 0xff).toByte
      Multimodal.aviMjpegFrames(c).isEmpty
    }
    assert(rejected, "no entropy corruption rejected the clip")

    // truncation mid-frame
    assert(Multimodal.aviMjpegFrames(good.take(good.length - 10)).isEmpty)
    // header frame count lies
    val avih = good.indexOfSlice("avih".getBytes("US-ASCII"))
    val lied = good.clone()
    lied(avih + 8 + 16) = 9 // declaredFrames = 9, actual 3
    assert(Multimodal.aviMjpegFrames(lied).isEmpty)
    // not an AVI
    assert(Multimodal.aviMjpegFrames("RIFFjunk".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.aviMjpegFrames(Array.emptyByteArray).isEmpty)
    assert(corrupt.length == good.length) // clone untouched (sanity)
  }

  test("a frame whose JPEG dims disagree with the canvas rejects the clip") {
    // build a 16x8 clip, then splice in a frame encoded at 8x8
    val frames = flatFrames(16, 8, 2, 3L)
    val good = Multimodal.aviMjpeg(16, 8, frames)
    val small = Jpeg.encodeGray(8, 8, flatFrames(8, 8, 1, 3L).head)
    val dc = good.indexOfSlice("00dc".getBytes("US-ASCII"))
    val len = (good(dc + 4) & 0xff) | ((good(dc + 5) & 0xff) << 8) |
      ((good(dc + 6) & 0xff) << 16) | ((good(dc + 7) & 0xff) << 24)
    // replace the first frame chunk wholesale (relink lengths by
    // rebuilding the byte stream around it)
    val pad = len % 2
    val before = good.take(dc)
    val after = good.drop(dc + 8 + len + pad)
    def le32b(v: Int) = Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val newChunk = "00dc".getBytes("US-ASCII") ++ le32b(small.length) ++ small ++
      (if (small.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray)
    val delta = newChunk.length - (8 + len + pad)
    val spliced = before ++ newChunk ++ after
    // fix the two enclosing RIFF/LIST sizes (RIFF at 4; movi LIST size)
    def fixLen(buf: Array[Byte], at: Int): Unit = {
      val old = (buf(at) & 0xff) | ((buf(at + 1) & 0xff) << 8) |
        ((buf(at + 2) & 0xff) << 16) | ((buf(at + 3) & 0xff) << 24)
      val nw = le32b(old + delta)
      System.arraycopy(nw, 0, buf, at, 4)
    }
    fixLen(spliced, 4)
    val moviList = spliced.indexOfSlice("movi".getBytes("US-ASCII")) - 8
    fixLen(spliced, moviList + 4)
    assert(Multimodal.aviMjpegFrames(spliced).isEmpty,
      "off-canvas frame must reject the clip")
  }
}
