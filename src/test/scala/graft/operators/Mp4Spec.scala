package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class Mp4Spec extends AnyFunSuite {

  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  private def movie(
      mvhdVersion: Int = 0, timescale: Long = 1000, duration: Long = 90500,
      audio: Boolean = true, text: Boolean = false,
      w: Int = 640, h: Int = 480,
      mdatLen: Int = 2000, largesize: Boolean = false): Array[Byte] = {
    var tracks = Seq(Mp4.trak(1, "vide", w, h, timescale, duration))
    if (audio) tracks :+= Mp4.trak(2, "soun", 0, 0, 48000, duration * 48)
    if (text) tracks :+= Mp4.trak(3, "text", 0, 0, timescale, duration)
    cat(
      Mp4.ftyp("isom", 512, Seq("isom", "mp41")),
      Mp4.box("moov", (Mp4.mvhd(mvhdVersion, timescale, duration) +: tracks): _*),
      Mp4.mdat(mdatLen, largesize, seed = 7))
  }

  test("walk replays constructed box arithmetic exactly") {
    val b = movie()
    val i = Mp4.info(b).get
    assert(i.brand == "isom")
    assert(i.timescale == 1000 && i.durationMs == 90500)
    assert(i.nTracks == 2 && i.nVideo == 1 && i.nAudio == 1)
    assert(i.width == 640 && i.height == 480)
    assert(i.mdatBytes == 2000)
    assert(i.totalBytes == b.length.toLong)
    // the size arithmetic the oracle relies on: ftyp 24, mvhd v0 108,
    // trak 173 each, mdat header 8
    assert(b.length == 24 + (8 + 108 + 2 * 173) + 8 + 2000)
  }

  test("mvhd v1 carries 64-bit duration; text track counted but unclassified") {
    val i = Mp4.info(movie(mvhdVersion = 1, duration = 123456L, text = true)).get
    assert(i.durationMs == 123456L * 1000 / 1000)
    assert(i.nTracks == 3 && i.nVideo == 1 && i.nAudio == 1)
  }

  test("largesize mdat (64-bit) and free boxes are walked") {
    val b = cat(
      Mp4.ftyp("mp42", 0, Seq("isom", "mp41")),
      Mp4.free(17),
      Mp4.box("moov", Mp4.mvhd(0, 600, 6000),
        Mp4.trak(1, "vide", 320, 240, 600, 6000)),
      Mp4.mdat(5000, largesize = true, seed = 3))
    val i = Mp4.info(b).get
    assert(i.brand == "mp42" && i.mdatBytes == 5000)
    assert(i.totalBytes == b.length.toLong)
    assert(i.durationMs == 10000)
  }

  test("tkhd v1 dimensions are read at the 64-bit offsets") {
    val b = cat(
      Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", Mp4.mvhd(0, 1000, 1000),
        Mp4.trak(1, "vide", 1920, 1080, 1000, 1000, tkhdVersion = 1)))
    val i = Mp4.info(b).get
    assert(i.width == 1920 && i.height == 1080)
  }

  test("dimensions come from the FIRST video track") {
    val b = cat(
      Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", Mp4.mvhd(0, 1000, 1000),
        Mp4.trak(1, "vide", 1280, 720, 1000, 1000),
        Mp4.trak(2, "vide", 320, 240, 1000, 1000)))
    val i = Mp4.info(b).get
    assert(i.nVideo == 2 && i.width == 1280 && i.height == 720)
  }

  test("hostile streams quarantine, never guess") {
    val ok = movie()
    assert(Mp4.info(null).isEmpty)
    assert(Mp4.info(Array[Byte](0, 0, 0, 9)).isEmpty) // truncated header
    assert(Mp4.info(ok.drop(24)).isEmpty) // ftyp not first
    // box size overruns the stream
    assert(Mp4.info(ok.dropRight(1)).isEmpty)
    // size < 8 and not 0/1
    val tiny = ok.clone(); tiny(3) = 4
    assert(Mp4.info(tiny).isEmpty)
    // duplicated mvhd
    assert(Mp4.info(cat(
      Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", Mp4.mvhd(0, 1000, 1), Mp4.mvhd(0, 1000, 1)))).isEmpty)
    // moov without mvhd
    assert(Mp4.info(cat(
      Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", Mp4.trak(1, "vide", 1, 1, 1, 1)))).isEmpty)
    // trak without hdlr
    assert(Mp4.info(cat(
      Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", Mp4.mvhd(0, 1000, 1),
        Mp4.box("trak", Mp4.tkhd(0, 1, 1, 1))))).isEmpty)
    // reserved mvhd version
    val badVer = cat(
      Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", Mp4.mvhd(0, 1000, 1),
        Mp4.trak(1, "vide", 1, 1, 1, 1)))
    badVer(24 + 8 + 8) = 5 // mvhd version byte
    assert(Mp4.info(badVer).isEmpty)
    // zero timescale
    assert(Mp4.info(cat(
      Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", Mp4.mvhd(0, 0, 1),
        Mp4.trak(1, "vide", 1, 1, 1, 1)))).isEmpty)
  }

  test("size-zero (to end of file) is legal only top-level") {
    val moov = Mp4.box("moov", Mp4.mvhd(0, 1000, 2500),
      Mp4.trak(1, "vide", 64, 64, 1000, 2500))
    val tail = Mp4.mdat(100, largesize = false, seed = 1).clone()
    tail(0) = 0; tail(1) = 0; tail(2) = 0; tail(3) = 0
    val i = Mp4.info(cat(Mp4.ftyp("isom", 0, Seq("isom", "mp41")), moov, tail)).get
    assert(i.mdatBytes == 100 && i.durationMs == 2500)
    // same trick inside moov must quarantine
    val inner = Mp4.mvhd(0, 1000, 1).clone()
    inner(0) = 0; inner(1) = 0; inner(2) = 0; inner(3) = 0
    assert(Mp4.info(cat(Mp4.ftyp("isom", 0, Seq("isom", "mp41")),
      Mp4.box("moov", inner ++ Mp4.trak(1, "vide", 1, 1, 1, 1)))).isEmpty)
  }
}
