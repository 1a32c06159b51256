package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class Mp3Spec extends AnyFunSuite {

  private def cat(parts: Array[Byte]*): Array[Byte] = parts.flatten.toArray

  test("walk replays constructed frame arithmetic exactly") {
    // MPEG1, CBR 128 kbps @ 44100, stereo, alternating padding
    val frames = (0 until 5).map(f =>
      Mp3.frame(version = 3, bitrateIdx = 8, srIdx = 0, padding = f % 2,
        channelMode = 0, seed = f))
    val i = Mp3.info(cat(frames: _*)).get
    assert(i.nFrames == 5)
    assert(i.sampleRate == 44100 && i.channels == 2)
    // frame length 144000*112/44100 = 365 (+pad); 112 kbps is index 8
    assert(i.totalBytes == frames.map(_.length).sum)
    assert(frames.head.length == 144000 * 112 / 44100)
    assert(i.durationMs == 5L * 1152 * 1000 / 44100)
    assert(i.brMinKbps == 112 && i.brMaxKbps == 112 && !i.isVbr)
  }

  test("MPEG2 uses 576-sample frames and its own bitrate table") {
    val b = cat((0 until 3).map(f =>
      Mp3.frame(version = 2, bitrateIdx = 4, srIdx = 1, padding = 0,
        channelMode = 3, seed = f)): _*)
    val i = Mp3.info(b).get
    assert(i.sampleRate == 24000 && i.channels == 1)
    assert(i.durationMs == 3L * 576 * 1000 / 24000)
    assert(i.brMinKbps == 32) // MPEG2 index 4
  }

  test("VBR envelope spans the per-frame bitrates") {
    val b = cat(Seq(1, 9, 4).map(idx =>
      Mp3.frame(3, idx, 0, 0, 1, seed = idx)): _*)
    val i = Mp3.info(b).get
    assert(i.isVbr && i.brMinKbps == 32 && i.brMaxKbps == 128)
  }

  test("ID3v2 prefix is skipped and sized; ID3v1 trailer accepted") {
    val f = Mp3.frame(3, 8, 0, 0, 0, seed = 1)
    val i = Mp3.info(cat(Mp3.id3v2(777), f, Mp3.id3v1)).get
    assert(i.id3v2Bytes == 787 && i.nFrames == 1)
    assert(i.totalBytes == 787 + f.length + 128)
  }

  test("hostile streams quarantine, never guess") {
    val f = Mp3.frame(3, 8, 0, 0, 0, seed = 1)
    assert(Mp3.info(null).isEmpty)
    assert(Mp3.info(Array.emptyByteArray).isEmpty)
    assert(Mp3.info(f.take(3)).isEmpty) // truncated header
    assert(Mp3.info(f.dropRight(1)).isEmpty) // frame overruns buffer
    assert(Mp3.info(cat(f, Array[Byte](0x55, 0x55, 0x55, 0x55))).isEmpty) // bad sync after frame
    val badSync = f.clone(); badSync(0) = 0x7F; assert(Mp3.info(badSync).isEmpty)
    val resVer = f.clone(); resVer(1) = (0xE0 | (1 << 3) | 2 | 1).toByte
    assert(Mp3.info(resVer).isEmpty) // reserved version
    val resLayer = f.clone(); resLayer(1) = (0xE0 | (3 << 3) | (2 << 1) | 1).toByte
    assert(Mp3.info(resLayer).isEmpty) // Layer II unsupported here
    val brFree = f.clone(); brFree(2) = 0x00; assert(Mp3.info(brFree).isEmpty)
    val brBad = f.clone(); brBad(2) = 0xF0.toByte; assert(Mp3.info(brBad).isEmpty)
    val srRes = f.clone(); srRes(2) = ((8 << 4) | (3 << 2)).toByte
    assert(Mp3.info(srRes).isEmpty) // reserved sample-rate index
    // mid-stream sample-rate switch = splice
    val other = Mp3.frame(3, 8, 1, 0, 0, seed = 2)
    assert(Mp3.info(cat(f, other)).isEmpty)
    // mid-stream channel-mode switch
    val mono = Mp3.frame(3, 8, 0, 0, 3, seed = 3)
    assert(Mp3.info(cat(f, mono)).isEmpty)
    // ID3v2 size overruns the buffer
    assert(Mp3.info(cat(Mp3.id3v2(777).take(30))).isEmpty)
    // non-syncsafe ID3v2 size byte
    val badTag = cat(Mp3.id3v2(10), f)
    badTag(6) = 0x80.toByte
    assert(Mp3.info(badTag).isEmpty)
    // ID3v1 marker not at exactly-128-from-end
    assert(Mp3.info(cat(f, Mp3.id3v1, Array[Byte](0))).isEmpty)
    // tags only, zero frames
    assert(Mp3.info(cat(Mp3.id3v2(5))).isEmpty)
  }
}
