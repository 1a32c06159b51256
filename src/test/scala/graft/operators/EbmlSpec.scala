package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** EBML/Matroska census: constructed spec-faithful containers
  * (no mkvinfo/ffprobe on-system — the HEIF-census playbook's
  * construct-and-cross-check fallback) + hostile mutations into each
  * named fate. */
class EbmlSpec extends AnyFunSuite {

  test("webm and matroska fixtures census exactly") {
    for {
      webm <- Seq(true, false)
      withAudio <- Seq(false, true)
    } {
      val blob = Ebml.write(webm, w = 640, h = 360, withAudio,
        nClusters = 3, blocksPerCluster = 4, payloadLen = 50, seed = 9)
      val info = Ebml.census(blob).toOption.get
      assert(info.docType == (if (webm) "webm" else "matroska"))
      assert(info.docTypeVersion == 4)
      assert(info.timestampScale == 1000000L)
      assert(info.durationMs == 5000)
      assert(info.muxingApp == "graft")
      assert(info.tracks.length == (if (withAudio) 2 else 1))
      val v = info.tracks.head
      assert(v.trackType == 1 && v.width == 640 && v.height == 360)
      assert(v.codecId == (if (webm) "V_VP8" else "V_MPEG4/ISO/AVC"))
      if (withAudio) {
        val a = info.tracks(1)
        assert(a.trackType == 2 && a.samplingHz == 48000 && a.channels == 2)
        assert(a.codecId == (if (webm) "A_OPUS" else "A_AAC"))
      }
      assert(info.nClusters == 3)
      assert(info.nBlocks == 12)
      assert(info.blockBytes == 12L * 50)
      assert(info.sampleFate ==
        (if (webm) "v_vp8_samples_unsupported"
         else "v_mpeg4_iso_avc_samples_unsupported"))
    }
  }

  test("unknown-size segment (streaming-muxer shape) censuses the same") {
    val a = Ebml.write(webm = true, 320, 240, withAudio = true,
      nClusters = 2, blocksPerCluster = 3, payloadLen = 20, seed = 4)
    val b = Ebml.write(webm = true, 320, 240, withAudio = true,
      nClusters = 2, blocksPerCluster = 3, payloadLen = 20, seed = 4,
      unknownSizeSegment = true)
    assert(Ebml.census(a) == Ebml.census(b))
  }

  test("hostile containers quarantine with named reasons") {
    val good = Ebml.write(webm = true, 320, 240, withAudio = false,
      nClusters = 2, blocksPerCluster = 2, payloadLen = 30, seed = 7)
    assert(Ebml.census("RIFFxxxxWEBP".getBytes) == Left("not_ebml"))
    assert(Ebml.census(Array.emptyByteArray) == Left("truncated_ebml"))
    // truncated cluster: cut mid-payload
    assert(Ebml.census(java.util.Arrays.copyOf(good, good.length - 10))
      match {
        case Left(r) => r == "element_overruns_parent" ||
          r == "truncated_ebml"
        case _ => false
      })
    // a size varint whose marker byte is zero
    val zeroVarint = good.clone()
    // EBML header size byte follows the 4-byte magic
    zeroVarint(4) = 0
    assert(Ebml.census(zeroVarint) == Left("bad_varint"))
    // an element lying past EOF: inflate the Segment's declared size
    // (2-byte varint -> 0x3F00, far past the body, NOT the all-ones
    // unknown-size pattern)
    val seg = indexOfId(good, Array(0x18, 0x53, 0x80, 0x67))
    val lie = good.clone()
    lie(seg + 4) = 0x7F.toByte; lie(seg + 5) = 0x00
    assert(Ebml.census(lie) == Left("element_overruns_parent"))
    // unknown size on a non-cluster element (Info)
    val idx = indexOfId(good, Array(0x15, 0x49, 0xA9, 0x66))
    val unk = good.clone()
    unk(idx + 4) = 0xFF.toByte // length-1 all-ones = unknown size
    assert(Ebml.census(unk) == Left("unknown_size_unsupported"))
    // doctype that is neither matroska nor webm
    val other = good.clone()
    val dt = indexOfId(other, Array(0x42, 0x82))
    other(dt + 3) = 'x'.toByte
    assert(Ebml.census(other) == Left("doctype_unsupported"))
  }

  private def indexOfId(b: Array[Byte], id: Array[Int]): Int = {
    var i = 0
    while (i + id.length <= b.length) {
      var k = 0
      while (k < id.length && (b(i + k) & 0xff) == id(k)) k += 1
      if (k == id.length) return i
      i += 1
    }
    fail(s"id not found")
  }
}
