package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Ogg page walk + Vorbis/Opus comment census: constructed
  * spec-faithful pages (real page CRC) + hostile mutations. No system
  * ogg tooling exists here — construct-and-cross-check. */
class OggSpec extends AnyFunSuite {

  test("opus and vorbis fixtures census exactly") {
    for (opus <- Seq(true, false)) {
      val blob = Ogg.write(opus, serial = 0x1234, channels = 2,
        sampleRate = if (opus) 48000 else 44100,
        comments = Seq("TITLE" -> "t", "ARTIST" -> "a", "DATE" -> "2020"),
        nAudioPages = 4, packetsPerPage = 3, payloadLen = 120, seed = 5)
      val info = Ogg.census(blob).toOption.get
      assert(info.nPages == 6)
      assert(info.streams.length == 1)
      val s = info.streams.head
      assert(s.codec == (if (opus) "opus" else "vorbis"))
      assert(s.channels == 2)
      assert(s.sampleRate == (if (opus) 48000 else 44100))
      assert(s.nPages == 6)
      assert(s.nPackets == 2 + 4 * 3)
      assert(s.vendor == "graft")
      assert(s.nComments == 3)
      assert(s.lastGranule == 4L * 960 * 3)
      // opus granules tick at 48kHz minus pre-skip (312 in the writer)
      if (opus) assert(s.durationMs == (4 * 960 * 3 - 312) * 1000L / 48000)
      else assert(s.durationMs == 4L * 960 * 3 * 1000 / 44100)
      assert(s.sampleFate ==
        (if (opus) "opus_samples_unsupported"
         else "vorbis_samples_unsupported"))
    }
  }

  test("multiplexed and chained streams both walk") {
    val a = Ogg.write(opus = true, serial = 1, channels = 1,
      sampleRate = 48000, comments = Seq("X" -> "1"), nAudioPages = 2,
      packetsPerPage = 2, payloadLen = 40, seed = 1)
    val b = Ogg.write(opus = false, serial = 2, channels = 2,
      sampleRate = 22050, comments = Nil, nAudioPages = 2,
      packetsPerPage = 1, payloadLen = 60, seed = 2)
    // chained: full stream A then full stream B (serials differ)
    val chained = Ogg.census(a ++ b).toOption.get
    assert(chained.streams.map(_.codec) == Seq("opus", "vorbis"))
    // multiplexed: interleave pages (both BOS pages must come first)
    def pages(x: Array[Byte]): Seq[Array[Byte]] = {
      var i = 0
      val out = Seq.newBuilder[Array[Byte]]
      while (i < x.length) {
        val nSegs = x(i + 26) & 0xff
        var len = 27 + nSegs
        (0 until nSegs).foreach(k => len += x(i + 27 + k) & 0xff)
        out += java.util.Arrays.copyOfRange(x, i, i + len)
        i += len
      }
      out.result()
    }
    val pa = pages(a); val pb = pages(b)
    val mux = (Seq(pa.head, pb.head) ++
      pa.tail.zipAll(pb.tail, Array.emptyByteArray, Array.emptyByteArray)
        .flatMap { case (x, y) => Seq(x, y) }.filter(_.nonEmpty))
      .foldLeft(Array.emptyByteArray)(_ ++ _)
    val m = Ogg.census(mux).toOption.get
    assert(m.streams.length == 2)
    assert(m.streams.map(_.nPackets).sum ==
      chained.streams.map(_.nPackets).sum)
  }

  test("a packet spanning pages reassembles through the lacing table") {
    // 700-byte packets force 255+255+190 lacing and (with enough
    // packets) page-spanning continuation in real muxers; here one
    // page carries them all, exercising multi-lace reassembly
    val blob = Ogg.write(opus = true, serial = 7, channels = 2,
      sampleRate = 48000, comments = Nil, nAudioPages = 1,
      packetsPerPage = 2, payloadLen = 700, seed = 3)
    val info = Ogg.census(blob).toOption.get
    assert(info.streams.head.nPackets == 4) // id + comments + 2 audio
  }

  test("hostile pages reject with named reasons") {
    val good = Ogg.write(opus = true, serial = 9, channels = 2,
      sampleRate = 48000, comments = Seq("A" -> "b"), nAudioPages = 2,
      packetsPerPage = 2, payloadLen = 50, seed = 4)
    assert(Ogg.census("MThd junk that is not ogg at all".getBytes) ==
      Left("not_ogg"))
    assert(Ogg.census(java.util.Arrays.copyOf(good, good.length - 20)) ==
      Left("truncated_ogg"))
    // flip a payload byte: the unreflected CRC must catch it
    val flip = good.clone()
    flip(good.length - 5) = (flip(good.length - 5) ^ 0x41).toByte
    assert(Ogg.census(flip) == Left("page_crc_mismatch"))
    // drop the BOS page: first data page has no stream
    val noBos = java.util.Arrays.copyOfRange(good, {
      val nSegs = good(26) & 0xff
      27 + nSegs + (0 until nSegs).map(k => good(27 + k) & 0xff).sum
    }, good.length)
    assert(Ogg.census(noBos) == Left("data_before_bos"))
    // skip a page: sequence gap
    val p0end = {
      val nSegs = good(26) & 0xff
      27 + nSegs + (0 until nSegs).map(k => good(27 + k) & 0xff).sum
    }
    val p1end = p0end + {
      val nSegs = good(p0end + 26) & 0xff
      27 + nSegs +
        (0 until nSegs).map(k => good(p0end + 27 + k) & 0xff).sum
    }
    val gap = java.util.Arrays.copyOf(good, p0end) ++
      java.util.Arrays.copyOfRange(good, p1end, good.length)
    assert(Ogg.census(gap) == Left("page_sequence_gap"))
  }
}
