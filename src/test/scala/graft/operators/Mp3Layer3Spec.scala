package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Layer III spectral decode gate: exact roundtrips across the
  * reservoir/scfsi/gain/slen grid, the part2_3 accounting, and the
  * named off-scope rejections (reject-don't-guess: no on-system source
  * exists to pin the arbitrary Huffman tables, so they must quarantine,
  * never guess). */
class Mp3Layer3Spec extends AnyFunSuite {

  private def spec(seed: Int, nQuads: Int, gainStep: Int,
      sfc: Int = 0): Mp3Layer3.GranuleSpec =
    Mp3Layer3.GranuleSpec(
      Array.tabulate(4 * nQuads)(l => ((seed + l) % 3) - 1),
      gainStep, sfc)

  test("roundtrip: spectra decode to the exact planted +-2^k lines") {
    for {
      reservoir <- Seq(false, true)
      scfsi <- Seq(0, 5, 15)
      seed <- 0 until 4
    } {
      val frames = (0 until 3).map { f =>
        (spec(seed + f, 8 + 3 * f, f % 3, sfc = (seed + f) % 16),
          spec(seed + f + 1, 6 + 2 * f, (f + 1) % 3, sfc = seed % 16))
      }
      val blob = Mp3Layer3.encode(frames, scfsi, reservoir)
      val got = Mp3Layer3.decode(blob) match {
        case Right(g) => g
        case Left(r) => fail(s"reservoir=$reservoir scfsi=$scfsi: ${r.reason}")
      }
      assert(got.length == 6)
      got.foreach { g =>
        val s = if (g.granule == 0) frames(g.frame)._1 else frames(g.frame)._2
        val want = Array.tabulate(576) { l =>
          if (l < s.values.length)
            s.values(l).toDouble * (1 << s.gainStep)
          else 0.0
        }
        assert(g.xr.toSeq == want.toSeq,
          s"frame ${g.frame} granule ${g.granule}")
        assert(g.count1Quads == s.values.length / 4)
      }
      // reservoir shape: later frames reach back, frame 0 never does
      if (reservoir) assert(got.filter(_.frame > 0).forall(_.mainDataBegin > 0))
      else assert(got.forall(_.mainDataBegin == 0))
    }
  }

  test("off-scope streams reject by name (no guessed Huffman tables)") {
    val good = Mp3Layer3.encode(Seq((spec(1, 8, 0), spec(2, 8, 0))))
    // stereo: flip the channel-mode bits in the header
    val stereo = good.clone(); stereo(3) = 0x00.toByte
    assert(Mp3Layer3.decode(stereo) ==
      Left(Mp3Layer3.Rejected("mp3_stereo_unsupported")))
    // CRC-protected shape
    val crc = good.clone(); crc(1) = 0xfa.toByte
    assert(Mp3Layer3.decode(crc) ==
      Left(Mp3Layer3.Rejected("mp3_crc_unsupported")))
    // layer II
    val l2 = good.clone(); l2(1) = 0xfd.toByte
    assert(Mp3Layer3.decode(l2) ==
      Left(Mp3Layer3.Rejected("mp3_not_mpeg1_layer3")))
    assert(Mp3Layer3.decode(Array[Byte](1, 2, 3)) ==
      Left(Mp3Layer3.Rejected("mp3_truncated")))
    assert(Mp3Layer3.decode(Array[Byte](1, 2, 3, 4)) ==
      Left(Mp3Layer3.Rejected("mp3_bad_sync")))
  }

  test("hostile sweeps: truncation and bit flips never throw") {
    val good = Mp3Layer3.encode(
      Seq((spec(3, 10, 1), spec(4, 12, 2)),
        (spec(5, 8, 0), spec(6, 6, 1))), scfsi = 9, reservoir = true)
    (0 until good.length by 7).foreach { n =>
      Mp3Layer3.decode(java.util.Arrays.copyOf(good, n)) match {
        case Right(g) => assert(g.length <= 4)
        case Left(r) => assert(r.reason.nonEmpty)
      }
    }
    val rnd = new scala.util.Random(13)
    (1 to 400).foreach { _ =>
      val c = good.clone()
      c(rnd.nextInt(c.length)) =
        (c(rnd.nextInt(c.length)) ^ (1 << rnd.nextInt(8))).toByte
      Mp3Layer3.decode(c)
    }
  }

  test("reservoir underflow rejects: begin reaching before the stream") {
    val good = Mp3Layer3.encode(Seq((spec(1, 8, 0), spec(2, 8, 0))))
    // main_data_begin lives in the first 9 bits after the header: force
    // a nonzero value in frame 0 (nothing precedes it)
    val c = good.clone()
    c(4) = 0x10.toByte
    assert(Mp3Layer3.decode(c) ==
      Left(Mp3Layer3.Rejected("mp3_reservoir_underflow")))
  }

  test("part2_3 accounting: a length that cuts a quadruple rejects") {
    val good = Mp3Layer3.encode(Seq((spec(1, 8, 0), spec(1, 8, 0))))
    // part2_3_length of granule 0 sits at side-info bits 18..29
    // (after main_data_begin 9 + private 5 + scfsi 4); shave 2 bits so
    // the decoder lands mid-quadruple
    val bitOff = 4 * 8 + 18
    val v = (0 until 12).foldLeft(0) { (acc, k) =>
      (acc << 1) | ((good((bitOff + k) / 8) >> (7 - (bitOff + k) % 8)) & 1)
    }
    val nv = v - 2
    val c = good.clone()
    (0 until 12).foreach { k =>
      val bit = (nv >> (11 - k)) & 1
      val at = (bitOff + k) / 8
      val mask = 1 << (7 - (bitOff + k) % 8)
      c(at) = (if (bit == 1) c(at) | mask else c(at) & ~mask).toByte
    }
    assert(Mp3Layer3.decode(c) ==
      Left(Mp3Layer3.Rejected("mp3_part23_overrun")))
  }
}
