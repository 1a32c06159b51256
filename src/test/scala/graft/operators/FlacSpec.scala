package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class FlacSpec extends AnyFunSuite {

  private def synth(n: Int, ch: Int, bits: Int, seed: Long): Array[Array[Int]] = {
    val hi = (1 << (bits - 1)) - 1
    Array.tabulate(ch, n) { (c, i) =>
      (((seed * 7 + 31L * i + 13 * c) % (2L * hi + 1)) - hi).toInt
    }
  }

  private def roundTrip(samples: Array[Array[Int]], bits: Int,
      blockSize: Int, order: Int, po: Int = 1): Unit = {
    val blob = Flac.encode(samples, bits, 44100, blockSize, order, po)
    val dec = Flac.decode(blob)
    assert(dec.isDefined, s"order=$order bits=$bits bs=$blockSize")
    val a = dec.get
    assert(a.sampleRate == 44100 && a.channels == samples.length && a.bits == bits)
    assert(a.samples.length == samples.length)
    a.samples.zip(samples).foreach { case (got, want) =>
      assert(got.toSeq == want.toSeq)
    }
  }

  test("round-trip identity: every fixed order, mono and stereo, 8/16-bit") {
    for (order <- 0 to 4; ch <- 1 to 2; bits <- Seq(8, 16))
      roundTrip(synth(200, ch, bits, seed = order * 10 + ch), bits,
        blockSize = 64, order = order)
  }

  test("short last frame, order clamped to block content") {
    roundTrip(synth(130, 1, 16, 3), 16, blockSize = 64, order = 4) // last=2
    roundTrip(synth(65, 2, 16, 4), 16, blockSize = 64, order = 2)  // last=1
  }

  test("constant subframes: silence and DC offsets") {
    val silent = Array.fill(1)(Array.fill(100)(0))
    roundTrip(silent, 16, blockSize = 50, order = 2)
    val dc = Array.fill(2)(Array.fill(96)(-1234))
    roundTrip(dc, 16, blockSize = 32, order = 1)
  }

  test("rice escape path: huge residual jumps still round-trip") {
    // order-4 residuals of this fixture reach ~2^19, so raw ~21-bit
    // coding (escape code 15) beats every Rice parameter (p=14 costs
    // ≥47 bits/sample) — the encoder provably takes the escape branch
    val spiky = Array.tabulate(1, 128)((_, i) =>
      if (i % 7 == 0) 32767 else if (i % 7 == 3) -32768 else 0)
    roundTrip(spiky, 16, blockSize = 64, order = 4)
    // and the escaped stream is materially smaller than a forced-Rice
    // one would be: sanity bound of < 24 bits/sample overall
    val blob = Flac.encode(spiky, 16, 44100, 64, 4)
    assert(blob.length < 4 + 38 + 128 * 3 + 64)
  }

  test("multi-frame with partition orders 0 and 2") {
    roundTrip(synth(512, 2, 16, 9), 16, blockSize = 128, order = 3, po = 0)
    roundTrip(synth(512, 1, 16, 11), 16, blockSize = 128, order = 2, po = 2)
  }

  test("hostile streams quarantine: magic, CRCs, truncation, totals") {
    val good = Flac.encode(synth(200, 1, 16, 5), 16, 44100, 64, 2)
    assert(Flac.decode(good).isDefined)
    // bad magic
    val m = good.clone(); m(0) = 'g'.toByte
    assert(Flac.decode(m).isEmpty)
    // truncated at any tail length
    assert(Flac.decode(good.dropRight(1)).isEmpty)
    assert(Flac.decode(good.dropRight(37)).isEmpty)
    assert(Flac.decode(good.take(20)).isEmpty)
    // header CRC-8: flip a bit in the first frame's block-size field
    val frameAt = 4 + 4 + 34
    val h = good.clone(); h(frameAt + 4) = (h(frameAt + 4) ^ 1).toByte
    assert(Flac.decode(h).isEmpty)
    // frame CRC-16: flip a bit mid-frame (residual region)
    val f = good.clone(); f(frameAt + 12) = (f(frameAt + 12) ^ 0x10).toByte
    assert(Flac.decode(f).isEmpty)
    // STREAMINFO total samples disagreeing with the decoded count
    val t = good.clone(); t(4 + 4 + 17) = (t(4 + 4 + 17) ^ 1).toByte
    assert(Flac.decode(t).isEmpty)
    // trailing garbage after the last frame
    assert(Flac.decode(good ++ Array[Byte](1, 2, 3)).isEmpty)
  }

  test("random byte junk never throws, always None") {
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(b)
      assert(Flac.decode(b).isEmpty)
    }
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](50 + rnd.nextInt(300))
      rnd.nextBytes(b)
      System.arraycopy("fLaC".getBytes("US-ASCII"), 0, b, 0, 4)
      assert(Flac.decode(b).isEmpty)
    }
  }

  test("crc reference values (spec polynomials, init 0)") {
    // CRC-8 poly 0x07 of "123456789" is 0xF4; CRC-16 poly 0x8005
    // (MSB-first, init 0) of the same vector is 0xFEE8
    val v = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(v, 0, v.length) == 0xf4)
    assert(Flac.crc16(v, 0, v.length) == 0xfee8)
  }

  test("LPC round-trip: orders 1/2/8, shifts, mono and stereo, 8/16-bit") {
    for ((order, shift) <- Seq((1, 5), (2, 9), (8, 12)); ch <- 1 to 2;
         bits <- Seq(8, 16)) {
      val prec = 12
      val coefs = Array.tabulate(order)(j =>
        (if (j % 2 == 0) 1 else -1) * ((1 << shift) / (j + 1) % (1 << (prec - 1))))
      val samples = synth(200, ch, bits, seed = 77 + order)
      val blob = Flac.encode(samples, bits, 44100, 64, 0,
        lpcCoefs = coefs, lpcPrec = prec, lpcShift = shift)
      val dec = Flac.decode(blob)
      assert(dec.isDefined, s"lpc order=$order shift=$shift bits=$bits")
      dec.get.samples.zip(samples).foreach { case (got, want) =>
        assert(got.toSeq == want.toSeq)
      }
    }
  }

  test("LPC with negative coefficients and escape-path residuals") {
    val samples = Array(Array.tabulate(150)(i =>
      if (i % 37 == 0) 30000 - i * 400 else -30000 + i * 350))
    val blob = Flac.encode(samples, 16, 8000, 64, 0,
      lpcCoefs = Array(-900, 400, -100), lpcPrec = 11, lpcShift = 10)
    assert(Flac.decode(blob).exists(_.samples(0).toSeq == samples(0).toSeq))
  }

  test("LPC hostile bits quarantine: precision code 15, negative shift") {
    val samples = synth(100, 1, 16, seed = 3)
    val blob = Flac.encode(samples, 16, 44100, 64, 0,
      lpcCoefs = Array(500, -256), lpcPrec = 10, lpcShift = 9)
    assert(Flac.decode(blob).isDefined)
    // The LPC subframe header sits right after the frame header + CRC-8.
    // Rather than bit-surgery, corrupt every byte in turn and require
    // None-or-identity: no mutation may decode to DIFFERENT samples.
    val want = samples(0).toSeq
    var flips = 0
    for (i <- 0 until blob.length) {
      val m = blob.clone()
      m(i) = (m(i) ^ 0x40).toByte
      Flac.decode(m) match {
        case Some(a) =>
          // a surviving flip must not silently corrupt audio payload
          if (a.samples(0).toSeq != want) flips += 1
        case None => ()
      }
    }
    assert(flips == 0, s"$flips byte flips silently changed decoded samples")
  }
}
