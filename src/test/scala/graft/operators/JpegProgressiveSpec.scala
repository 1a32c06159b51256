package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Progressive JPEG coverage. The load-bearing gate is EQUIVALENCE:
  * baseline and progressive encoders share fdct + quant tables, so the
  * quantized coefficients are identical and the two decodes must agree
  * bit-for-bit on every pixel — for arbitrary (non-flat) content, any
  * scan script, with or without restarts. One wrong successive-
  * approximation bit, EOB-run length, or band boundary anywhere breaks
  * it. Plus the hostile-stream sweep: truncations, bit flips, and
  * illegal scan scripts must reject (None), never crash or mis-decode
  * silently. */
class JpegProgressiveSpec extends AnyFunSuite {

  // deliberately non-flat: every coefficient band gets energy, so AC
  // first AND refinement scans carry real runs, ZRLs, and sign bits
  private def busyPx(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      ((id + 37 * x + 23 * y + ((x * y) % 13) * 17 + (x % 5) * 41) % 256).toByte
    }

  private def flatPx(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { k =>
      val bx = (k % w) / 8; val by = (k / w) / 8
      ((id + 5L * bx + 9L * by) % 256).toByte
    }

  test("gray progressive decode equals baseline decode, many shapes") {
    for (id <- 0L until 12L) {
      val w = 8 + (id % 13).toInt  // non-block-aligned widths included
      val h = 8 + (id % 9).toInt
      val px = busyPx(id, w, h)
      val base = Jpeg.decodeGray(Jpeg.encodeGray(w, h, px))
      val prog = Jpeg.decodeGray(JpegProgressive.encodeGray(w, h, px))
      assert(base.isDefined && prog.isDefined, s"id $id")
      assert(prog.get._3.toSeq == base.get._3.toSeq, s"id $id pixels diverge")
    }
  }

  test("color 4:2:0 progressive decode equals baseline decode") {
    for (id <- 0L until 6L) {
      val w = 16 * (1 + (id % 2).toInt) + (if (id % 3 == 0) 0 else 8)
      val h = 16 + (id % 5).toInt // non-MCU-aligned heights included
      val yP = busyPx(id, w, h)
      val cb = busyPx(id + 101, w, h)
      val cr = busyPx(id + 202, w, h)
      val base = Jpeg.decodeRgb(Jpeg.encodeColor420(w, h, yP, cb, cr))
      val prog = Jpeg.decodeRgb(JpegProgressive.encodeColor420(w, h, yP, cb, cr))
      assert(base.isDefined && prog.isDefined, s"id $id")
      assert(prog.get._3.toSeq == base.get._3.toSeq, s"id $id pixels diverge")
    }
  }

  test("block-flat fixtures decode exactly (the q233 contract)") {
    for (id <- 0L until 8L) {
      val w = 8 * (1 + (id % 2).toInt)
      val h = 8 * (1 + (id % 3).toInt)
      val px = flatPx(id, w, h)
      val got = Jpeg.decodeGray(JpegProgressive.encodeGray(w, h, px))
      assert(got.isDefined)
      assert(got.get._3.toSeq == px.toSeq, s"id $id: flat blocks must survive")
    }
  }

  test("restart markers inside progressive scans resync exactly") {
    for (ri <- 1 to 4) {
      val px = busyPx(ri.toLong, 24, 24)
      val prog = Jpeg.decodeGray(
        JpegProgressive.encodeGray(24, 24, px, restartInterval = ri))
      val base = Jpeg.decodeGray(Jpeg.encodeGray(24, 24, px))
      assert(prog.isDefined, s"ri=$ri")
      assert(prog.get._3.toSeq == base.get._3.toSeq, s"ri=$ri diverges")
    }
  }

  test("alternative scan scripts all converge to the same pixels") {
    val px = busyPx(7, 17, 19)
    val base = Jpeg.decodeGray(Jpeg.encodeGray(17, 19, px)).get._3.toSeq
    import JpegProgressive.Scan
    val scripts = Seq(
      // single full-precision passes, three bands
      Seq(Scan(Seq(0), 0, 0, 0, 0), Scan(Seq(0), 1, 2, 0, 0),
        Scan(Seq(0), 3, 20, 0, 0), Scan(Seq(0), 21, 63, 0, 0)),
      // two-bit successive approximation on everything
      Seq(Scan(Seq(0), 0, 0, 0, 2), Scan(Seq(0), 1, 63, 0, 2),
        Scan(Seq(0), 0, 0, 2, 1), Scan(Seq(0), 1, 63, 2, 1),
        Scan(Seq(0), 0, 0, 1, 0), Scan(Seq(0), 1, 63, 1, 0)),
      // interleave DC/AC progressions
      Seq(Scan(Seq(0), 0, 0, 0, 1), Scan(Seq(0), 1, 63, 0, 1),
        Scan(Seq(0), 1, 63, 1, 0), Scan(Seq(0), 0, 0, 1, 0)))
    scripts.zipWithIndex.foreach { case (script, i) =>
      val got = Jpeg.decodeGray(JpegProgressive.encodeGray(17, 19, px, script))
      assert(got.isDefined, s"script $i rejected")
      assert(got.get._3.toSeq == base, s"script $i diverges")
    }
  }

  test("illegal scan scripts reject") {
    import JpegProgressive.Scan
    val px = busyPx(3, 16, 16)
    def enc(script: Seq[Scan]) = JpegProgressive.encodeGray(16, 16, px, script)
    // AC before the component's DC first scan
    assert(Jpeg.decodeGray(enc(Seq(Scan(Seq(0), 1, 63, 0, 0),
      Scan(Seq(0), 0, 0, 0, 0)))).isEmpty)
    // duplicate first scan for a band
    assert(Jpeg.decodeGray(enc(Seq(Scan(Seq(0), 0, 0, 0, 0),
      Scan(Seq(0), 0, 0, 0, 0)))).isEmpty)
    // refinement that skips a bit of the SA chain (Ah != Al+1 is caught
    // by the header check; a chain GAP is caught by the ledger)
    assert(Jpeg.decodeGray(enc(Seq(Scan(Seq(0), 0, 0, 0, 2),
      Scan(Seq(0), 0, 0, 1, 0)))).isEmpty)
    // unfinished SA chain (band left above full precision)
    assert(Jpeg.decodeGray(enc(Seq(Scan(Seq(0), 0, 0, 0, 1),
      Scan(Seq(0), 1, 63, 0, 0)))).isEmpty)
    // overlapping first bands
    assert(Jpeg.decodeGray(enc(Seq(Scan(Seq(0), 0, 0, 0, 0),
      Scan(Seq(0), 1, 10, 0, 0), Scan(Seq(0), 5, 63, 0, 0)))).isEmpty)
  }

  test("hostile headers reject: bad Ss/Se/Ah/Al and multi-component AC") {
    // craft by patching a valid stream's SOS parameters
    val px = busyPx(5, 16, 16)
    val good = JpegProgressive.encodeGray(16, 16, px,
      Seq(JpegProgressive.Scan(Seq(0), 0, 0, 0, 0),
        JpegProgressive.Scan(Seq(0), 1, 63, 0, 0)))
    assert(Jpeg.decodeGray(good).isDefined)
    // find the SECOND SOS (the AC scan) and corrupt its band bytes:
    // SOS body layout here: [ns=1, cid, tdta, ss, se, ahal]
    def findSos(p: Array[Byte], nth: Int): Int = {
      var i = 2; var seen = 0
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) == 0xff && (p(i + 1) & 0xff) == 0xda) {
          seen += 1
          if (seen == nth) return i + 4 // body start
        }
        i += 1
      }
      -1
    }
    val sos2 = findSos(good, 2)
    assert(sos2 > 0)
    def patched(ss: Int, se: Int, ahal: Int): Array[Byte] = {
      val c = good.clone()
      c(sos2 + 3) = ss.toByte; c(sos2 + 4) = se.toByte; c(sos2 + 5) = ahal.toByte
      c
    }
    assert(Jpeg.decodeGray(patched(10, 5, 0)).isEmpty)   // Ss > Se
    assert(Jpeg.decodeGray(patched(1, 64, 0)).isEmpty)   // Se > 63
    assert(Jpeg.decodeGray(patched(0, 63, 0)).isEmpty)   // DC+AC in one scan
    assert(Jpeg.decodeGray(patched(1, 63, 0x30)).isEmpty) // Ah=3, Al=0 chain skip
  }

  test("truncation sweep: cutting the stream anywhere never crashes") {
    val px = busyPx(9, 16, 16)
    val good = JpegProgressive.encodeGray(16, 16, px)
    var decoded = 0
    (2 until good.length by 7).foreach { cut =>
      Jpeg.decodeGray(java.util.Arrays.copyOf(good, cut)) match {
        case Some(_) => decoded += 1
        case None => ()
      }
    }
    // a truncated progressive stream can never satisfy the completed-
    // SA-chain rule, so every cut must reject
    assert(decoded == 0)
  }

  test("bit-flip sweep: corrupted streams never crash the decoder") {
    val px = busyPx(11, 16, 16)
    val good = JpegProgressive.encodeGray(16, 16, px)
    (0 until good.length by 3).foreach { i =>
      val c = good.clone()
      c(i) = (c(i) ^ 0x40).toByte
      Jpeg.decodeGray(c) // must not throw; value unspecified
    }
  }

  test("missing EOB-run extension bits reject (truncated mid-run)") {
    // a 32x32 flat image's AC scan is one EOBn symbol with extension
    // bits; cut inside them
    val px = flatPx(1, 32, 32)
    val good = JpegProgressive.encodeGray(32, 32, px,
      Seq(JpegProgressive.Scan(Seq(0), 0, 0, 0, 0),
        JpegProgressive.Scan(Seq(0), 1, 63, 0, 0)))
    assert(Jpeg.decodeGray(good).exists(_._3.toSeq == px.toSeq))
    // chop the last entropy bytes before EOI: the EOB run loses its bits
    val cut = java.util.Arrays.copyOf(good, good.length - 3)
    assert(Jpeg.decodeGray(cut).isEmpty)
  }

  test("isProgressive sniffs SOF2 and nothing else") {
    val px = flatPx(2, 16, 16)
    assert(JpegProgressive.isProgressive(JpegProgressive.encodeGray(16, 16, px)))
    assert(!JpegProgressive.isProgressive(Jpeg.encodeGray(16, 16, px)))
    assert(!JpegProgressive.isProgressive(Array[Byte](1, 2, 3)))
  }
}
