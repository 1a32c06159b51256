package graft.operators

import graft.SparkSuite

class IcoSpec extends SparkSuite {

  private def icon(w: Int, h: Int, seed: Int) = {
    val px = Array.tabulate(w * h)(i => ((seed + i * 7) % 256).toByte)
    (w, h, px, (k: Int) => (k + seed) % 5 == 0)
  }

  test("multi-icon files roundtrip with masks; 256-dim zero-byte handled") {
    val imgs = Seq(icon(5, 4, 3), icon(8, 8, 11), icon(256, 1, 0))
    val dec = Ico.decode(Ico.encode(imgs))
    assert(dec.isDefined && dec.get.size == 3)
    imgs.zip(dec.get).foreach { case ((w, h, px, t), (dw, dh, dp, nt)) =>
      assert(dw == w && dh == h)
      assert(dp.toSeq == px.toSeq)
      assert(nt == (0 until w * h).count(t))
    }
  }

  test("hostile inputs reject: bad directory, lying sizes, wrong height") {
    val good = Ico.encode(Seq(icon(6, 5, 1)))
    assert(Ico.decode(good).isDefined)
    // reserved word nonzero
    val r = good.clone(); r(0) = 1
    assert(Ico.decode(r).isEmpty)
    // entry offset escaping the file
    val o = good.clone(); o(6 + 12) = 0xff.toByte; o(6 + 13) = 0x7f
    assert(Ico.decode(o).isEmpty)
    // truncated body
    assert(Ico.decode(good.dropRight(4)).isEmpty)
    // a DIB declaring the UNDOUBLED height is a plain BMP header — the
    // exact confusion the doubled-height contract exists to reject
    val off = 6 + 16
    val h = good.clone()
    // height field at DIB offset +8: set to 5 instead of 10
    h(off + 8) = 5; h(off + 9) = 0; h(off + 10) = 0; h(off + 11) = 0
    assert(Ico.decode(h).isEmpty)
  }
}
