package graft.operators

import graft.SparkSuite

class NetpbmSpec extends SparkSuite {

  private def gray(w: Int, h: Int) =
    Array.tabulate(w * h)(i => (i * 13 % 256).toByte)

  test("P5 and P6 roundtrip, comments and whitespace-like raster bytes included") {
    val w = 7; val h = 5
    // raster deliberately contains 0x0A/0x20 bytes — a skip-all-
    // whitespace reader would eat them
    val px = Array.tabulate(w * h)(i => (i % 3 match {
      case 0 => 0x0a; case 1 => 0x20; case _ => i
    }).toByte)
    val g = Netpbm.decode(Netpbm.encodeGray(w, h, px, "a comment"))
    assert(g.contains((w, h, 1, g.get._4)) && g.get._4.toSeq == px.toSeq)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7) % 256).toByte)
    val c = Netpbm.decode(Netpbm.encodeRgb(w, h, rgb))
    assert(c.isDefined && c.get._3 == 3 && c.get._4.toSeq == rgb.toSeq)
  }

  test("hostile headers reject") {
    val good = Netpbm.encodeGray(4, 3, gray(4, 3))
    assert(Netpbm.decode(good).isDefined)
    // wrong magic
    assert(Netpbm.decode("P4\n4 3\n255\n".getBytes ++ gray(4, 3)).isEmpty)
    // maxval != 255 (2-byte samples out of contract)
    assert(Netpbm.decode("P5\n4 3\n65535\n".getBytes ++ gray(4, 3)).isEmpty)
    // truncated raster / trailing garbage
    assert(Netpbm.decode(good.dropRight(1)).isEmpty)
    assert(Netpbm.decode(good :+ 0.toByte).isEmpty)
    // per spec a comment may start IMMEDIATELY after a token
    assert(Netpbm.decode("P5\n4#c\n3\n255\n".getBytes ++ gray(4, 3)).isDefined)
    // but a letter fused to digits is a malformed token
    assert(Netpbm.decode("P5\n4x 3\n255\n".getBytes ++ gray(4, 3)).isEmpty)
  }
}
