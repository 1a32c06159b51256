package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Unix compress (.Z LZW): round-trips across maxbits (exercising the
  * width-bump group padding and the table-full clear path), KwKwK,
  * and named rejections. The encoder-vs-system-gzip half lives in
  * tools/fuzz_compress_diff.py (gzip -d is the on-system reference
  * decoder). */
class UnixCompressSpec extends AnyFunSuite {

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  test("round-trips across shapes and maxbits") {
    val shapes = Seq(
      Array.emptyByteArray,
      "x".getBytes,
      "aaaaaaaaaaaaaaaaaaaaaaaaa".getBytes, // KwKwK chains
      ("the quick brown fox " * 200).getBytes,
      lcg(5000, 3),
      lcg(300000, 7), // forces width bumps to 16 and table pressure
      Array.fill[Byte](100000)(42)) // degenerate single-byte run
    for {
      data <- shapes
      maxBits <- Seq(9, 10, 12, 16)
    } {
      val z = UnixCompress.encode(data, maxBits)
      val dec = UnixCompress.decode(z, maxOut = 1 << 22)
      assert(dec.isRight, s"len=${data.length} maxBits=$maxBits: " +
        dec.swap.map(_.reason).getOrElse(""))
      assert(dec.toOption.get.sameElements(data),
        s"len=${data.length} maxBits=$maxBits")
    }
  }

  test("maxbits 9 forces clear-and-restart cycles") {
    // 512-entry table fills constantly on mixed content
    val data = lcg(200000, 11)
    val z = UnixCompress.encode(data, 9)
    assert(UnixCompress.decode(z, maxOut = 1 << 22).toOption.get
      .sameElements(data))
  }

  test("named rejections") {
    assert(UnixCompress.decode("no magic here".getBytes) ==
      Left(UnixCompress.Rejected("not_compress")))
    assert(UnixCompress.decode(Array[Byte](0x1F, 0x9D.toByte)) ==
      Left(UnixCompress.Rejected("truncated_z")))
    // reserved flag bits
    assert(UnixCompress.decode(Array[Byte](0x1F, 0x9D.toByte, 0x70, 0)) ==
      Left(UnixCompress.Rejected("reserved_flag_bits")))
    // maxbits out of range
    assert(UnixCompress.decode(Array[Byte](0x1F, 0x9D.toByte,
      0x88.toByte, 0)) == Left(UnixCompress.Rejected("bad_max_bits")))
    // a first code that isn't a literal (code 300 LSB-first in 9 bits)
    val bad = Array[Byte](0x1F, 0x9D.toByte, 0x90.toByte,
      (300 & 0xff).toByte, ((300 >> 8) & 1).toByte)
    assert(UnixCompress.decode(bad) ==
      Left(UnixCompress.Rejected("bad_first_code")))
    // bomb cap fires during expansion
    val big = UnixCompress.encode(Array.fill[Byte](1 << 20)(7), 16)
    assert(UnixCompress.decode(big, maxOut = 1024) ==
      Left(UnixCompress.Rejected("lzw_bomb")))
  }
}
