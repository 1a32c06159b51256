package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Interop against the REAL bzip2 codec on the classpath
  * (commons-compress): every decode here consumes genuine
  * BZip2CompressorOutputStream output. The broad parameter sweep
  * against CPython's libbz2 binding is tools/fuzz_bzip2_diff.py. */
class Bzip2Spec extends AnyFunSuite {

  private def bz(data: Array[Byte], level: Int = 9): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos, level)
    z.write(data); z.close()
    bos.toByteArray
  }

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  test("real-encoder streams decode byte-exact across content shapes") {
    val text = ("the quick brown fox jumps over the lazy dog " * 400)
      .getBytes("UTF-8")
    val cases: Seq[Array[Byte]] = Seq(
      text,
      lcg(100000, 7), // high entropy, multiple Huffman groups
      Array.fill[Byte](50000)(42), // one long run: RUNA/RUNB stress
      Array.tabulate[Byte](65536)(i => (i % 251).toByte),
      "a".getBytes("UTF-8"),
      lcg(987, 3) ++ Array.fill[Byte](5000)(0) ++ lcg(987, 4))
    cases.zipWithIndex.foreach { case (data, i) =>
      (1 to 9 by 4).foreach { level =>
        val dec = Bzip2.decode(bz(data, level))
        assert(dec.isRight,
          s"case $i level $level: ${dec.swap.getOrElse("")}")
        assert(dec.toOption.get.sameElements(data),
          s"case $i level $level bytes differ")
      }
    }
  }

  test("empty input compresses to a stream that decodes to empty") {
    val dec = Bzip2.decode(bz(Array.emptyByteArray))
    assert(dec.map(_.length) == Right(0))
  }

  test("multi-block and concatenated multi-stream blobs decode fully") {
    // level 1 = 100k blocks: 350k input spans 4 blocks
    val data = lcg(350000, 11)
    assert(Bzip2.decode(bz(data, 1)).toOption.get.sameElements(data))
    // pbzip2-style concatenation: two complete streams back to back
    val a = lcg(5000, 21); val b = lcg(7000, 22)
    val cat = bz(a) ++ bz(b)
    assert(Bzip2.decode(cat).toOption.get.sameElements(a ++ b))
  }

  test("RLE1 runs of exactly 4+ bytes round-trip (the count-byte layer)") {
    for (runLen <- Seq(3, 4, 5, 255, 256, 259, 260, 1000)) {
      val data = ("x" * runLen + "tail").getBytes("UTF-8")
      assert(Bzip2.decode(bz(data)).toOption.get.sameElements(data),
        s"runLen $runLen")
    }
  }

  test("hostile streams reject with named reasons") {
    val good = bz(lcg(30000, 5))
    // bad stream magic
    val m = good.clone(); m(0) = 'X'
    assert(Bzip2.decode(m) == Left(Bzip2.Rejected("bad_magic")))
    // bad level digit
    val lv = good.clone(); lv(3) = '0'
    assert(Bzip2.decode(lv) == Left(Bzip2.Rejected("bad_level")))
    // truncation: mid-stream EOF
    assert(Bzip2.decode(java.util.Arrays.copyOf(good, good.length - 6)) ==
      Left(Bzip2.Rejected("truncated_bzip2")))
    // flip a byte in the compressed body: CRC or grammar must catch it
    val c = good.clone(); c(good.length / 2) = (c(good.length / 2) ^ 0x41).toByte
    assert(Bzip2.decode(c).isLeft)
    // flip the stored block CRC itself
    val c2 = good.clone(); c2(14) = (c2(14) ^ 0x01).toByte
    assert(Bzip2.decode(c2).isLeft)
    // trailing garbage after a complete stream
    assert(Bzip2.decode(good ++ Array[Byte](1, 2, 3)) ==
      Left(Bzip2.Rejected("bad_magic")))
    // empty input
    assert(Bzip2.decode(Array.emptyByteArray) ==
      Left(Bzip2.Rejected("truncated_bzip2")))
  }

  test("bomb cap fires during RLE1 expansion, before allocation") {
    // highly repetitive input expands far beyond its compressed size
    val data = Array.fill[Byte](2 * 1024 * 1024)(7)
    val blob = bz(data)
    assert(blob.length < 1024) // the bomb shape: tiny wire, huge output
    assert(Bzip2.decode(blob, maxOut = 65536) ==
      Left(Bzip2.Rejected("bzip2_bomb")))
    assert(Bzip2.decode(blob).toOption.get.sameElements(data))
  }
}
