package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Interop against the REAL xz codec on the classpath (xz-java —
  * org.tukaani): every stream decoded here was written by
  * XZOutputStream. The broad sweep through CPython's liblzma is
  * tools/fuzz_xz_diff.py. */
class XzSpec extends AnyFunSuite {

  private def xz(data: Array[Byte], preset: Int = 6,
      check: Int = org.tukaani.xz.XZ.CHECK_CRC64): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val opts = new org.tukaani.xz.LZMA2Options(preset)
    val z = new org.tukaani.xz.XZOutputStream(bos, opts, check)
    z.write(data); z.close()
    bos.toByteArray
  }

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  test("real-encoder xz streams decode byte-exact across presets") {
    val text = ("xz rides lzma2 which rides lzma " * 800).getBytes("UTF-8")
    val cases: Seq[Array[Byte]] = Seq(
      text,
      lcg(120000, 7),
      Array.fill[Byte](60000)(42),
      Array.emptyByteArray,
      "a".getBytes("UTF-8"),
      lcg(987, 3) ++ Array.fill[Byte](9000)(0) ++ lcg(987, 4))
    cases.zipWithIndex.foreach { case (data, ci) =>
      Seq(0, 3, 6, 9).foreach { preset =>
        val dec = Xz.decode(xz(data, preset))
        assert(dec.isRight,
          s"case $ci preset $preset: ${dec.swap.getOrElse("")}")
        assert(dec.toOption.get.sameElements(data),
          s"case $ci preset $preset bytes differ")
      }
    }
  }

  test("all four check types verify (none / CRC32 / CRC64 / SHA-256)") {
    import org.tukaani.xz.XZ
    val data = lcg(50000, 11)
    Seq(XZ.CHECK_NONE, XZ.CHECK_CRC32, XZ.CHECK_CRC64, XZ.CHECK_SHA256)
      .foreach { c =>
        assert(Xz.decode(xz(data, 6, c)).toOption.get.sameElements(data),
          s"check $c")
      }
  }

  test("crc64 matches the published ECMA-182 check value") {
    // the widely published CRC-64/XZ vector: "123456789"
    assert(Xz.crc64("123456789".getBytes, 0, 9) == 0x995DC9BBDF1939FAL)
  }

  test("multi-stream concatenation with stream padding decodes fully") {
    val a = lcg(4000, 21); val b = lcg(6000, 22)
    val cat = xz(a) ++ xz(b)
    assert(Xz.decode(cat).toOption.get.sameElements(a ++ b))
    // with 4-aligned zero stream padding between
    val padded = xz(a) ++ Array.fill[Byte](8)(0) ++ xz(b)
    assert(Xz.decode(padded).toOption.get.sameElements(a ++ b))
  }

  test("hostile streams reject with named reasons") {
    val good = xz(lcg(30000, 5))
    val m = good.clone(); m(0) = 'X'
    assert(Xz.decode(m) == Left(Xz.Rejected("bad_magic")))
    assert(Xz.decode(java.util.Arrays.copyOf(good, good.length - 8)).isLeft)
    // flip a byte in the compressed body: check or grammar catches it
    val c = good.clone(); c(good.length / 2) =
      (c(good.length / 2) ^ 0x41).toByte
    assert(Xz.decode(c).isLeft)
    // flip a check byte (CRC64 sits before the index)
    val c2 = good.clone()
    c2(good.length - 30) = (c2(good.length - 30) ^ 1).toByte
    assert(Xz.decode(c2).isLeft)
    // truncate the footer magic
    assert(Xz.decode(java.util.Arrays.copyOf(good, good.length - 1)).isLeft)
    assert(Xz.decode(Array.emptyByteArray) ==
      Left(Xz.Rejected("truncated_xz")))
  }

  test("bomb cap fires during LZMA2 expansion") {
    val data = Array.fill[Byte](4 * 1024 * 1024)(7)
    val blob = xz(data)
    assert(blob.length < 4096)
    assert(Xz.decode(blob, maxOut = 65536) == Left(Xz.Rejected("lzma2_bomb")))
    assert(Xz.decode(blob).toOption.get.sameElements(data))
  }

  private def xzChain(data: Array[Byte],
      filters: Array[org.tukaani.xz.FilterOptions]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.tukaani.xz.XZOutputStream(bos, filters)
    z.write(data); z.close()
    bos.toByteArray
  }

  test("x86 BCJ chains decode byte-exact against xz-java") {
    val opts = new org.tukaani.xz.LZMA2Options(3)
    val x86 = new org.tukaani.xz.X86Options()
    // shapes that exercise the converter: random bytes (accidental
    // E8/E9 + mask machinery), dense synthetic CALL sites with
    // 00/FF top bytes (every branch converts), overlapping E8 runs
    // (the mask's reject path), and tiny/empty buffers
    val callSites = {
      val a = new Array[Byte](8192)
      var i = 0
      var s = 11
      while (i + 5 <= a.length) {
        s = s * 1103515245 + 12345
        a(i) = (if ((s & 4) == 0) 0xE8 else 0xE9).toByte
        a(i + 1) = (s >> 8).toByte; a(i + 2) = (s >> 16).toByte
        a(i + 3) = (s >> 18).toByte
        a(i + 4) = (if ((s & 8) == 0) 0x00 else 0xFF).toByte
        i += 5 + (s & 3)
      }
      a
    }
    val e8run = Array.fill[Byte](4096)(0xE8.toByte)
    for (data <- Seq(lcg(5000, 9), lcg(70000, 10), callSites, e8run,
        lcg(4, 2), Array.emptyByteArray)) {
      val wire = xzChain(data,
        Array[org.tukaani.xz.FilterOptions](x86, opts))
      val dec = Xz.decode(wire)
      assert(dec.isRight, s"len=${data.length}: ${dec.swap.getOrElse("")}")
      assert(dec.toOption.get.sameElements(data), s"len=${data.length}")
    }
  }

  test("all simple pre-filter chains decode byte-exact against xz-java") {
    val opts = new org.tukaani.xz.LZMA2Options(3)
    // per-architecture synthetic "code": densely planted convertible
    // branch patterns (so the converter actually fires) mixed with
    // random bytes; plus plain random and a zero run
    def planted(pattern: Int => Array[Byte], stride: Int): Array[Byte] = {
      val a = new Array[Byte](8192)
      var s = 17
      var i = 0
      while (i + stride <= a.length) {
        s = s * 1103515245 + 12345
        if ((s & 3) != 0) {
          val p = pattern(s)
          System.arraycopy(p, 0, a, i, p.length)
        } else {
          var k = 0
          while (k < stride) { a(i + k) = (s >> (8 * (k % 4))).toByte; k += 1 }
        }
        i += stride
      }
      a
    }
    val armCode = planted(s => Array[Byte](s.toByte, (s >> 8).toByte,
      (s >> 16).toByte, 0xEB.toByte), 4)
    val thumbCode = planted(s => Array[Byte](s.toByte,
      (0xF0 | ((s >> 8) & 7)).toByte, (s >> 16).toByte,
      (0xF8 | ((s >> 24) & 7)).toByte), 4)
    val ppcCode = planted(s => Array[Byte]((0x48 | (s & 3)).toByte,
      (s >> 8).toByte, (s >> 16).toByte, ((s >> 24) & 0xFC | 1).toByte), 4)
    val sparcCode = planted(s => Array[Byte](0x40, (s & 0x3F).toByte,
      (s >> 8).toByte, (s >> 16).toByte), 4)
    val arm64Code = planted({ s =>
      val instr =
        if ((s & 4) == 0) 0x94000000 | (s & 0x03FFFFFF) // BL
        else 0x90000000 | ((s & 3) << 29) | ((s & 0x1FFFC) << 3) // ADRP near
      Array[Byte](instr.toByte, (instr >> 8).toByte, (instr >> 16).toByte,
        (instr >> 24).toByte)
    }, 4)
    // IA-64 bundles: template 0x16/0x17 (three branch slots) with a
    // brl-shaped 41-bit slot payload so the converter fires
    val ia64Code = {
      val a = new Array[Byte](8192)
      var s = 23
      var i = 0
      while (i + 16 <= a.length) {
        s = s * 1103515245 + 12345
        a(i) = (0x16 | (s & 1)).toByte
        // slot 2 (bits 87..127): opcode 5 at the top of the slot
        // (byte-level: put 0xA0 in the last byte => opcode bits 5)
        a(i + 15) = (0xA0 | ((s >> 8) & 0x0F)).toByte
        a(i + 14) = ((s >> 4) & 0x18).toByte // keep middle-27 zeros
        a(i + 12) = (s >> 16).toByte // displacement bits
        a(i + 11) = (s >> 20).toByte
        i += 16
      }
      a
    }
    val cases: Seq[(String, org.tukaani.xz.FilterOptions, Array[Byte])] =
      Seq(
        ("arm", new org.tukaani.xz.ARMOptions(), armCode),
        ("armthumb", new org.tukaani.xz.ARMThumbOptions(), thumbCode),
        ("ppc", new org.tukaani.xz.PowerPCOptions(), ppcCode),
        ("sparc", new org.tukaani.xz.SPARCOptions(), sparcCode),
        ("arm64", new org.tukaani.xz.ARM64Options(), arm64Code),
        ("ia64", new org.tukaani.xz.IA64Options(), ia64Code),
        ("delta", { val d = new org.tukaani.xz.DeltaOptions()
          d.setDistance(4); d }, lcg(9000, 21)))
    for ((name, fo, code) <- cases; data <- Seq(code, lcg(5000, 9),
        new Array[Byte](2048), lcg(3, 5))) {
      val wire = xzChain(data, Array(fo, opts))
      val dec = Xz.decode(wire)
      assert(dec.isRight, s"$name len=${data.length}: " +
        dec.swap.map(_.reason).getOrElse(""))
      assert(dec.toOption.get.sameElements(data), s"$name len=${data.length}")
    }
  }

  test("riscv chains decode byte-exact against xz-java") {
    val opts = new org.tukaani.xz.LZMA2Options(3)
    // trigger-dense payload: JALs (0xEF + clean rd nibble), AUIPC
    // pairs (rs1(w2) == rd, (w2 & 3) == 3), escape-shaped AUIPC-x2
    // markers, plus plain noise — every branch of the recovered
    // bijection (pack / escape / shield-6 / shield-4 / JAL) runs
    def w32(v: Long): Array[Byte] = Array(
      v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    var s = 99
    def nx(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    val words = Array.newBuilder[Byte]
    for (k <- 0 until 4000) {
      val r = nx() % 10
      val w: Long =
        if (r < 2) { // JAL x1/x5
          val rd = if (nx() % 2 == 0) 1 else 5
          (nx().toLong << 17 | nx().toLong) << 12 & 0xFFFFF000L |
            (rd << 7) | 0x6F
        } else if (r < 4) { // AUIPC + maybe-pair second word
          val rd = 1 + nx() % 31
          (nx().toLong & 0xFFFFF) << 12 | (rd << 7) | 0x17
        } else if (r < 6) { // pair-shaped second word
          val rs1 = nx() % 32
          (nx().toLong & 0xFFF) << 20 | (rs1 << 15) |
            ((nx() & 0xFF) << 7) | 0x03
        } else if (r < 7) { // marker-shaped AUIPC-x2
          (nx().toLong & 0xFFFFF) << 12 | 0x117
        } else nx().toLong << 17 | nx().toLong
      words ++= w32(w & 0xFFFFFFFFL)
    }
    val payloads = Seq(words.result(), lcg(20000, 9),
      new Array[Byte](2048), lcg(7, 5))
    for (data <- payloads) {
      val wire = xzChain(data, Array(new org.tukaani.xz.RISCVOptions(), opts))
      val dec = Xz.decode(wire)
      assert(dec.isRight, s"riscv len=${data.length}: " +
        dec.swap.map(_.reason).getOrElse(""))
      assert(dec.toOption.get.sameElements(data), s"riscv len=${data.length}")
    }
  }
}
