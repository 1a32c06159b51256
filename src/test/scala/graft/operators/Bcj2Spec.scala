package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** BCJ2 — the 4-stream x86 converter: stream-split round-trips,
  * container round-trips through the in-house 7z writer, cross-check
  * against the REAL reader on this system (libarchive bsdtar), and
  * the reject-don't-guess hostiles. */
class Bcj2Spec extends AnyFunSuite {

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed.toLong
    Array.fill(n) { s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33).toByte }
  }

  /** x86-ish block: random bytes with planted E8 CALLs, E9 JMPs and
    * 0F 8x Jcc's so every conversion path and prob context runs. */
  private def x86ish(n: Int, seed: Int): Array[Byte] = {
    val b = lcg(n, seed)
    var i = 0
    var k = seed
    while (i + 6 < n) {
      k = k * 1103515245 + 12345
      (math.abs(k) % 5) match {
        case 0 => b(i) = 0xE8.toByte
        case 1 => b(i) = 0xE9.toByte
        case 2 => b(i) = 0x0F.toByte; b(i + 1) = (0x80 | (k >>> 8) & 0x0F).toByte
        case _ => ()
      }
      i += 5 + math.abs(k) % 9
    }
    b
  }

  test("stream split round-trips byte-exact across shapes and seeds") {
    for (seed <- 1 to 40; n <- Seq(0, 1, 3, 4, 5, 64, 1000, 5000)) {
      val data = x86ish(n, seed * 31 + n)
      val st = Bcj2.encode(data)
      Bcj2.decode(st.main, st.call, st.jump, st.rc, n) match {
        case Right(got) => assert(got.sameElements(data), s"seed=$seed n=$n")
        case Left(r) => fail(s"seed=$seed n=$n rejected: $r")
      }
      // the filter genuinely splits: planted branches leave main
      if (n >= 1000)
        assert(st.call.nonEmpty && st.jump.nonEmpty &&
          st.main.length < n, s"seed=$seed n=$n did not convert")
    }
  }

  test("candidates at the block tail take the no-convert path") {
    // E8 with fewer than 4 operand bytes left: rc bit says copy
    for (tail <- 0 to 4) {
      val data = lcg(40, 7) ++ Array.fill[Byte](1)(0xE8.toByte) ++
        lcg(tail, 9)
      val st = Bcj2.encode(data)
      assert(Bcj2.decode(st.main, st.call, st.jump, st.rc,
        data.length).toOption.get.sameElements(data), s"tail=$tail")
    }
  }

  test("7z BCJ2 archives round-trip through the in-house parser") {
    val ms = Seq(
      "a.exe" -> x86ish(3000, 5),
      "b.dll" -> x86ish(1200, 11),
      "c.bin" -> lcg(500, 17))
    // both wire shapes: 2-coder (LZMA+BCJ2, call/jump/rc packed raw)
    // and 4-coder (one LZMA per compressible stream)
    for (wide <- Seq(false, true)) {
      val blob = SevenZip.writeBcj2(ms, wide)
      SevenZip.parse(blob) match {
        case Right(p) =>
          assert(p.members.map(_.name) == ms.map(_._1))
          p.members.zip(ms).foreach { case (g, (n, b)) =>
            assert(g.body.sameElements(b), s"wide=$wide member $n") }
          assert(p.codecs.contains("bcj2") && p.codecs.contains("lzma"))
          assert(p.nFolders == 1)
        case Left(r) => fail(s"wide=$wide rejected: $r")
      }
      // single-member shape (no substream counts on the wire)
      val one = SevenZip.writeBcj2(Seq("x.exe" -> x86ish(2000, 23)), wide)
      assert(SevenZip.parse(one).toOption.get.members.head.body.length == 2000)
    }
  }

  test("the REAL reader (bsdtar/libarchive) extracts the fixtures") {
    val bsdtar = Seq("/root/miniconda/bin/bsdtar", "/usr/bin/bsdtar")
      .find(p => new java.io.File(p).canExecute)
    assume(bsdtar.isDefined, "bsdtar not on this system")
    // the 2-coder shape is the one libarchive supports — this is the
    // independent check of the WHOLE codec (range-coder layout, prob
    // contexts, prev-byte-after-conversion), not just the container
    val ms = Seq("main.exe" -> x86ish(4000, 41), "data.bin" -> lcg(900, 43))
    val blob = SevenZip.writeBcj2(ms)
    val f = java.io.File.createTempFile("graft_bcj2", ".7z")
    try {
      java.nio.file.Files.write(f.toPath, blob)
      val list = new String(
        new ProcessBuilder(bsdtar.get, "-tf", f.getAbsolutePath)
          .redirectErrorStream(true).start().getInputStream.readAllBytes(),
        "UTF-8")
      ms.foreach(m => assert(list.contains(m._1), s"list: $list"))
      for ((name, body) <- ms) {
        val proc = new ProcessBuilder(bsdtar.get, "-xOf",
          f.getAbsolutePath, name).start()
        val got = proc.getInputStream.readAllBytes()
        assert(proc.waitFor() == 0, s"extract $name failed")
        assert(got.sameElements(body), s"member $name differs via libarchive")
      }
    } finally f.delete()
  }

  test("hostile streams reject by name") {
    val data = x86ish(2000, 3)
    val st = Bcj2.encode(data)
    // truncated rc: normalization starves
    assert(Bcj2.decode(st.main, st.call, st.jump,
      st.rc.take(3), data.length) == Left("bcj2_rc_truncated"))
    // nonzero first rc byte: no LZMA-family encoder emits one
    val badRc = st.rc.clone(); badRc(0) = 1
    assert(Bcj2.decode(st.main, st.call, st.jump, badRc, data.length) ==
      Left("bcj2_bad_rc_start"))
    // truncated main
    assert(Bcj2.decode(st.main.take(st.main.length / 2), st.call, st.jump,
      st.rc, data.length).isLeft)
    // call/jump starved: drop their tails
    if (st.call.length >= 4)
      assert(Bcj2.decode(st.main, st.call.take(st.call.length - 4), st.jump,
        st.rc, data.length).isLeft)
    if (st.jump.length >= 4)
      assert(Bcj2.decode(st.main, st.call, st.jump.take(st.jump.length - 4),
        st.rc, data.length).isLeft)
    // surplus bytes a strict walk cannot attribute
    assert(Bcj2.decode(st.main :+ 0.toByte, st.call, st.jump, st.rc,
      data.length) == Left("bcj2_stream_surplus"))
  }

  test("hostile 7z BCJ2 containers reject by name") {
    val blob = SevenZip.writeBcj2(Seq("a.exe" -> x86ish(1500, 29)))
    def le64(b: Array[Byte], p: Int): Long =
      (0 until 8).map(k => (b(p + k) & 0xffL) << (8 * k)).sum
    val nextOff = le64(blob, 12)
    val hdr = (32 + nextOff).toInt
    // find the BCJ2 coder flag byte (0x14 followed by 03 03 01 1B)
    var at = -1
    var i = hdr
    while (at < 0 && i < blob.length - 5) {
      if ((blob(i) & 0xff) == 0x14 && blob(i + 1) == 0x03 &&
        blob(i + 2) == 0x03 && blob(i + 3) == 0x01 &&
        (blob(i + 4) & 0xff) == 0x1B) at = i
      i += 1
    }
    assert(at > 0, "BCJ2 coder bytes not found in plain header")
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val m = blob.clone(); f(m)
      // re-seal the next-header CRC, then the start-header CRC that
      // covers it, so the mutation reaches the folder parser
      val size = le64(m, 20).toInt
      val c = new java.util.zip.CRC32(); c.update(m, hdr, size)
      var k = 0
      while (k < 4) { m(28 + k) = ((c.getValue >> (8 * k)) & 0xff).toByte
        k += 1 }
      val s = new java.util.zip.CRC32(); s.update(m, 12, 20)
      k = 0
      while (k < 4) { m(8 + k) = ((s.getValue >> (8 * k)) & 0xff).toByte
        k += 1 }
      m
    }
    // stream-count mismatch: BCJ2 declaring 3 inputs
    assert(SevenZip.parse(patched(_(at + 5) = 3)) ==
      Left("coder_chain_unsupported"))
    // BCJ2 declared as a SIMPLE coder
    assert(SevenZip.parse(patched(_(at) = 0x04)) ==
      Left("coder_chain_unsupported"))
    // corrupt an rc byte mid-stream (rc sits last in the packed area,
    // right before the header): decode must quarantine, never emit
    // wrong bytes — the folder CRC is the last line of defense
    val mut = blob.clone()
    mut(hdr - 10) = (mut(hdr - 10) ^ 0x41).toByte
    assert(SevenZip.parse(mut).isLeft, "corrupted rc accepted")
  }
}
