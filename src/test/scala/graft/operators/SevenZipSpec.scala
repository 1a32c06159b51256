package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** 7z container walk against the REAL generator on the classpath:
  * commons-compress SevenZOutputFile (LZMA2 through xz-java, plus
  * COPY and LZMA1 content methods, and delta/BCJ chains for the
  * named-rejection paths). */
class SevenZipSpec extends AnyFunSuite {

  import org.apache.commons.compress.archivers.sevenz._
  import org.apache.commons.compress.utils.SeekableInMemoryByteChannel

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  private def write7z(entries: Seq[(String, Array[Byte])],
      methods: Seq[SevenZMethod] = Seq(SevenZMethod.LZMA2),
      withDir: Boolean = false): Array[Byte] = {
    val ch = new SeekableInMemoryByteChannel()
    val z = new SevenZOutputFile(ch)
    z.setContentMethods(java.util.Arrays.asList(
      methods.map(new SevenZMethodConfiguration(_)): _*))
    if (withDir) {
      val d = new SevenZArchiveEntry()
      d.setName("subdir")
      d.setDirectory(true)
      z.putArchiveEntry(d)
      z.closeArchiveEntry()
    }
    entries.foreach { case (name, body) =>
      val e = new SevenZArchiveEntry()
      e.setName(name)
      z.putArchiveEntry(e)
      z.write(body)
      z.closeArchiveEntry()
    }
    z.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }

  test("lzma2 archives from the real generator round-trip byte-exact") {
    val entries = Seq(
      "a.txt" -> "seven zip body text, compressible ".getBytes("UTF-8"),
      "b.bin" -> lcg(70000, 3),
      "empty.txt" -> Array.emptyByteArray,
      "c/d.dat" -> lcg(500, 9))
    val blob = write7z(entries)
    val p = SevenZip.parse(blob).toOption.get
    assert(p.codecs == Set("lzma2") || p.codecs == Set("lzma2", "copy"))
    assert(p.nEmptyFiles == 1)
    val byName = p.members.map(m => m.name -> m.body).toMap
    entries.foreach { case (name, body) =>
      assert(byName(name).sameElements(body), name)
    }
  }

  test("copy and lzma1 content methods decode; dirs counted") {
    for (m <- Seq(SevenZMethod.COPY, SevenZMethod.LZMA)) {
      val entries = Seq("x.bin" -> lcg(5000, 4), "y.txt" ->
        ("text payload " * 100).getBytes("UTF-8"))
      val blob = write7z(entries, methods = Seq(m), withDir = true)
      val p = SevenZip.parse(blob).toOption.get
      assert(p.nDirs == 1, m)
      val byName = p.members.map(mm => mm.name -> mm.body).toMap
      entries.foreach { case (name, body) =>
        assert(byName(name).sameElements(body), s"$m/$name")
      }
    }
  }

  test("BCJ/delta + LZMA2 coder chains decode byte-exact") {
    val filters = Seq(
      SevenZMethod.BCJ_X86_FILTER -> "bcj_x86",
      SevenZMethod.BCJ_ARM_FILTER -> "bcj_arm",
      SevenZMethod.BCJ_ARM_THUMB_FILTER -> "bcj_armt",
      SevenZMethod.BCJ_PPC_FILTER -> "bcj_ppc",
      SevenZMethod.BCJ_SPARC_FILTER -> "bcj_sparc",
      SevenZMethod.BCJ_IA64_FILTER -> "bcj_ia64",
      SevenZMethod.DELTA_FILTER -> "delta")
    for ((f, name) <- filters) {
      // executable-shaped payload: dense relative-branch opcodes so
      // the filter actually rewrites bytes (a no-op transform would
      // hide a broken chain)
      val body = lcg(30000, 11).zipWithIndex.map { case (b, i) =>
        if (i % 5 == 0) 0xE8.toByte else b
      }
      val entries = Seq("prog.bin" -> body,
        "t.txt" -> ("chain body " * 50).getBytes("UTF-8"))
      val blob = write7z(entries, methods = Seq(f, SevenZMethod.LZMA2))
      SevenZip.parse(blob) match {
        case Right(p) =>
          assert(p.codecs.contains("lzma2") && p.codecs.contains(name),
            s"$name codecs=${p.codecs}")
          val byName = p.members.map(m => m.name -> m.body).toMap
          entries.foreach { case (n, b) =>
            assert(byName(n).sameElements(b), s"$name/$n")
          }
        case Left(r) => fail(s"$name chain rejected: $r")
      }
    }
  }

  test("reversed chains, long chains, unsupported codecs reject by name") {
    val entries = Seq("x.bin" -> lcg(3000, 5))
    // compressor-then-filter: the shape no real writer produces — the
    // packed stream would feed the FILTER first
    val reversed = write7z(entries,
      methods = Seq(SevenZMethod.LZMA2, SevenZMethod.BCJ_X86_FILTER))
    assert(SevenZip.parse(reversed) == Left("coder_chain_order_unsupported"))
    // three coders stays out of scope by name
    val long = write7z(entries, methods = Seq(SevenZMethod.DELTA_FILTER,
      SevenZMethod.BCJ_X86_FILTER, SevenZMethod.LZMA2))
    assert(SevenZip.parse(long) == Left("coder_chain_unsupported"))
    val bz = write7z(entries, methods = Seq(SevenZMethod.BZIP2))
    assert(SevenZip.parse(bz) match {
      case Left(r) => r.startsWith("codec_unsupported_")
      case _ => false
    })
  }

  test("unknown filter id in a chain rejects by name") {
    // patch the x86 filter's coder id (03 03 01 03) to a nonexistent
    // one and re-seal both header CRCs — the reader must name the id,
    // not guess a transform
    val blob = write7z(Seq("x.bin" -> lcg(2000, 13)),
      methods = Seq(SevenZMethod.BCJ_X86_FILTER, SevenZMethod.LZMA2))
    def le64(b: Array[Byte], p: Int): Long =
      (0 until 8).map(k => (b(p + k) & 0xffL) << (8 * k)).reduce(_ | _)
    val hStart = (32 + le64(blob, 12)).toInt
    val hLen = le64(blob, 20).toInt
    val mut = blob.clone()
    var patched = false
    var i = hStart
    while (i < hStart + hLen - 4 && !patched) {
      if (mut(i) == 0x03 && mut(i + 1) == 0x03 && mut(i + 2) == 0x01 &&
        mut(i + 3) == 0x03) {
        mut(i + 2) = 0x09
        patched = true
      }
      i += 1
    }
    assert(patched, "filter id not found in plain header")
    val c = new java.util.zip.CRC32()
    c.update(mut, hStart, hLen)
    for (k <- 0 until 4) mut(28 + k) = ((c.getValue >> (8 * k)) & 0xff).toByte
    val sc = new java.util.zip.CRC32()
    sc.update(mut, 12, 20)
    for (k <- 0 until 4) mut(8 + k) = ((sc.getValue >> (8 * k)) & 0xff).toByte
    assert(SevenZip.parse(mut) == Left("codec_unsupported_03030903"))
  }

  test("hostile archives reject with named reasons") {
    val good = write7z(Seq("a.txt" -> lcg(2000, 7)))
    assert(SevenZip.parse("not an archive".getBytes) == Left("not_7z"))
    assert(SevenZip.parse(java.util.Arrays.copyOf(good, 20)) ==
      Left("truncated_7z"))
    // flip a byte inside the next header: CRC must catch it
    val hdr = good.clone()
    hdr(hdr.length - 3) = (hdr(hdr.length - 3) ^ 0x41).toByte
    assert(SevenZip.parse(hdr) == Left("header_crc_mismatch"))
    // flip a byte in the packed payload: folder/substream CRC catches
    val pay = good.clone()
    pay(40) = (pay(40) ^ 0x41).toByte
    assert(SevenZip.parse(pay) match {
      case Left(r) => r == "substream_crc_mismatch" ||
        r == "folder_crc_mismatch" || r.startsWith("bad_") ||
        r.contains("lzma")
      case _ => false
    })
    // start-header CRC over the offsets
    val sh = good.clone()
    sh(16) = (sh(16) ^ 1).toByte
    assert(SevenZip.parse(sh) == Left("start_header_crc_mismatch"))
    // bomb cap
    val big = write7z(Seq("big.bin" -> Array.fill[Byte](200000)(7)))
    assert(SevenZip.parse(big, maxOut = 1000) == Left("7z_bomb"))
  }
}
