package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ZIP reader contract: bit-exact member roundtrips over stored,
  * deflated, STREAMED (data-descriptor) and forced-zip64 archives, and
  * reject-don't-guess with NAMED fates on every corruption class — a
  * parse must yield the whole archive or a reason, never a partial
  * member list and never an escaped exception.
  */
class ZipArchiveSpec extends AnyFunSuite {

  private def members(n: Int): Seq[ZipArchive.ZipMember] =
    (0 until n).map { i =>
      val body = (s"member $i: " + ("abcdefgh" * (1 + i * 3)) + s" tail$i")
        .getBytes("UTF-8")
      ZipArchive.ZipMember(s"m$i.txt", body)
    }

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def cdStart(blob: Array[Byte]): Int =
    le32(blob, blob.length - 22 + 16).toInt

  test("roundtrip: stored, deflated, and mixed archives are bit-exact") {
    for (pick <- Seq[Int => Boolean](_ => false, _ => true, _ % 2 == 1)) {
      val ms = members(5)
      val blob = ZipArchive.write(ms, pick)
      val got = ZipArchive.parse(blob).toOption.getOrElse(fail("parse failed"))
      assert(got.map(_.name) == ms.map(_.name))
      got.zip(ms).foreach { case (g, w) => assert(g.body.sameElements(w.body)) }
    }
  }

  test("empty and binary bodies roundtrip") {
    val ms = Seq(
      ZipArchive.ZipMember("empty.bin", Array.emptyByteArray),
      ZipArchive.ZipMember("bytes.bin", Array.tabulate(300)(i => (i * 7).toByte)))
    val got = ZipArchive.parse(ZipArchive.write(ms, _ => true)).toOption.get
    assert(got(0).body.isEmpty && got(1).body.sameElements(ms(1).body))
  }

  test("streamed archives (JDK writer, flag bit 3 + data descriptor) parse") {
    val ms = members(4) :+ ZipArchive.ZipMember("empty.txt", Array.emptyByteArray)
    val blob = ZipArchive.writeStreamed(ms)
    // the fixture really is streamed: first local header has bit 3 set
    assert((blob(6) & 0x08) != 0, "JDK streaming writer did not set bit 3")
    val got = ZipArchive.parse(blob).toOption.getOrElse(fail("parse failed"))
    assert(got.map(_.name) == ms.map(_.name))
    got.zip(ms).foreach { case (g, w) => assert(g.body.sameElements(w.body)) }
  }

  test("forced-zip64 streamed archives (EOCD64 + sentinels) parse") {
    val ms = members(3)
    val blob = ZipArchive.writeZip64Streamed(ms)
    // the fixture really is zip64: an EOCD64 record exists
    val sig64 = Array[Byte](0x50, 0x4b, 6, 6)
    assert(blob.sliding(4).exists(_.sameElements(sig64)), "no EOCD64 written")
    val got = ZipArchive.parse(blob).toOption.getOrElse(fail("parse failed"))
    assert(got.map(_.name) == ms.map(_.name))
    got.zip(ms).foreach { case (g, w) => assert(g.body.sameElements(w.body)) }
  }

  test("corruption anywhere quarantines the whole archive") {
    for (blob <- Seq(ZipArchive.write(members(4), _ % 2 == 0),
        ZipArchive.writeStreamed(members(4)),
        ZipArchive.writeZip64Streamed(members(4)))) {
      // truncations at every suffix length: named rejection, no throw
      for (cut <- Seq(1, 4, 21, blob.length / 2, blob.length - 1))
        assert(ZipArchive.parse(blob.take(cut)).isLeft, s"truncation at $cut")
      // single-byte flips across the blob (headers, data, CD, EOCD)
      val orig = ZipArchive.parse(blob).toOption.get
      var rejected = 0
      for (pos <- blob.indices by 7) {
        val mut = blob.clone()
        mut(pos) = (mut(pos) ^ 0x41).toByte
        ZipArchive.parse(mut) match {
          case Left(_) => rejected += 1
          case Right(ms) =>
            // a flip the parser accepts must be confined to a member
            // NAME (names are not CRC-protected)
            assert(ms.map(_.body.toSeq) == orig.map(_.body.toSeq),
              s"flip at $pos silently changed a body")
        }
      }
      assert(rejected > blob.length / 14, "fuzz barely exercised rejects")
    }
  }

  test("CD/local disagreement rejects by name") {
    val blob = ZipArchive.write(members(2), _ => false)
    // local flag bit 3 set without the CD agreeing (and with no
    // descriptor bytes present)
    val dd = blob.clone(); dd(6) = (dd(6) | 0x08).toByte
    assert(ZipArchive.parse(dd) ==
      Left(ZipArchive.Rejected("zip_cd_local_mismatch")))
    // local uncompressed size contradicting the CD truth
    val sz = blob.clone(); sz(22) = (sz(22) ^ 0x1).toByte
    assert(ZipArchive.parse(sz) ==
      Left(ZipArchive.Rejected("zip_cd_local_mismatch")))
  }

  test("encryption rejects by name") {
    val blob = ZipArchive.write(members(2), _ => false)
    val enc = blob.clone()
    enc(6) = (enc(6) | 0x01).toByte // local flags, first member
    val cd = cdStart(blob)
    enc(cd + 8) = (enc(cd + 8) | 0x01).toByte // CD flags, first entry
    assert(ZipArchive.parse(enc) == Left(ZipArchive.Rejected("zip_encrypted")))
  }

  test("declared-size allocation cap rejects before allocating") {
    val blob = ZipArchive.write(members(1), _ => true)
    val cd = cdStart(blob)
    // inflate the CD's declared uncompressed size to 1 GiB
    val big = blob.clone()
    big(cd + 24) = 0; big(cd + 25) = 0; big(cd + 26) = 0; big(cd + 27) = 0x40
    assert(ZipArchive.parse(big) == Left(ZipArchive.Rejected("zip_bomb")))
  }

  test("central-directory count mismatch is rejected") {
    val blob = ZipArchive.write(members(3), _ => false)
    val eocd = blob.length - 22
    val mut = blob.clone()
    mut(eocd + 10) = 9
    assert(ZipArchive.parse(mut).isLeft)
  }

  test("zip64 sentinel without the 0x0001 extra rejects by name") {
    val blob = ZipArchive.write(members(2), _ => false)
    val cd = cdStart(blob)
    val mut = blob.clone()
    // CD usize -> 0xFFFFFFFF with no zip64 extra to resolve it
    mut(cd + 24) = -1; mut(cd + 25) = -1; mut(cd + 26) = -1; mut(cd + 27) = -1
    assert(ZipArchive.parse(mut) ==
      Left(ZipArchive.Rejected("zip64_extra_missing")))
    // EOCD sentinel counts with no EOCD64 locator at all
    val eocd = blob.length - 22
    val mut2 = blob.clone()
    mut2(eocd + 8) = -1; mut2(eocd + 9) = -1
    mut2(eocd + 10) = -1; mut2(eocd + 11) = -1
    assert(ZipArchive.parse(mut2) ==
      Left(ZipArchive.Rejected("zip64_missing_eocd64")))
  }

  test("bytes the CD cannot account for reject as a layout gap") {
    val blob = ZipArchive.write(members(2), _ => false)
    val cd = cdStart(blob)
    // splice 8 junk bytes between the last member and the CD (the
    // shape of a data descriptor written WITHOUT flag bit 3), fixing
    // up the EOCD's CD offset so everything else stays valid
    val out = new java.io.ByteArrayOutputStream()
    out.write(blob, 0, cd)
    out.write(Array.fill[Byte](8)(0x5A))
    out.write(blob, cd, blob.length - cd)
    val mut = out.toByteArray
    val eocd = mut.length - 22
    val newCd = cd + 8
    mut(eocd + 16) = (newCd & 0xff).toByte
    mut(eocd + 17) = ((newCd >> 8) & 0xff).toByte
    mut(eocd + 18) = ((newCd >> 16) & 0xff).toByte
    mut(eocd + 19) = ((newCd >> 24) & 0xff).toByte
    assert(ZipArchive.parse(mut) == Left(ZipArchive.Rejected("zip_layout_gap")))
  }

  test("non-zip blobs stay not_a_container; zip-shaped stay zip_*") {
    assert(ZipArchive.parse("plain text, no zip here".getBytes) ==
      Left(ZipArchive.Rejected("not_a_container")))
    val blob = ZipArchive.write(members(2), _ => false)
    assert(ZipArchive.parse(blob.take(blob.length - 5)) ==
      Left(ZipArchive.Rejected("zip_no_eocd")))
  }

  test("bzip2 and lzma zip methods decode (CPython zipfile fixtures)") {
    // the REAL writer for methods 12/14 on this system is CPython's
    // zipfile (ZIP_BZIP2 / ZIP_LZMA — what 7-Zip also writes); the
    // SqliteSpec shell-out pattern
    assume(new java.io.File("/usr/bin/python3").canExecute ||
      new java.io.File("/root/miniconda/bin/python3").canExecute)
    val f = java.io.File.createTempFile("graft_zipm", ".zip")
    try {
      val py =
        """import sys, zipfile
          |zf = zipfile.ZipFile(sys.argv[1], 'w')
          |data1 = b'bzip2 member body ' * 400
          |data2 = b'lzma member body ' * 300
          |zf.writestr(zipfile.ZipInfo('bz.txt'), data1,
          |            compress_type=zipfile.ZIP_BZIP2)
          |zf.writestr(zipfile.ZipInfo('lz.txt'), data2,
          |            compress_type=zipfile.ZIP_LZMA)
          |zf.writestr(zipfile.ZipInfo('st.txt'), b'stored',
          |            compress_type=zipfile.ZIP_STORED)
          |zf.close()
          |""".stripMargin
      val pr = new ProcessBuilder("python3", "-c", py, f.getAbsolutePath)
        .redirectErrorStream(true).start()
      val log = new String(pr.getInputStream.readAllBytes(), "UTF-8")
      assert(pr.waitFor() == 0, s"python zip writer failed: $log")
      val blob = java.nio.file.Files.readAllBytes(f.toPath)
      val got = ZipArchive.parse(blob) match {
        case Right(ms) => ms
        case Left(r) => fail(s"parse failed: ${r.reason}")
      }
      val byName = got.map(m => m.name -> m.body).toMap
      assert(byName("bz.txt").sameElements(
        ("bzip2 member body " * 400).getBytes("US-ASCII")))
      assert(byName("lz.txt").sameElements(
        ("lzma member body " * 300).getBytes("US-ASCII")))
      assert(byName("st.txt").sameElements("stored".getBytes("US-ASCII")))
    } finally f.delete()
  }

  test("a DOCX repacked by a streaming writer routes and extracts") {
    val docx = Docx.write(Seq("streamed body", "second paragraph"))
    val membersIn = ZipArchive.parse(docx).toOption.get
    val streamed = ZipArchive.writeStreamed(membersIn)
    assert((streamed(6) & 0x08) != 0)
    OfficeRouter.route(streamed) match {
      case Right(r) =>
        assert(r.format == "docx" && r.text.contains("streamed body"))
      case Left(r) => fail(s"router rejected streamed docx: ${r.reason}")
    }
    // and the zip64 repack of the same package
    OfficeRouter.route(ZipArchive.writeZip64Streamed(membersIn)) match {
      case Right(r) => assert(r.format == "docx")
      case Left(r) => fail(s"router rejected zip64 docx: ${r.reason}")
    }
  }
}
