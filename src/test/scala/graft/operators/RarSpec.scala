package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** RAR census contract: both generations roundtrip through the
  * spec-faithful writers, stored bodies extract CRC-verified,
  * compressed/encrypted paths reject or census by name, hostile
  * mutations never escape the named-rejection contract — and the
  * fixture writers are cross-checked against the REAL reader on this
  * system (libarchive's bsdtar lists and extracts both generations). */
class RarSpec extends AnyFunSuite {

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  private val entries = Seq(
    Rar.Entry("docs/a.txt", "stored body one, plain text ".getBytes("UTF-8")),
    Rar.Entry("b.bin", lcg(5000, 3)),
    Rar.Entry("empty.dat", Array.emptyByteArray))

  test("rar4 write/parse roundtrip: stored bodies, dirs, census counts") {
    val blob = Rar.write4(entries, dirs = Seq("docs"))
    val p = Rar.parse(blob).toOption.get
    assert(p.generation == 4 && p.nDirs == 1 && p.nStored == 3 &&
      p.nCompressed == 0)
    val byName = p.members.filterNot(_.isDir).map(m => m.name -> m).toMap
    entries.foreach { e =>
      assert(byName(e.name).body.get.sameElements(e.body), e.name)
      assert(byName(e.name).unpackedSize == e.body.length)
    }
  }

  test("rar5 write/parse roundtrip: stored bodies, dirs, census counts") {
    val blob = Rar.write5(entries, dirs = Seq("docs"))
    val p = Rar.parse(blob).toOption.get
    assert(p.generation == 5 && p.nDirs == 1 && p.nStored == 3 &&
      p.nCompressed == 0)
    val byName = p.members.filterNot(_.isDir).map(m => m.name -> m).toMap
    entries.foreach { e =>
      assert(byName(e.name).body.get.sameElements(e.body), e.name)
    }
  }

  test("compressed members census by method name with no body") {
    for (gen <- Seq(4, 5)) {
      val es = Seq(Rar.Entry("c.txt", lcg(800, 5), markCompressed = true),
        Rar.Entry("s.txt", "stored".getBytes("UTF-8")))
      val blob = if (gen == 4) Rar.write4(es) else Rar.write5(es)
      val p = Rar.parse(blob).toOption.get
      assert(p.nCompressed == 1 && p.nStored == 1, s"gen$gen")
      val c = p.members.find(_.name == "c.txt").get
      assert(c.method == "compress_m1" && c.body.isEmpty, s"gen$gen")
      assert(p.members.find(_.name == "s.txt").get.body.nonEmpty)
    }
  }

  test("encryption rejects by name, both generations") {
    assert(Rar.parse(Rar.write4(entries, encrypted = true)) ==
      Left("rar_encrypted"))
    assert(Rar.parse(Rar.write5(entries, encrypted = true)) ==
      Left("rar_encrypted"))
  }

  test("hostile mutations stay inside the named-rejection contract") {
    for (gen <- Seq(4, 5)) {
      val blob = if (gen == 4) Rar.write4(entries, dirs = Seq("d"))
        else Rar.write5(entries, dirs = Seq("d"))
      val orig = Rar.parse(blob).toOption.get
      // truncations at every suffix
      for (cut <- Seq(3, 8, 20, blob.length / 2, blob.length - 1))
        assert(Rar.parse(blob.take(cut)).isLeft, s"gen$gen cut $cut")
      // single-byte flips: Left or identical census (flips confined to
      // unchecked filler can keep the parse identical, never change it)
      var rejected = 0
      for (pos <- blob.indices by 3) {
        val mut = blob.clone()
        mut(pos) = (mut(pos) ^ 0x41).toByte
        Rar.parse(mut) match {
          case Left(r) =>
            rejected += 1
            assert(r.nonEmpty)
          case Right(p) =>
            assert(p.members.map(m => (m.name, m.body.map(_.toSeq))) ==
              orig.members.map(m => (m.name, m.body.map(_.toSeq))),
              s"gen$gen flip at $pos silently changed the census")
        }
      }
      assert(rejected > blob.length / 8, s"gen$gen fuzz barely rejected")
    }
  }

  test("rar5 vint overflow and bad blocks reject by name") {
    // 10 continuation bytes: the documented vint cap
    val sig = Array(0x52, 0x61, 0x72, 0x21, 0x1A, 0x07, 0x01, 0x00)
      .map(_.toByte)
    val hostile = sig ++ Array.fill[Byte](4)(0) ++ Array.fill[Byte](11)(0x80.toByte)
    assert(Rar.parse(hostile).isLeft)
    assert(Rar.parse("Rar!".getBytes) == Left("not_rar"))
    assert(Rar.parse(Array.emptyByteArray) == Left("not_rar"))
  }

  test("fixture writers are readable by the REAL reader (bsdtar)") {
    val bsdtar = Seq("/root/miniconda/bin/bsdtar", "/usr/bin/bsdtar")
      .find(p => new java.io.File(p).canExecute)
    assume(bsdtar.isDefined, "bsdtar not on this system")
    for (gen <- Seq(4, 5)) {
      val blob = if (gen == 4) Rar.write4(entries, dirs = Seq("docs"))
        else Rar.write5(entries, dirs = Seq("docs"))
      val f = java.io.File.createTempFile(s"graft_rar$gen", ".rar")
      try {
        java.nio.file.Files.write(f.toPath, blob)
        // list: every member name surfaces
        val list = new String(
          new ProcessBuilder(bsdtar.get, "-tf", f.getAbsolutePath)
            .redirectErrorStream(true).start().getInputStream.readAllBytes(),
          "UTF-8")
        entries.foreach(e => assert(list.contains(e.name), s"gen$gen: $list"))
        // extract: stored bodies come back byte-exact through libarchive
        for (e <- entries if e.body.nonEmpty) {
          val proc = new ProcessBuilder(bsdtar.get, "-xOf",
            f.getAbsolutePath, e.name).start()
          val got = proc.getInputStream.readAllBytes()
          assert(proc.waitFor() == 0, s"gen$gen extract ${e.name}")
          assert(got.sameElements(e.body), s"gen$gen body ${e.name}")
        }
      } finally f.delete()
    }
  }
}
