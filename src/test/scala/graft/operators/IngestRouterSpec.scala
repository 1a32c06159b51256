package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Generic ingest dispatch: every container family the engine owns is
  * reachable from ONE front door, each parser's named fate surfaces
  * unchanged, and compression wrappers unwrap exactly one layer. */
class IngestRouterSpec extends AnyFunSuite {

  private val text = "ingest router body text, shared by every fixture"

  test("each family routes to its owning parser with natural units") {
    val tar = Tar.write(Seq(Tar.TarMember("a.txt", text.getBytes("UTF-8")),
      Tar.TarMember("b.txt", "second".getBytes("UTF-8"))))
    val cases: Seq[(String, Array[Byte], String, Long)] = Seq(
      ("rar4", Rar.write4(Seq(Rar.Entry("a.txt", text.getBytes("UTF-8")))),
        "rar4", 1L),
      ("rar5", Rar.write5(Seq(Rar.Entry("a.txt", text.getBytes("UTF-8")))),
        "rar5", 1L),
      ("sqlite", Sqlite.write(Seq("docs" -> Seq(text))), "sqlite", 1L),
      ("tar", tar, "tar", 2L),
      ("tar.Z", UnixCompress.encode(tar), "tar.Z", 2L),
      ("tar.gz", Warc.gzipMember(tar), "tar.gz", 2L),
      ("tar.zst", {
        val bos = new java.io.ByteArrayOutputStream()
        val z = new com.github.luben.zstd.ZstdOutputStream(bos)
        z.write(tar); z.close(); bos.toByteArray
      }, "tar.zst", 2L),
      ("zip(docx)", Docx.write(Seq(text)), "docx", 2L))
    cases.foreach { case (label, blob, format, units) =>
      IngestRouter.route(blob) match {
        case Right(r) =>
          assert(r.format == format, s"$label -> ${r.format}")
          assert(r.units == units, s"$label units ${r.units}")
        case Left(r) => fail(s"$label rejected: ${r.reason}")
      }
    }
  }

  test("wrapped routes carry the inner text; nesting stops at the budget") {
    val tar = Tar.write(Seq(Tar.TarMember("a.txt", text.getBytes("UTF-8"))))
    val z = UnixCompress.encode(tar)
    assert(IngestRouter.route(z).toOption.get.text == text)
    // wrapper-of-wrapper is the real population (double-gzipped logs,
    // re-wrapped mirrors): bounded recursion, formats compose
    val zz = IngestRouter.route(Warc.gzipMember(z)).toOption.get
    assert(zz.format == "tar.Z.gz" && zz.text == text)
    // three hops spent on wrappers: the tar still routes but its
    // member sits past the shared budget — per-member NAMED fate,
    // text never surfaces (wrapper layers and member recursion spend
    // the SAME budget since r16's member routing)
    val zzz = IngestRouter.route(Warc.gzipMember(Warc.gzipMember(z)))
      .toOption.get
    assert(zzz.format == "tar.Z.gz.gz" && zzz.text == "")
    assert(zzz.memberFates == Seq("a.txt!wrapper_depth_exceeded"))
    // one layer past the budget at the WRAPPER level: whole-blob fate
    assert(IngestRouter.route(
      Warc.gzipMember(Warc.gzipMember(Warc.gzipMember(z)))) ==
      Left(IngestRouter.Rejected("wrapper_depth_exceeded")))
  }

  test("wrapped plain text routes as text below the top level") {
    // .txt.gz — the most common wild wrapper payload
    val g = IngestRouter.route(Warc.gzipMember(text.getBytes("UTF-8")))
      .toOption.get
    assert(g.format == "text.gz" && g.text == text && g.units == 1L)
    // but a BARE text blob at the top stays not_a_container: the
    // census must not claim containment it didn't find
    assert(IngestRouter.route(text.getBytes("UTF-8")) ==
      Left(IngestRouter.Rejected("not_a_container")))
  }

  test("a data zip censuses per member through the full dispatch") {
    val tar = Tar.write(Seq(Tar.TarMember("in.txt", "tarred".getBytes("UTF-8"))))
    val zip = ZipArchive.write(Seq(
      ZipArchive.ZipMember("notes.txt", text.getBytes("UTF-8")),
      ZipArchive.ZipMember("db.sqlite",
        Sqlite.write(Seq("docs" -> Seq("row body")))),
      ZipArchive.ZipMember("bundle.tar.gz", Warc.gzipMember(tar)),
      ZipArchive.ZipMember("word.docx", Docx.write(Seq("docx para"))),
      ZipArchive.ZipMember("junk.bin", Array[Byte](0xC3.toByte, 0x28, 1, 2)),
      ZipArchive.ZipMember("inner.zip", ZipArchive.write(Seq(
        ZipArchive.ZipMember("deep.txt", "deep text".getBytes("UTF-8"))),
        _ => false))), _ => false)
    val r = IngestRouter.route(zip).toOption.getOrElse(fail("zip rejected"))
    assert(r.format == "zip" && r.units == 6L)
    assert(r.memberFates == Seq(
      "notes.txt=text",
      "db.sqlite=sqlite",
      "bundle.tar.gz=tar.gz",
      "word.docx=docx", // office-first survives one level down
      "junk.bin!member_not_utf8",
      "inner.zip=zip"))
    // member texts concatenate in member order, each format's natural
    // text: body / schema SQL / inner member bodies / paragraphs (the
    // docx writer plants an empty field-code paragraph, hence "\ndocx")
    assert(r.text == Seq(text,
      "CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT)",
      "tarred", "\ndocx para", "deep text").mkString("\n"))
  }

  test("zip-of-zip nesting shares the wrapper depth budget") {
    def zipN(k: Int): Array[Byte] =
      if (k == 1) ZipArchive.write(Seq(ZipArchive.ZipMember("deep.txt",
        "nested payload".getBytes("UTF-8"))), _ => false)
      else ZipArchive.write(Seq(ZipArchive.ZipMember(s"level$k.zip",
        zipN(k - 1))), _ => false)
    // member hops 1..3 reach the innermost text
    assert(IngestRouter.route(zipN(3)).toOption.get.text == "nested payload")
    // one more level: the zips still route, but the member past the
    // budget carries the named fate and its text never surfaces
    val r4 = IngestRouter.route(zipN(4)).toOption.get
    assert(r4.format == "zip" && r4.text == "")
    assert(r4.memberFates == Seq("level4.zip=zip"))
  }

  test("cumulative member bytes charge one budget: ingest_bomb") {
    val big = Array.fill[Byte](4096)('a')
    val zip = ZipArchive.write(
      (1 to 8).map(i => ZipArchive.ZipMember(s"m$i.txt", big)), _ => false)
    assert(IngestRouter.route(zip, maxOut = 16 * 1024) ==
      Left(IngestRouter.Rejected("ingest_bomb")))
    // under the budget the same shape routes
    assert(IngestRouter.route(zip).toOption.get.units == 8L)
  }

  test("parser fates pass through unchanged") {
    // rar encryption
    assert(IngestRouter.route(
      Rar.write4(Seq(Rar.Entry("a", "x".getBytes)), encrypted = true)) ==
      Left(IngestRouter.Rejected("rar_encrypted")))
    // zip truncation (EOCD gone)
    val zip = ZipArchive.write(
      Seq(ZipArchive.ZipMember("a.txt", text.getBytes("UTF-8"))), _ => true)
    assert(IngestRouter.route(zip.dropRight(5)) ==
      Left(IngestRouter.Rejected("zip_no_eocd")))
    // plain bytes
    assert(IngestRouter.route("just some text".getBytes) ==
      Left(IngestRouter.Rejected("not_a_container")))
    // a member that is not UTF-8 must not mojibake into the corpus —
    // since r16 it carries a PER-MEMBER fate instead of killing the tar
    val binTar = Tar.write(Seq(
      Tar.TarMember("a.txt", "fine".getBytes("UTF-8")),
      Tar.TarMember("b.bin", Array[Byte](0xC3.toByte, 0x28, 1, 2))))
    val bt = IngestRouter.route(binTar).toOption.get
    assert(bt.format == "tar" && bt.text == "fine")
    assert(bt.memberFates == Seq("a.txt=text", "b.bin!member_not_utf8"))
  }

  test("tar / 7z / rar members route through the full dispatch") {
    // tar of DATA blobs: sqlite + a zip + plain text
    val dataTar = Tar.write(Seq(
      Tar.TarMember("db.sqlite", Sqlite.write(Seq("docs" -> Seq("row")))),
      Tar.TarMember("bundle.zip", ZipArchive.write(Seq(
        ZipArchive.ZipMember("inner.txt", "zipped".getBytes("UTF-8"))),
        _ => true)),
      Tar.TarMember("notes.txt", text.getBytes("UTF-8"))))
    val t = IngestRouter.route(dataTar).toOption.get
    assert(t.format == "tar" && t.units == 3L)
    assert(t.memberFates == Seq("db.sqlite=sqlite", "bundle.zip=zip",
      "notes.txt=text"))
    assert(t.text == Seq(
      "CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT)",
      "zipped", text).mkString("\n"))
    // 7z (BCJ2 wire shape) of a sqlite member: double seam coverage
    val sevenZ = SevenZip.writeBcj2(Seq(
      "db.sqlite" -> Sqlite.write(Seq("t7" -> Seq("seven")))))
    val s7 = IngestRouter.route(sevenZ).toOption.get
    assert(s7.format == "7z" && s7.memberFates == Seq("db.sqlite=sqlite"))
    assert(s7.text ==
      "CREATE TABLE t7 (id INTEGER PRIMARY KEY, body TEXT)")
    // rar with a compressed (census-only) member: named per-member fate
    val rar = Rar.write5(Seq(
      Rar.Entry("kept.txt", "stored body".getBytes("UTF-8")),
      Rar.Entry("packed.bin", "x".getBytes("UTF-8"), markCompressed = true)))
    val r = IngestRouter.route(rar).toOption.get
    assert(r.format == "rar5" && r.text == "stored body")
    assert(r.memberFates ==
      Seq("kept.txt=text", "packed.bin!member_not_extracted"))
  }
}
