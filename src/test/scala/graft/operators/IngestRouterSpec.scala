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

  test("wrapped routes carry the inner text; nesting stops at one layer") {
    val tar = Tar.write(Seq(Tar.TarMember("a.txt", text.getBytes("UTF-8"))))
    val z = UnixCompress.encode(tar)
    assert(IngestRouter.route(z).toOption.get.text == text)
    // a wrapper of a wrapper is a shape worth naming, not recursing into
    assert(IngestRouter.route(Warc.gzipMember(z)) ==
      Left(IngestRouter.Rejected("nested_wrapper")))
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
    // a member that is not UTF-8 must not mojibake into the corpus
    val binTar = Tar.write(Seq(Tar.TarMember("b.bin",
      Array[Byte](0xC3.toByte, 0x28)))) // invalid UTF-8 sequence
    assert(IngestRouter.route(binTar) ==
      Left(IngestRouter.Rejected("member_not_utf8")))
  }
}
