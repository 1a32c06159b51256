package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Mutation fuzz over every round-15 parser: the CD-first zip reader
  * (all three wire shapes — in-house, JDK streamed data-descriptor,
  * forced zip64), both RAR generations, the LZO1X block decoder, and
  * the generic ingest router's wrapper path. Same contract as
  * Round14FuzzSpec: hostile bytes produce an Either, never an escaped
  * exception. */
class Round15FuzzSpec extends AnyFunSuite {

  private val rounds = 400

  private def mutations(seedBlob: Array[Byte], seed: Int)
      : Iterator[Array[Byte]] = {
    var s = seed
    def next(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    Iterator.tabulate(rounds) { _ =>
      val b = seedBlob.clone()
      next() % 4 match {
        case 0 =>
          val n = 1 + next() % 8
          (0 until n).foreach { _ =>
            if (b.length > 0) {
              val at = next() % b.length
              b(at) = (b(at) ^ (1 + next() % 255)).toByte
            }
          }
          b
        case 1 =>
          java.util.Arrays.copyOf(b, next() % (b.length + 1))
        case 2 =>
          b ++ Array.fill[Byte](1 + next() % 64)((next() % 256).toByte)
        case _ =>
          if (b.length < 40) b
          else {
            val len = 4 + next() % 16
            val from = next() % (b.length - len)
            val to = next() % (b.length - len)
            System.arraycopy(b, from, b, to, len)
            b
          }
      }
    }
  }

  private def assertTotal[L, R](name: String, seedBlob: Array[Byte],
      parse: Array[Byte] => Either[L, R], seed: Int): Unit = {
    assert(parse(seedBlob).isRight, s"$name: seed fixture must parse")
    mutations(seedBlob, seed).zipWithIndex.foreach { case (m, i) =>
      try parse(m)
      catch {
        case e: Throwable =>
          fail(s"$name mutation #$i escaped the Either: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }

  private val members = (0 until 4).map { i =>
    ZipArchive.ZipMember(s"doc-$i.txt",
      (s"fuzz member $i " + ("payload " * (3 + i * 5))).getBytes("UTF-8"))
  }

  test("zip parse is total under mutation (in-house writer)") {
    assertTotal("zip", ZipArchive.write(members, _ % 2 == 0),
      ZipArchive.parse, 151)
  }

  test("zip parse is total under mutation (JDK streamed writer)") {
    assertTotal("zip-streamed", ZipArchive.writeStreamed(members),
      ZipArchive.parse, 152)
  }

  test("zip parse is total under mutation (forced zip64 writer)") {
    assertTotal("zip64", ZipArchive.writeZip64Streamed(members),
      ZipArchive.parse, 153)
  }

  test("rar4 parse is total under mutation") {
    assertTotal("rar4",
      Rar.write4(members.map(m => Rar.Entry(m.name, m.body)),
        dirs = Seq("d")),
      (b: Array[Byte]) => Rar.parse(b), 154)
  }

  test("rar5 parse is total under mutation") {
    assertTotal("rar5",
      Rar.write5(members.map(m => Rar.Entry(m.name, m.body)),
        dirs = Seq("d")),
      (b: Array[Byte]) => Rar.parse(b), 155)
  }

  test("lzo decode is total under mutation") {
    val c = new io.airlift.compress.lzo.LzoCompressor()
    val src = ("lzo fuzz corpus " * 400).getBytes("UTF-8")
    val buf = new Array[Byte](c.maxCompressedLength(src.length))
    val m = c.compress(src, 0, src.length, buf, 0, buf.length)
    assertTotal("lzo", java.util.Arrays.copyOf(buf, m),
      (b: Array[Byte]) => Lzo.rawDecode(b, 0, b.length, 1 << 26), 156)
  }

  test("ingest router is total under mutation (tar.Z wrapper path)") {
    val tar = Tar.write(members.map(m => Tar.TarMember(m.name, m.body)))
    assertTotal("ingest-tar.Z", UnixCompress.encode(tar),
      (b: Array[Byte]) => IngestRouter.route(b), 157)
  }

  test("xz decode is total under mutation (riscv chain streams)") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.tukaani.xz.XZOutputStream(bos,
      Array[org.tukaani.xz.FilterOptions](
        new org.tukaani.xz.RISCVOptions(),
        new org.tukaani.xz.LZMA2Options(3)))
    // trigger-dense payload so mutations land inside converted regions
    var s = 42
    val payload = Array.fill[Byte](8000) {
      s = s * 1103515245 + 12345
      (Seq(0xEF, 0x17, 0x97, 0x03, 0x00, (s >>> 16) & 0xff)((s >>> 8) & 0x3)
        & 0xff).toByte
    }
    z.write(payload); z.close()
    assertTotal("xz-riscv", bos.toByteArray,
      (b: Array[Byte]) => Xz.decode(b), 158)
  }
}
