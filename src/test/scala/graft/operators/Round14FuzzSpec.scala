package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Mutation fuzz over every round-14 parser: the reject-don't-guess
  * contract says hostile bytes produce a NAMED Left, never an escaped
  * exception — exactly the defect class the round-13 advice found in
  * Snappy/Heif (bounds misses surfacing as uncaught
  * IndexOutOfBounds). Each format's own writer provides a valid
  * seed; seeded byte flips, truncations, extensions, and splices
  * must all come back as Either values. */
class Round14FuzzSpec extends AnyFunSuite {

  private val rounds = 400

  private def mutations(seedBlob: Array[Byte], seed: Int)
      : Iterator[Array[Byte]] = {
    var s = seed
    def next(): Int = { s = s * 1103515245 + 12345; (s >>> 16) & 0x7fff }
    Iterator.tabulate(rounds) { _ =>
      val b = seedBlob.clone()
      next() % 4 match {
        case 0 => // byte flips (1..8)
          val n = 1 + next() % 8
          (0 until n).foreach { _ =>
            if (b.length > 0) {
              val at = next() % b.length
              b(at) = (b(at) ^ (1 + next() % 255)).toByte
            }
          }
          b
        case 1 => // truncation
          java.util.Arrays.copyOf(b, next() % (b.length + 1))
        case 2 => // extension with junk
          b ++ Array.fill[Byte](1 + next() % 64)((next() % 256).toByte)
        case _ => // splice: move a window to another offset
          if (b.length < 40) b // window arithmetic needs headroom
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

  test("cfb parse is total under mutation") {
    val blob = Cfb.write(Seq("A" -> Array.tabulate[Byte](900)(_.toByte),
      "B" -> Array.tabulate[Byte](5000)(i => (i * 7).toByte)))
    assertTotal("cfb", blob, Cfb.parse(_: Array[Byte]), 11)
  }

  test("doc extract is total under mutation") {
    val blob = Doc.write(Seq("first paragraph body", "tail two"))
    assertTotal("doc", blob, Doc.extract(_: Array[Byte]), 13)
  }

  test("xls extract is total under mutation") {
    val blob = Xls.write(Seq("S1", "S2"), Seq("shared one", "two"),
      Seq(1.25), labelsPerSheet = 2)
    assertTotal("xls", blob, Xls.extract(_: Array[Byte]), 17)
  }

  test("ppt extract is total under mutation") {
    val blob = Ppt.write(Seq("slide alpha", "slide beta"))
    assertTotal("ppt", blob, Ppt.extract(_: Array[Byte]), 19)
  }

  test("ebml census is total under mutation") {
    val blob = Ebml.write(webm = true, 320, 240, withAudio = true,
      nClusters = 2, blocksPerCluster = 2, payloadLen = 40, seed = 5)
    assertTotal("ebml", blob, Ebml.census(_: Array[Byte]), 23)
  }

  test("ogg census is total under mutation") {
    val blob = Ogg.write(opus = true, serial = 3, channels = 2,
      sampleRate = 48000, comments = Seq("A" -> "b"), nAudioPages = 2,
      packetsPerPage = 2, payloadLen = 60, seed = 7)
    assertTotal("ogg", blob, Ogg.census(_: Array[Byte]), 29)
  }

  test("7z parse is total under mutation") {
    val ch = new org.apache.commons.compress.utils
      .SeekableInMemoryByteChannel()
    val z = new org.apache.commons.compress.archivers.sevenz
      .SevenZOutputFile(ch)
    val e = new org.apache.commons.compress.archivers.sevenz
      .SevenZArchiveEntry()
    e.setName("m.bin")
    z.putArchiveEntry(e)
    z.write(Array.tabulate[Byte](3000)(i => (i * 11).toByte))
    z.closeArchiveEntry()
    z.close()
    val blob = java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
    assertTotal("7z", blob, SevenZip.parse(_: Array[Byte]), 31)
  }

  test("unix compress decode is total under mutation") {
    val blob = UnixCompress.encode(
      ("lzw fuzz body " * 400).getBytes("UTF-8"), 12)
    assertTotal("compress", blob,
      UnixCompress.decode(_: Array[Byte], 1 << 22), 37)
  }

  test("sqlite parse is total under mutation") {
    val blob = Sqlite.write(Seq(
      "a" -> Seq("row one body", "two"), "b" -> Seq("three")))
    assertTotal("sqlite", blob, Sqlite.parse(_: Array[Byte]), 41)
  }

  test("parquet footer census is total under mutation") {
    val dir = new java.io.File("/root/testdata/sf0.001/region.parquet")
    val f =
      if (dir.isDirectory)
        dir.listFiles().filter(_.getName.endsWith(".parquet")).head
      else dir
    val blob = java.nio.file.Files.readAllBytes(f.toPath)
    assertTotal("parquet", blob, ParquetFooter.census(_: Array[Byte]), 43)
  }
}
