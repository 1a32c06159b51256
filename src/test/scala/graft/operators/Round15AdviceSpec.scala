package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Round-15 ADVICE regressions: each test crafts the exact hostile
  * input the advisory described and asserts the parser QUARANTINES by
  * name instead of letting an unchecked exception (AIOOBE / SOE /
  * negative-length) escape the Bail-only catch. */
class Round15AdviceSpec extends AnyFunSuite {

  // ---- 7z: nextOff near 2^63 overflows the bounds sum ---------------
  private def tiny7z(): Array[Byte] = {
    import org.apache.commons.compress.archivers.sevenz._
    import org.apache.commons.compress.utils.SeekableInMemoryByteChannel
    val ch = new SeekableInMemoryByteChannel()
    val z = new SevenZOutputFile(ch)
    z.setContentMethods(java.util.Arrays.asList(
      new SevenZMethodConfiguration(SevenZMethod.LZMA2)))
    val e = new SevenZArchiveEntry()
    e.setName("a.txt"); e.setDirectory(false)
    z.putArchiveEntry(e)
    z.write("seven zip advice regression".getBytes("UTF-8"))
    z.closeArchiveEntry()
    z.close()
    java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
  }

  private def patchStartHeader(blob: Array[Byte], nextOff: Long): Array[Byte] = {
    val out = blob.clone()
    var k = 0
    while (k < 8) { out(12 + k) = ((nextOff >> (8 * k)) & 0xff).toByte; k += 1 }
    val c = new java.util.zip.CRC32()
    c.update(out, 12, 20)
    val crc = c.getValue
    k = 0
    while (k < 4) { out(8 + k) = ((crc >> (8 * k)) & 0xff).toByte; k += 1 }
    out
  }

  test("7z: nextOff near 2^63 quarantines instead of wrapping the sum") {
    val blob = tiny7z()
    assert(SevenZip.parse(blob).isRight) // fixture sane
    val hostile = patchStartHeader(blob, Long.MaxValue - 64)
    assert(SevenZip.parse(hostile) == Left("truncated_7z"))
    val hostile2 = patchStartHeader(blob, (1L << 62) + 17)
    assert(SevenZip.parse(hostile2) == Left("truncated_7z"))
  }

  test("7z: kEncodedHeader without kPackInfo bails by name") {
    // hand-built next header: KEncodedHeader with ONLY kUnpackInfo —
    // packSizes stays empty, so indexing packSizes(0) must not run
    val hdr = Array[Int](
      23, // KEncodedHeader
      7, // kUnpackInfo
      11, // kFolder
      1, // numFolders
      0, // not external
      1, 0x01, 0x00, // one coder: idSize 1, id 0x00 (copy)
      12, 4, // kCodersUnpackSize, size 4
      0, // KEnd (unpack info)
      0 // KEnd (streams info)
    ).map(_.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x37, 0x7A, 0xBC, 0xAF, 0x27, 0x1C, 0, 4).map(_.toByte))
    val tail = new Array[Byte](24)
    // nextOff = 0, nextSize = hdr.length, nextCrc = crc32(hdr)
    tail(8) = hdr.length.toByte
    val hc = new java.util.zip.CRC32(); hc.update(hdr)
    var k = 0
    while (k < 4) { tail(16 + k) = ((hc.getValue >> (8 * k)) & 0xff).toByte; k += 1 }
    val sc = new java.util.zip.CRC32(); sc.update(tail, 0, 20)
    val head = new Array[Byte](4)
    k = 0
    while (k < 4) { head(k) = ((sc.getValue >> (8 * k)) & 0xff).toByte; k += 1 }
    out.write(head); out.write(tail, 0, 20); out.write(hdr)
    assert(SevenZip.parse(out.toByteArray) == Left("bad_encoded_header"))
  }

  // ---- sqlite: serial type ~2^33 wraps the narrowed length ----------
  test("sqlite: overflowing text serial type quarantines by name") {
    def varint(v: Long): Array[Byte] = {
      if (v < 0x80) Array(v.toByte)
      else {
        val out = Seq.newBuilder[Byte]
        var shift = 63 / 7 * 7
        var started = false
        while (shift > 0) {
          val part = ((v >>> shift) & 0x7f).toInt
          if (part != 0 || started) { out += (part | 0x80).toByte; started = true }
          shift -= 7
        }
        out += (v & 0x7f).toByte
        out.result().toArray
      }
    }
    // serial type whose (t-13)/2 has low 32 bits negative-as-Int
    val t = 13L + 2L * 0xFFFFFFF0L
    val typeB = varint(t)
    val record = Array((1 + typeB.length).toByte) ++ typeB
    val cell = varint(record.length.toLong) ++ varint(1L) ++ record
    val db = new Array[Byte](512)
    val magic = "SQLite format 3".getBytes("US-ASCII") :+ 0.toByte
    System.arraycopy(magic, 0, db, 0, 16)
    db(16) = 2; db(17) = 0 // page size 512
    db(18) = 1; db(19) = 1
    db(21) = 64; db(22) = 32; db(23) = 32
    db(27) = 1; db(31) = 1 // change counter 1, page count 1
    db(47) = 1 // schema format
    db(59) = 1 // text encoding utf-8 at 56
    db(95) = 1 // version-valid-for == change counter
    db(100) = 13 // table leaf
    db(104) = 1 // one cell
    val cellAt = 512 - cell.length
    System.arraycopy(cell, 0, db, cellAt, cell.length)
    db(105) = (cellAt >> 8).toByte; db(106) = cellAt.toByte // content start
    db(108) = (cellAt >> 8).toByte; db(109) = cellAt.toByte // cell ptr
    assert(Sqlite.parse(db) == Left("truncated_record"))
  }

  // ---- xls: short Number record at the stream's end ------------------
  test("xls: Number record with len < 14 bails instead of overrunning") {
    val out = new java.io.ByteArrayOutputStream()
    def rec(typ: Int, body: Array[Byte]): Unit = {
      out.write(typ & 0xff); out.write((typ >> 8) & 0xff)
      out.write(body.length & 0xff); out.write((body.length >> 8) & 0xff)
      out.write(body)
    }
    rec(0x0809, Array[Byte](0, 6, 5, 0) ++ new Array[Byte](12)) // BOF globals
    rec(0x0203, new Array[Byte](10)) // Number, 4 bytes short, at stream end
    val blob = Cfb.write(Seq("Workbook" -> out.toByteArray))
    assert(Xls.extract(blob) == Left(Xls.Rejected("truncated_record")))
  }

  // ---- parquet: list-of-list-of-... drives unbounded recursion -------
  test("parquet footer: nested-list footer bails thrift_too_deep") {
    val depth = 200000
    val footer = new Array[Byte](1 + depth)
    java.util.Arrays.fill(footer, 0x19.toByte) // field head, then list heads
    val out = new java.io.ByteArrayOutputStream()
    out.write("PAR1".getBytes("US-ASCII"))
    out.write(footer)
    var k = 0
    while (k < 4) { out.write((footer.length >> (8 * k)) & 0xff); k += 1 }
    out.write("PAR1".getBytes("US-ASCII"))
    assert(ParquetFooter.census(out.toByteArray) == Left("thrift_too_deep"))
  }

  // ---- doc: ccpText bomb cap threads through the router path ---------
  test("doc: ccpText above maxOut quarantines as doc_text_bomb") {
    val blob = Doc.write(Seq("a paragraph long enough to exceed a tiny cap",
      "and another one to be safe"))
    assert(Doc.extract(blob).isRight) // fixture sane at the default cap
    // the whole-file path trips the container-level cap first (also a
    // named fate); the doc-level cap is exercised via the router path
    assert(Doc.extract(blob, maxOut = 16) == Left(Doc.Rejected("cfb_cfb_bomb")))
    Cfb.parse(blob) match {
      case Right(parsed) =>
        assert(Doc.extractFromCfb(parsed, maxOut = 16) ==
          Left(Doc.Rejected("doc_text_bomb")))
      case Left(r) => fail(s"cfb parse failed: $r")
    }
  }
}
