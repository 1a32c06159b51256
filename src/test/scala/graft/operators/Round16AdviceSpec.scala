package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Round-16 ADVICE regressions: each test crafts the exact hostile
  * input the advisory described and asserts the parser QUARANTINES by
  * name instead of letting an unchecked exception
  * (NegativeArraySizeException / ArrayIndexOutOfBoundsException /
  * MatchError) escape the Bail-only catch. */
class Round16AdviceSpec extends AnyFunSuite {

  import LE.{putU16, putU32}

  private def putU64(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    putU32(o, v & 0xFFFFFFFFL); putU32(o, (v >>> 32) & 0xFFFFFFFFL)
  }

  /** Minimal standalone EOCD64 + locator + EOCD (no CD, no members):
    * enough structure to drive the reader all the way into the zip64
    * count/offset fields under attack. */
  private def eocd64Blob(nTotal64: Long): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    // EOCD64 record @0, recSize 44 => strict adjacency 0+12+44 == 56
    putU32(o, 0x06064b50L); putU64(o, 44L)
    putU16(o, 45); putU16(o, 45) // version made / needed
    putU32(o, 0L); putU32(o, 0L) // disk / cd disk
    putU64(o, nTotal64); putU64(o, nTotal64) // entries this disk / total
    putU64(o, 0L); putU64(o, 0L) // cd size / cd offset
    // locator @56
    putU32(o, 0x07064b50L); putU32(o, 0L); putU64(o, 0L); putU32(o, 1L)
    // EOCD @76
    putU32(o, 0x06054b50L); putU16(o, 0); putU16(o, 0)
    putU16(o, 1); putU16(o, 1); putU32(o, 0L); putU32(o, 0L); putU16(o, 0)
    o.toByteArray
  }

  test("zip64: entry count >= 2^63 quarantines, no negative allocation") {
    // u64 count reads as a negative Long: passes ==0 and >MaxMembers,
    // then new Array[CdEntry](n.toInt) blew up as
    // NegativeArraySizeException (not a Bail) before the fix
    for (n <- Seq(0xFFFFFFFF80000000L, Long.MinValue, Long.MinValue + 1))
      assert(ZipArchive.parse(eocd64Blob(n)) ==
        Left(ZipArchive.Rejected("zip64_bad_eocd64")), s"count $n")
    // zero entries through the zip64 path also names its fate
    assert(ZipArchive.parse(eocd64Blob(0L)) ==
      Left(ZipArchive.Rejected("zip64_bad_eocd64")))
  }

  test("zip64: locator offset near 2^63 quarantines, no wrapped bound") {
    // the advisory's 42-byte PoC: eocd64Off + 56 wraps negative, the
    // additive guard passed, and eocd64Off.toInt indexed at -1
    val o = new java.io.ByteArrayOutputStream()
    putU32(o, 0x07064b50L); putU32(o, 0L)
    putU64(o, Long.MaxValue - 40); putU32(o, 1L)
    putU32(o, 0x06054b50L); putU16(o, 0); putU16(o, 0)
    putU16(o, 1); putU16(o, 1); putU32(o, 0L); putU32(o, 0L); putU16(o, 0)
    assert(ZipArchive.parse(o.toByteArray) ==
      Left(ZipArchive.Rejected("zip64_bad_eocd64")))
  }

  /** Full one-member zip64 archive whose CD zip64 extra plants an
    * attacker-chosen 8-byte local-header offset. */
  private def zip64LocalOffBlob(localOff: Long): Array[Byte] = {
    val body = "hello123".getBytes("US-ASCII")
    val crc = { val c = new java.util.zip.CRC32(); c.update(body); c.getValue }
    val o = new java.io.ByteArrayOutputStream()
    // local header @0: stored, real sizes
    putU32(o, 0x04034b50L); putU16(o, 45); putU16(o, 0); putU16(o, 0)
    putU16(o, 0); putU16(o, 0)
    putU32(o, crc); putU32(o, body.length.toLong); putU32(o, body.length.toLong)
    putU16(o, 1); putU16(o, 0)
    o.write('a'); o.write(body) // data ends at 39
    val cdOff = o.size()
    // CD entry with 0xFFFFFFFF sentinels resolved via the 0x0001 extra
    putU32(o, 0x02014b50L); putU16(o, 45); putU16(o, 45); putU16(o, 0)
    putU16(o, 0); putU16(o, 0); putU16(o, 0)
    putU32(o, crc); putU32(o, 0xFFFFFFFFL); putU32(o, 0xFFFFFFFFL)
    putU16(o, 1); putU16(o, 28); putU16(o, 0)
    putU16(o, 0); putU16(o, 0); putU32(o, 0L); putU32(o, 0xFFFFFFFFL)
    o.write('a')
    putU16(o, 0x0001); putU16(o, 24)
    putU64(o, body.length.toLong); putU64(o, body.length.toLong)
    putU64(o, localOff)
    val cdSize = o.size() - cdOff
    val eocd64Off = o.size()
    putU32(o, 0x06064b50L); putU64(o, 44L)
    putU16(o, 45); putU16(o, 45); putU32(o, 0L); putU32(o, 0L)
    putU64(o, 1L); putU64(o, 1L)
    putU64(o, cdSize.toLong); putU64(o, cdOff.toLong)
    putU32(o, 0x07064b50L); putU32(o, 0L)
    putU64(o, eocd64Off.toLong); putU32(o, 1L)
    putU32(o, 0x06054b50L); putU16(o, 0); putU16(o, 0)
    putU16(o, 1); putU16(o, 1)
    putU32(o, cdSize.toLong); putU32(o, cdOff.toLong); putU16(o, 0)
    o.toByteArray
  }

  test("zip64: local offset near 2^63 quarantines, no wrapped bound") {
    // sanity: the same builder with the TRUE offset parses clean
    ZipArchive.parse(zip64LocalOffBlob(0L)) match {
      case Right(ms) =>
        assert(ms.map(_.name) == Seq("a"))
        assert(new String(ms.head.body, "US-ASCII") == "hello123")
      case Left(r) => fail(s"well-formed zip64 fixture rejected: ${r.reason}")
    }
    // localOff + 30 wraps negative: the additive guard passed and
    // localOff.toInt indexed at -16 before the fix
    assert(ZipArchive.parse(zip64LocalOffBlob(Long.MaxValue - 15)) ==
      Left(ZipArchive.Rejected("zip_bad_local_offset")))
    // plain out-of-range (no wrap) keeps the same named fate
    assert(ZipArchive.parse(zip64LocalOffBlob(1L << 40)) ==
      Left(ZipArchive.Rejected("zip_bad_local_offset")))
  }

  test("bench: canary band env parses or fails by name, not MatchError") {
    assert(graft.Bench.parseBand("2.24,2.5") == (2.24, 2.5))
    assert(graft.Bench.parseBand(" 1.0 , 2.0 ") == (1.0, 2.0))
    for (bad <- Seq("", "2.24", "a,b", "2.5,2.24", "0,1", "1,2,3"))
      assert(intercept[RuntimeException](graft.Bench.parseBand(bad))
        .getMessage.contains("SPARK_GRAFT_CANARY_BAND"), s"input '$bad'")
  }

  test("bench: sweep-floor env parses or fails by name") {
    assert(graft.Bench.parseSweepFloors("q1=1.5,q2=2") ==
      Seq("q1" -> 1.5, "q2" -> 2.0))
    for (bad <- Seq("q1", "q1=", "=1.5", "q1=0", "q1=-1", "q1=x"))
      assert(intercept[RuntimeException](graft.Bench.parseSweepFloors(bad))
        .getMessage.contains("SPARK_GRAFT_SWEEP_FLOORS"), s"input '$bad'")
  }
}
