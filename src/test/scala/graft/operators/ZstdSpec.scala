package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class ZstdSpec extends AnyFunSuite {

  test("XXH64 matches the published test vectors") {
    assert(Zstd.xxh64(Array.empty[Byte]) == 0xEF46DB3751D8E999L)
    assert(Zstd.xxh64("a".getBytes("US-ASCII")) == 0xD24EC4F1A98C6E5BL)
    assert(Zstd.xxh64("abc".getBytes("US-ASCII")) == 0x44BC2CF5AD770999L)
    // exercise the >= 32-byte stripe path
    val long = ("0123456789" * 10).getBytes("US-ASCII")
    assert(Zstd.xxh64(long) == Zstd.xxh64(long.clone()))
  }

  private def bytes(id: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((id * 31 + k * 7 + (k / 13) * 3) % 256).toByte)

  test("roundtrip: raw + RLE blocks, checksum, content size, skippable") {
    for (id <- 0L until 8L) {
      val base = bytes(id, 300 + (id % 700).toInt)
      // plant runs so RLE blocks actually occur
      val data = base ++ Array.fill(20 + (id % 40).toInt)(('z' + 0).toByte) ++ bytes(id + 1, 50)
      val blob = Zstd.encode(data,
        checksum = id % 2 == 0,
        withContentSize = id % 3 != 1,
        skippablePrefix = if (id % 4 == 3) 12 else 0,
        maxBlock = 128)
      val got = Zstd.decode(blob)
      assert(got.isRight, s"id=$id: $got")
      val frames = got.toOption.get
      val dataFrames = frames.filterNot(_.skippable)
      assert(dataFrames.length == 1)
      assert(dataFrames.head.content.toSeq == data.toSeq, s"id=$id")
      assert(dataFrames.head.hasChecksum == (id % 2 == 0))
      assert(dataFrames.head.nRle >= 1, "planted run must become RLE")
      if (id % 4 == 3) assert(frames.head.skippable)
    }
  }

  test("multi-frame streams concatenate") {
    val a = Zstd.encode(bytes(1, 100))
    val b = Zstd.encode(bytes(2, 80), checksum = false)
    val frames = Zstd.decode(a ++ b).toOption.get
    assert(frames.length == 2)
    assert(frames(0).content.toSeq == bytes(1, 100).toSeq)
    assert(frames(1).content.toSeq == bytes(2, 80).toSeq)
  }

  test("empty content encodes to one empty raw block and roundtrips") {
    val frames = Zstd.decode(Zstd.encode(Array.empty[Byte])).toOption.get
    assert(frames.head.content.isEmpty && frames.head.nBlocks == 1)
  }

  test("corruption rejects by name: checksum, content size, magic, block type") {
    val good = Zstd.encode(bytes(3, 200))
    // flip a content byte -> checksum mismatch
    val c1 = good.clone(); c1(good.length - 10) = (c1(good.length - 10) ^ 1).toByte
    assert(Zstd.decode(c1) == Left(Zstd.Rejected("checksum_mismatch")))
    val c2 = good.clone(); c2(0) = 0x00
    assert(Zstd.decode(c2) == Left(Zstd.Rejected("bad_magic")))
    // truncations never crash
    (1 until good.length by 7).foreach { cut =>
      assert(Zstd.decode(java.util.Arrays.copyOf(good, cut)).isLeft)
    }
    // compressed block type rejects by name (craft: set type bits to 2)
    val noCk = Zstd.encode(bytes(4, 50), checksum = false,
      withContentSize = false)
    // frame: magic(4) + fhd(1) + window(1), block header at offset 6
    val c3 = noCk.clone()
    c3(6) = ((c3(6) & ~0x06) | (2 << 1)).toByte
    assert(Zstd.decode(c3) == Left(Zstd.Rejected("compressed_block_unsupported")))
  }

  test("FHD Unused bit (0x10) passes; Reserved bit (0x08) rejects") {
    val good = Zstd.encode(bytes(6, 40), checksum = false, withContentSize = false)
    // RFC 8878: bit 4 is Unused_bit — "shall not interpret"; frame stays decodable
    val unused = good.clone(); unused(4) = (unused(4) | 0x10).toByte
    assert(Zstd.decode(unused).toOption.get.head.content.toSeq == bytes(6, 40).toSeq)
    val reserved = good.clone(); reserved(4) = (reserved(4) | 0x08).toByte
    assert(Zstd.decode(reserved) == Left(Zstd.Rejected("reserved_fhd_bits")))
  }

  test("dictionary frames reject by name") {
    val good = Zstd.encode(bytes(5, 30), checksum = false, withContentSize = false)
    val c = good.clone()
    c(4) = (c(4) | 0x01).toByte // DID flag = 1
    assert(Zstd.decode(c).isLeft)
  }
}
