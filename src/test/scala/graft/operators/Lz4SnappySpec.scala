package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Interop against the REAL codecs on the classpath: lz4-java's
  * LZ4FrameOutputStream and snappy-java's SnappyFramedOutputStream /
  * raw Snappy.compress. The broad parameter sweep is
  * tools/fuzz_lz4_snappy_diff.py (graft.tools.Lz4SnappyDiff). */
class Lz4SnappySpec extends AnyFunSuite {

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  private def text(n: Int): Array[Byte] =
    ("lz4 and snappy are the data lake codecs " * (n / 40 + 1))
      .substring(0, n).getBytes("UTF-8")

  private def lz4Frame(data: Array[Byte],
      size: net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE =
        net.jpountz.lz4.LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB,
      flags: Seq[net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits] = Seq(
        net.jpountz.lz4.LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE))
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new net.jpountz.lz4.LZ4FrameOutputStream(bos, size,
      data.length.toLong, flags: _*)
    z.write(data); z.close()
    bos.toByteArray
  }

  private def snappyFramed(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.xerial.snappy.SnappyFramedOutputStream(bos)
    z.write(data); z.close()
    bos.toByteArray
  }

  test("lz4-java frames decode byte-exact across sizes and block modes") {
    import net.jpountz.lz4.LZ4FrameOutputStream.{BLOCKSIZE, FLG}
    val shapes = Seq(Array.emptyByteArray, "x".getBytes, text(100),
      lcg(70000, 3), text(300000), lcg(5, 9) ++ Array.fill[Byte](90000)(7))
    for {
      data <- shapes
      size <- Seq(BLOCKSIZE.SIZE_64KB, BLOCKSIZE.SIZE_256KB,
        BLOCKSIZE.SIZE_4MB)
    } {
      val wire = lz4Frame(data, size = size)
      val dec = Lz4.decode(wire)
      assert(dec.isRight, s"len=${data.length} $size: ${dec.swap.getOrElse("")}")
      assert(dec.toOption.get.sameElements(data), s"len=${data.length} $size")
    }
    // content-checksum flag on
    val data = text(50000)
    val wire = lz4Frame(data, flags = Seq(
      FLG.Bits.BLOCK_INDEPENDENCE, FLG.Bits.CONTENT_CHECKSUM))
    assert(Lz4.decode(wire).toOption.get.sameElements(data))
  }

  test("lz4 hostility: corruption, truncation, bomb, skippable, concat") {
    val data = text(40000)
    val wire = lz4Frame(data)
    assert(Lz4.decode(java.util.Arrays.copyOf(wire, wire.length - 5)) ==
      Left(Lz4.Rejected("truncated_lz4")))
    val c = wire.clone(); c(8) = (c(8) ^ 0x7).toByte // header byte
    assert(Lz4.decode(c).isLeft)
    val body = wire.clone(); body(wire.length / 2) =
      (body(wire.length / 2) ^ 0x41).toByte
    assert(Lz4.decode(body).isLeft) // grammar or size check trips
    // bomb: cap far below the decoded size
    assert(Lz4.decode(wire, maxOut = 1024) == Left(Lz4.Rejected("lz4_bomb")))
    // skippable frame prefix + two concatenated frames
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 3, 0, 0, 0, 9, 9, 9)
    val two = skip ++ wire ++ lz4Frame(lcg(100, 4))
    assert(Lz4.decode(two).toOption.get.sameElements(data ++ lcg(100, 4)))
    // garbage after a valid frame
    assert(Lz4.decode(wire ++ Array[Byte](1, 2, 3, 4)) ==
      Left(Lz4.Rejected("bad_magic")))
  }

  test("snappy-java framed streams decode byte-exact") {
    val shapes = Seq(Array.emptyByteArray, "y".getBytes, text(100),
      lcg(66000, 5), text(400000), Array.fill[Byte](200000)(42))
    shapes.foreach { data =>
      val dec = Snappy.decode(snappyFramed(data))
      assert(dec.isRight, s"len=${data.length}: ${dec.swap.getOrElse("")}")
      assert(dec.toOption.get.sameElements(data), s"len=${data.length}")
    }
  }

  test("snappy raw blocks from the reference codec decode byte-exact") {
    Seq(text(1000), lcg(60000, 7), Array.fill[Byte](65536)(3)).foreach { d =>
      val blob = org.xerial.snappy.Snappy.compress(d)
      assert(Snappy.rawDecode(blob, 0, blob.length, 65536).sameElements(d))
    }
  }

  test("snappy hostility: crc, truncation, identifiers, unskippable, bomb") {
    val data = text(150000) // several chunks
    val wire = snappyFramed(data)
    assert(Snappy.decode(wire).toOption.get.sameElements(data))
    assert(Snappy.decode(java.util.Arrays.copyOf(wire, wire.length - 3)) ==
      Left(Snappy.Rejected("truncated_snappy")))
    // flip a data byte: the masked CRC32C must catch it
    val c = wire.clone(); c(wire.length / 2) =
      (c(wire.length / 2) ^ 0x41).toByte
    assert(Snappy.decode(c).isLeft)
    // missing stream identifier
    assert(Snappy.decode(wire.drop(10)).isLeft)
    // unskippable reserved chunk type
    val un = wire ++ Array[Byte](0x02, 1, 0, 0, 0)
    assert(Snappy.decode(un) ==
      Left(Snappy.Rejected("unskippable_chunk_0x02")))
    // padding + skippable chunks are transparent
    val pad = wire ++ Array[Byte](0xFE.toByte, 2, 0, 0, 0, 0) ++
      Array[Byte](0x80.toByte, 1, 0, 0, 7)
    assert(Snappy.decode(pad).toOption.get.sameElements(data))
    // bomb cap
    assert(Snappy.decode(wire, maxOut = 1024) ==
      Left(Snappy.Rejected("snappy_bomb")))
  }

  test("raw literal length 0x7FFFFFFF rejects instead of overflowing") {
    // 4-byte extended literal length of Int.MaxValue: the +1 would wrap
    // to Int.MinValue and sail past both negative bounds checks into an
    // uncaught IndexOutOfBoundsException (advice r13)
    val raw = Array[Byte](100, // varint expected length
      0xFC.toByte, // literal tag, litLen field 63 -> 4 extra bytes
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F) // LE 0x7FFFFFFF
    val chunk = Array[Byte](0x00, (raw.length + 4).toByte, 0, 0,
      0, 0, 0, 0) ++ raw // compressed chunk, bogus CRC (checked AFTER decode)
    val wire = Array[Byte](0xFF.toByte, 6, 0, 0,
      's', 'N', 'a', 'P', 'p', 'Y') ++ chunk
    assert(Snappy.decode(wire) == Left(Snappy.Rejected("bad_literal_length")))
  }
}
