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
    // a raw payload relabeled as a Compressed block is entropy-layer
    // garbage: it must quarantine with a NAMED reason, never crash or
    // silently decode
    val noCk = Zstd.encode(bytes(4, 50), checksum = false,
      withContentSize = false)
    // frame: magic(4) + fhd(1) + window(1), block header at offset 6
    val c3 = noCk.clone()
    c3(6) = ((c3(6) & ~0x06) | (2 << 1)).toByte
    assert(Zstd.decode(c3).isLeft)
  }

  test("FHD Unused bit (0x10) passes; Reserved bit (0x08) rejects") {
    val good = Zstd.encode(bytes(6, 40), checksum = false, withContentSize = false)
    // RFC 8878: bit 4 is Unused_bit — "shall not interpret"; frame stays decodable
    val unused = good.clone(); unused(4) = (unused(4) | 0x10).toByte
    assert(Zstd.decode(unused).toOption.get.head.content.toSeq == bytes(6, 40).toSeq)
    val reserved = good.clone(); reserved(4) = (reserved(4) | 0x08).toByte
    assert(Zstd.decode(reserved) == Left(Zstd.Rejected("reserved_fhd_bits")))
  }

  // ---- entropy-layer interop: frames from a REAL zstd encoder ----
  // zstd-jni ships on Spark's classpath; using it here (tests only)
  // pins the from-scratch decoder against genuine FSE/Huffman streams
  // instead of a self-consistent roundtrip.

  private def jniCompress(data: Array[Byte], level: Int,
      checksum: Boolean = true): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      ctx.setLevel(level)
      ctx.setChecksum(checksum)
      ctx.compress(data)
    } finally ctx.close()
  }

  private def textish(id: Long, n: Int): Array[Byte] = {
    val words = Array("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dogs", "zstd", "frame", "entropy", "sequence")
    val sb = new StringBuilder
    var k = 0L
    while (sb.length < n) {
      sb.append(words(((id + k * 7) % words.length).toInt)).append(' ')
      if (k % 13 == 0) sb.append(id % 100).append('\n')
      k += 1
    }
    sb.toString.take(n).getBytes("US-ASCII")
  }

  test("interop: real-encoder frames decode exactly (levels x shapes x sizes)") {
    val shapes: Seq[(String, Long => Array[Byte])] = Seq(
      ("text", id => textish(id, 800 + id.toInt * 371)),
      ("repetitive", id => (("abcdefgh" * 40) + id.toString).getBytes("US-ASCII")),
      ("binary", id => bytes(id, 2000 + id.toInt * 127)),
      ("runs", id => textish(id, 300) ++ Array.fill(500)('x'.toByte) ++ bytes(id, 200)))
    for (level <- Seq(1, 3, 9, 19); (name, gen) <- shapes; id <- 0L until 3L) {
      val data = gen(id)
      val blob = jniCompress(data, level, checksum = id % 2 == 0)
      val got = Zstd.decode(blob)
      assert(got.isRight, s"level=$level shape=$name id=$id: $got")
      val fr = got.toOption.get.head
      assert(fr.content.toSeq == data.toSeq, s"level=$level shape=$name id=$id")
    }
  }

  test("interop: compressible input actually exercises the entropy layer") {
    val data = textish(5, 4000)
    val fr = Zstd.decode(jniCompress(data, 3)).toOption.get.head
    assert(fr.nCompressed >= 1, "level-3 text must produce Compressed blocks")
    assert(fr.content.toSeq == data.toSeq)
  }

  test("interop: multi-block frame (>128 KB) with Treeless/Repeat carry-over") {
    // > 128 KB forces multiple blocks; repeated-but-drifting content
    // keeps later blocks compressed so Treeless literals / Repeat FSE
    // modes (cross-block state) actually occur for some encoder choice
    val data = (0 until 4000).map(k => s"line $k ${textish(k, 60).length} lorem ipsum dolor sit amet\n")
      .mkString.getBytes("US-ASCII")
    assert(data.length > (1 << 17))
    for (level <- Seq(1, 3, 19)) {
      val fr = Zstd.decode(jniCompress(data, level)).toOption.get.head
      assert(fr.nBlocks >= 2, s"level=$level: expected multiple blocks")
      assert(fr.content.toSeq == data.toSeq, s"level=$level")
    }
  }

  test("interop: empty and tiny inputs") {
    Seq(0, 1, 2, 5).foreach { n =>
      val data = bytes(9, n)
      val fr = Zstd.decode(jniCompress(data, 3)).toOption.get.head
      assert(fr.content.toSeq == data.toSeq, s"n=$n")
    }
  }

  test("hostile: truncation sweep over a real compressed frame never crashes") {
    val blob = jniCompress(textish(7, 3000), 3)
    (0 until blob.length by 3).foreach { cut =>
      assert(Zstd.decode(java.util.Arrays.copyOf(blob, cut)).isLeft, s"cut=$cut")
    }
  }

  test("hostile: bit-flip sweep over a real compressed frame never crashes") {
    val blob = jniCompress(textish(8, 1500), 3)
    (4 until blob.length).foreach { i => // past magic (flipped magic = bad_magic, covered)
      val c = blob.clone()
      c(i) = (c(i) ^ 0x20).toByte
      Zstd.decode(c) // must not throw; checksum guards silent corruption
      ()
    }
  }

  test("hostile: checksum catches content corruption through the entropy layer") {
    val data = textish(11, 2500)
    val blob = jniCompress(data, 3, checksum = true)
    var caught = 0
    (6 until blob.length - 4).foreach { i =>
      val c = blob.clone()
      c(i) = (c(i) ^ 0x01).toByte
      Zstd.decode(c) match {
        case Left(_) => caught += 1
        case Right(frames) =>
          // a flip that still decodes AND passes XXH64 must be content-
          // preserving (it flipped a dont-care bit) — assert that
          assert(frames.head.content.toSeq == data.toSeq, s"flip at $i slipped through")
      }
    }
    assert(caught > 0)
  }

  test("dictionary frames: trained ZDICT dictionary decodes; absence/mismatch reject") {
    // train a real dictionary (zstd-jni ZDICT) over repetitive samples
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(1 << 20, 16 * 1024)
    (0 until 64).foreach { k =>
      trainer.addSample((s"sample record $k: " + textish(k, 300).map(_.toChar).mkString).getBytes("US-ASCII"))
    }
    val dictBytes = trainer.trainSamples()
    val dict = Zstd.parseDictionary(dictBytes).toOption.get
    assert(dict.id != 0L, "ZDICT output carries a real dictionary id")
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    val data = ("sample record 999: " + textish(9, 700).map(_.toChar).mkString)
      .getBytes("US-ASCII")
    val blob =
      try {
        ctx.setLevel(3); ctx.setChecksum(true); ctx.loadDict(dictBytes)
        ctx.compress(data)
      } finally ctx.close()
    // without the dictionary: named rejection
    assert(Zstd.decode(blob) == Left(Zstd.Rejected("dictionary_frame")))
    // with it: exact content through the XXH64 verify
    val got = Zstd.decode(blob, Some(dict))
    assert(got.isRight, s"$got")
    assert(got.toOption.get.head.content.toSeq == data.toSeq)
    // a wrong formatted dictionary: id mismatch by name
    val other = new com.github.luben.zstd.ZstdDictTrainer(1 << 20, 16 * 1024)
    (0 until 64).foreach(k => other.addSample(bytes(k + 1000, 400)))
    val wrong = Zstd.parseDictionary(other.trainSamples()).toOption.get
    if (wrong.id != dict.id)
      assert(Zstd.decode(blob, Some(wrong)) ==
        Left(Zstd.Rejected("dictionary_mismatch")))
  }

  test("dictionary frames: raw-content dictionary (out-of-band pairing)") {
    val rawDict = ("shared prefix vocabulary: " + textish(3, 2000).map(_.toChar).mkString)
      .getBytes("US-ASCII")
    val data = ("shared prefix vocabulary: " + textish(3, 500).map(_.toChar).mkString +
      " plus novel tail").getBytes("US-ASCII")
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    val blob =
      try {
        ctx.setLevel(19); ctx.setChecksum(true); ctx.loadDict(rawDict)
        ctx.compress(data)
      } finally ctx.close()
    val dict = Zstd.parseDictionary(rawDict).toOption.get
    assert(dict.id == 0L)
    val got = Zstd.decode(blob, Some(dict))
    assert(got.isRight, s"$got")
    assert(got.toOption.get.head.content.toSeq == data.toSeq)
  }

  test("hostile: truncated/garbled formatted dictionaries reject by name") {
    val trainer = new com.github.luben.zstd.ZstdDictTrainer(1 << 20, 8 * 1024)
    (0 until 32).foreach(k => trainer.addSample(bytes(k, 500) ++ bytes(k, 200)))
    val dictBytes = trainer.trainSamples()
    (8 until math.min(dictBytes.length, 60)).foreach { cut =>
      Zstd.parseDictionary(java.util.Arrays.copyOf(dictBytes, cut)) match {
        case Left(r) => assert(r.reason.nonEmpty)
        case Right(d) => assert(d.id != 0) // parsed a shorter-but-legal prefix
      }
    }
  }

  test("dictionary frames reject by name") {
    val good = Zstd.encode(bytes(5, 30), checksum = false, withContentSize = false)
    val c = good.clone()
    c(4) = (c(4) | 0x01).toByte // DID flag = 1
    assert(Zstd.decode(c).isLeft)
  }

  test("windowLog conformance: offsets beyond the declared window reject (RFC 8878)") {
    // a real-encoder frame whose only long match spans ~1.5 KB, written
    // WITHOUT content size so the header carries a window descriptor
    val rnd = new scala.util.Random(42)
    val x = Array.fill[Byte](700)(rnd.nextInt(256).toByte)
    val filler = Array.fill[Byte](800)(rnd.nextInt(256).toByte)
    val data = x ++ filler ++ x
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new com.github.luben.zstd.ZstdOutputStream(bos, 19)
    zos.write(data); zos.close()
    val blob = bos.toByteArray
    assert((blob(4) & 0x20) == 0, "streaming frame must not be single-segment")
    // untouched: decodes fine under its true window
    assert(Zstd.decode(blob).toOption.get.head.content.toSeq == data.toSeq)
    // same bytes, but the header now DECLARES a 1 KiB window: the
    // 1.5 KB-back match is off-contract even though the produced
    // history could serve it — round 11 accepted this, round 12 rejects
    val shrunk = blob.clone()
    shrunk(5) = 0 // window descriptor: exponent 0, mantissa 0 -> 1024
    assert(Zstd.decode(shrunk) == Left(Zstd.Rejected("offset_beyond_window")))
  }
}
