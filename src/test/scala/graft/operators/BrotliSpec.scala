package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Brotli (RFC 7932) interop + hostile-stream gate.
  *
  * The load-bearing direction: the 27 checked-in `interop_NN.br` frames
  * were produced by the SYSTEM libbrotli (the reference implementation;
  * tools/make_brotli_fixtures.py) across qualities 0..11, windows
  * 10..24, and content shapes incl. multi-meta-block FLUSH streams and
  * dictionary-heavy text — graft's from-scratch decoder must reproduce
  * every byte. The reverse direction (libbrotli decodes GRAFT-encoded
  * frames byte-exactly) is pinned by tools/verify_brotli_encoders.py
  * over the blobs this spec dumps to target/brotli_encoder_out/.
  */
class BrotliSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val interopIds = 0 until 27

  test("interop: every libbrotli-encoded fixture decodes byte-exactly") {
    interopIds.foreach { i =>
      val br = resource(f"interop_$i%02d.br")
      val raw = resource(f"interop_$i%02d.raw")
      Brotli.decode(br, maxOut = 1 << 26) match {
        case Right(d) =>
          assert(java.util.Arrays.equals(d.content, raw), s"fixture $i")
        case Left(r) => fail(s"fixture $i rejected: ${r.reason}")
      }
    }
  }

  test("interop: the dictionary-heavy fixtures actually hit the static dictionary") {
    // short English-y inputs at quality 11: libbrotli codes them almost
    // entirely as dictionary words + transforms; a decoder that never
    // reaches the dictionary path could not have passed byte-exactness,
    // but pin the census fact too
    val d = Brotli.decode(resource("interop_18.br")).toOption.get
    assert(d.nDictWords > 0)
    val multi = Brotli.decode(resource("interop_24.br")).toOption.get
    assert(multi.nMetaBlocks > 1, "FLUSH stream must carry several meta-blocks")
  }

  test("interop: the fixture set drives EVERY decoder subsystem (hit-rate gate)") {
    // the Vp8 predictor-coverage discipline: byte-exactness only proves
    // the paths that RAN; this pins that the real-encoder set runs all
    // of them, so no subsystem is dead code behind the interop claim
    val all = interopIds.map(i =>
      Brotli.decode(resource(f"interop_$i%02d.br"), 1 << 26).toOption.get)
    assert(all.map(_.maxBlockTypes).max >= 4, "multi block types")
    assert(all.map(_.nBlockSwitches).sum >= 10, "block switching")
    assert(all.map(_.maxLitTrees).max >= 2, "literal context maps")
    assert(all.map(_.maxDistTrees).max >= 2, "distance context maps")
    assert(all.exists(_.usedImtf), "inverse move-to-front")
    assert(all.map(_.maxNpostfix).max >= 1, "postfix distance params")
    assert(all.map(_.maxNdirect).max >= 16, "direct distance codes")
    assert(all.exists(_.usedSimpleCode), "simple prefix codes")
    assert(all.map(_.maxCodeLen).max == 15, "max-depth complex codes")
    assert(all.map(_.nDictWords).sum >= 30, "static dictionary")
    assert(all.exists(_.nUncompressed > 0), "uncompressed meta-blocks")
    assert(all.exists(_.nMetaBlocks > 1), "multi-meta-block streams")
  }

  test("interop: uncompressed meta-blocks and the empty stream") {
    val empty = Brotli.decode(resource("interop_15.br")).toOption.get
    assert(empty.content.isEmpty && empty.nMetaBlocks == 0)
    val unc = Brotli.decode(resource("interop_16.br")).toOption.get
    assert(unc.nUncompressed >= 1 && unc.content.toSeq == "z".getBytes.toSeq)
  }

  private def shapes: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(7)
    Seq(
      Array.empty[Byte],
      "z".getBytes,
      "ab".getBytes, "abc".getBytes, "abcd".getBytes,
      "hello world hello world".getBytes,
      Array.fill(100000)('a'.toByte),
      Array.tabulate(65536)(i => (i % 256).toByte),
      Array.tabulate(300000)(_ => rnd.nextInt(256).toByte),
      ("the quick brown fox " * 4000).getBytes,
      Array.tabulate(17)(i => (i * 31).toByte),
      Array.tabulate(1000)(i => (i % 3).toByte),
      Array.tabulate(5 * 1024 * 1024)(i => ((i * 2654435761L) >> 13).toByte))
  }

  test("encoder roundtrip across content shapes; blobs dumped for the libbrotli cross-check") {
    val outDir = java.nio.file.Paths.get("target/brotli_encoder_out")
    java.nio.file.Files.createDirectories(outDir)
    shapes.zipWithIndex.foreach { case (data, i) =>
      val enc = Brotli.encode(data)
      Brotli.decode(enc, maxOut = 1 << 26) match {
        case Right(d) =>
          assert(java.util.Arrays.equals(d.content, data), s"shape $i")
        case Left(r) => fail(s"shape $i rejected: ${r.reason}")
      }
      java.nio.file.Files.write(outDir.resolve(f"enc_$i%02d.br"), enc)
      java.nio.file.Files.write(outDir.resolve(f"enc_$i%02d.raw"), data)
    }
  }

  test("truncation sweep: every prefix rejects or yields a shorter decode, never throws") {
    Seq(0, 3, 18, 24).foreach { i =>
      val br = resource(f"interop_$i%02d.br")
      val raw = resource(f"interop_$i%02d.raw")
      (0 until br.length).foreach { n =>
        Brotli.decode(java.util.Arrays.copyOf(br, n), maxOut = 1 << 26) match {
          case Right(d) =>
            assert(d.content.length < raw.length || n == 0 && raw.isEmpty,
              s"fixture $i truncated to $n produced a full decode")
          case Left(r) => assert(r.reason.nonEmpty)
        }
      }
    }
  }

  test("bit-flip sweep: corrupted streams reject or decode bounded, never throw") {
    val br = resource("interop_03.br")
    (0 until br.length * 8).foreach { bit =>
      val c = br.clone()
      c(bit / 8) = (c(bit / 8) ^ (1 << (bit % 8))).toByte
      Brotli.decode(c, maxOut = 1 << 20) match {
        case Right(d) => assert(d.content.length <= (1 << 20))
        case Left(r) => assert(r.reason.nonEmpty)
      }
    }
  }

  test("bomb cap rejects before allocating past maxOut") {
    // 16 MiB of a single byte encodes to a few hundred bytes (0-bit
    // literal code); the cap must stop the expansion, not the input
    val bomb = Brotli.encode(Array.fill(16 * 1024 * 1024)('a'.toByte))
    assert(bomb.length < 4096)
    assert(Brotli.decode(bomb, maxOut = 1 << 16) ==
      Left(Brotli.Rejected("brotli_bomb")))
    assert(Brotli.decode(bomb, maxOut = 32 * 1024 * 1024).isRight)
  }

  test("metadata meta-blocks skip their payload (hand-built stream)") {
    // wbits=16, metadata block skipping 5 bytes, then last-empty:
    // bits: 0 | 0 | 11 | 0 | 10 | 00100000 (MSKIPLEN-1=4) | pad
    val stream = Array[Byte](0x2c, 0x02, 0x51, 0x52, 0x53, 0x54, 0x55, 0x03)
    Brotli.decode(stream) match {
      case Right(d) =>
        assert(d.content.isEmpty && d.nMetadata == 1)
      case Left(r) => fail(r.reason)
    }
  }

  test("hostile streams reject by name") {
    val good = resource("interop_00.br")
    // trailing garbage after the final byte-aligned meta-block
    assert(Brotli.decode(good :+ 0x00.toByte) ==
      Left(Brotli.Rejected("brotli_trailing_garbage")))
    // reserved window-bits pattern (would-be WBITS 9)
    assert(Brotli.decode(Array[Byte](0x11)) ==
      Left(Brotli.Rejected("brotli_bad_window_bits")))
    // empty input
    assert(Brotli.decode(Array.empty[Byte]) ==
      Left(Brotli.Rejected("truncated_brotli")))
  }

  test("Content-Encoding: br flows through the charset gate's decode stage") {
    val body = Brotli.encode("<html>café</html>".getBytes("UTF-8"))
    val got = CharsetSniff.decodeContentEncoding(body, Some("br"))
    assert(got.map(new String(_, "UTF-8")) == Right("<html>café</html>"))
    // truncation and corruption surface the named fates
    assert(CharsetSniff.decodeContentEncoding(
      java.util.Arrays.copyOf(body, 3), Some("br")) ==
      Left(CharsetSniff.Rejected("truncated_br_body")))
    val bomb = Brotli.encode(Array.fill(17 * 1024 * 1024)('x'.toByte))
    assert(CharsetSniff.decodeContentEncoding(bomb, Some("br")) ==
      Left(CharsetSniff.Rejected("encoding_bomb")))
  }
}
