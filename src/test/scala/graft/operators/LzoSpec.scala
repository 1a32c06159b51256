package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** LZO1X decode pinned against the REAL encoder on the classpath —
  * aircompressor's LzoCompressor, the codec orc-core itself embeds for
  * CompressionKind.LZO — across content shapes, sizes, and seeds, plus
  * hostile truncations/flips under the named-rejection contract. */
class LzoSpec extends AnyFunSuite {

  private def lcg(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  private def shapes(seed: Int): Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array[Byte](42),
    "text" -> ("the quick brown fox jumps over the lazy dog " * 200)
      .getBytes("UTF-8"),
    "runs" -> Array.fill[Byte](10000)(7),
    "ramp" -> Array.tabulate[Byte](30000)(i => (i * 37 % 256).toByte),
    "random" -> lcg(20000, seed),
    "mixed" -> (lcg(500, seed + 1) ++ Array.fill[Byte](3000)(0) ++
      ("repeat me " * 300).getBytes("UTF-8") ++ lcg(100, seed + 2)),
    "big" -> (("structured prefix " * 1000).getBytes("UTF-8") ++
      lcg(200000, seed + 3)))

  private def compress(src: Array[Byte]): Array[Byte] = {
    val c = new io.airlift.compress.lzo.LzoCompressor()
    val buf = new Array[Byte](c.maxCompressedLength(src.length))
    val m = c.compress(src, 0, src.length, buf, 0, buf.length)
    java.util.Arrays.copyOf(buf, m)
  }

  test("inverts the real encoder byte-exactly across shapes and seeds") {
    for (seed <- Seq(1, 77, 4242); (label, src) <- shapes(seed)) {
      val blob = compress(src)
      Lzo.rawDecode(blob, 0, blob.length, 1 << 26) match {
        case Right(got) =>
          assert(got.sameElements(src), s"$label seed=$seed")
        case Left(r) => fail(s"$label seed=$seed rejected: $r")
      }
    }
  }

  test("agrees with the real decoder on the real encoder's output") {
    val d = new io.airlift.compress.lzo.LzoDecompressor()
    val src = shapes(9).find(_._1 == "mixed").get._2
    val blob = compress(src)
    val ref = new Array[Byte](src.length)
    val n = d.decompress(blob, 0, blob.length, ref, 0, ref.length)
    assert(n == src.length)
    assert(Lzo.rawDecode(blob, 0, blob.length, 1 << 26).toOption.get
      .sameElements(ref.take(n)))
  }

  test("hostile blocks reject by name, never an escaped exception") {
    val src = shapes(3).find(_._1 == "mixed").get._2
    val blob = compress(src)
    // zero bytes = the real encoder's empty payload, not corruption
    assert(Lzo.rawDecode(blob, 0, 0, 1 << 26).toOption.get.isEmpty)
    for (cut <- Seq(1, 2, blob.length / 2, blob.length - 1))
      assert(Lzo.rawDecode(blob, 0, cut, 1 << 26).isLeft, s"cut $cut")
    var rejected = 0
    for (pos <- blob.indices by 3) {
      val mut = blob.clone()
      mut(pos) = (mut(pos) ^ 0x5A).toByte
      Lzo.rawDecode(mut, 0, mut.length, 1 << 26) match {
        case Left(r) => rejected += 1; assert(r.startsWith("lzo_"))
        case Right(_) => () // a flip can land in literal bytes: valid
      }
    }
    assert(rejected > 0)
    // bomb cap: tiny budget forces the named fate
    assert(Lzo.rawDecode(blob, 0, blob.length, 16) == Left("lzo_bomb"))
  }
}
