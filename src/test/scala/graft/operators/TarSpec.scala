package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class TarSpec extends AnyFunSuite {

  private def members(n: Int): Seq[Tar.TarMember] =
    (0 until n).map { i =>
      Tar.TarMember(s"dir-ish-name-$i.txt",
        (s"body $i " + ("x" * (i * 200))).getBytes("UTF-8"))
    }

  test("roundtrip: names and bodies bit-exact across block boundaries") {
    for (n <- Seq(1, 3, 7)) {
      val ms = members(n)
      val got = Tar.parse(Tar.write(ms)).toOption.getOrElse(fail(s"parse failed n=$n"))
      assert(got.map(_.name) == ms.map(_.name))
      got.zip(ms).foreach { case (g, w) => assert(g.body.sameElements(w.body)) }
    }
  }

  test("empty body and exactly-one-block body roundtrip") {
    val ms = Seq(
      Tar.TarMember("empty.txt", Array.emptyByteArray),
      Tar.TarMember("block.bin", Array.tabulate(512)(i => (i * 3).toByte)))
    val got = Tar.parse(Tar.write(ms)).toOption.get
    assert(got(0).body.isEmpty && got(1).body.length == 512)
  }

  test("corruption rejects: checksum, magic, truncation, padding smuggle") {
    val blob = Tar.write(members(3))
    // flip a name byte -> checksum mismatch
    val badName = blob.clone(); badName(0) = (badName(0) ^ 1).toByte
    assert(Tar.parse(badName).isLeft)
    // break the magic
    val badMagic = blob.clone(); badMagic(257) = 'X'
    assert(Tar.parse(badMagic) == Left(Tar.Rejected("tar_bad_magic")))
    // truncate mid-data and to a non-block length
    assert(Tar.parse(blob.take(700)).isLeft)
    assert(Tar.parse(blob.take(1024)).isLeft)
    // smuggle a byte into the zero padding after member 0's data
    val hdrSize = 512
    val body0 = members(3).head.body.length
    val padPos = hdrSize + body0 + 1
    val smug = blob.clone(); smug(padPos) = 7
    assert(Tar.parse(smug) == Left(Tar.Rejected("tar_bad_padding")))
    // non-zero byte after the two-zero-block terminator: unaligned
    // junk names the alignment fate; a full junk block the garbage one
    val trail = blob ++ Array[Byte](0, 0, 1)
    assert(Tar.parse(trail) == Left(Tar.Rejected("tar_not_block_aligned")))
    val trailBlock = blob ++ Array.fill[Byte](512)(1)
    assert(Tar.parse(trailBlock) ==
      Left(Tar.Rejected("tar_trailing_garbage")))
  }

  test("non-regular-file entries and oversized declarations reject") {
    val blob = Tar.write(members(1))
    // flipping the typeflag alone breaks the checksum first; reseal
    // it so the ENTRY-TYPE gate is the one that fires
    val dirEntry = blob.clone(); dirEntry(156) = '5' // directory typeflag
    var ck = 0L
    for (i <- 0 until 512)
      ck += (if (i >= 148 && i < 156) ' '.toInt else dirEntry(i) & 0xff)
    val ckB = ("%06o".format(ck) + "\u0000 ").getBytes("US-ASCII")
    System.arraycopy(ckB, 0, dirEntry, 148, 8)
    assert(Tar.parse(dirEntry) ==
      Left(Tar.Rejected("tar_entry_type_unsupported")))
  }
}
