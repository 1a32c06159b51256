package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** ZIP reader contract: bit-exact member roundtrips over both methods,
  * and reject-don't-guess on every corruption class — a parse must
  * yield the whole archive or nothing.
  */
class ZipArchiveSpec extends AnyFunSuite {

  private def members(n: Int): Seq[ZipArchive.ZipMember] =
    (0 until n).map { i =>
      val body = (s"member $i: " + ("abcdefgh" * (1 + i * 3)) + s" tail$i")
        .getBytes("UTF-8")
      ZipArchive.ZipMember(s"m$i.txt", body)
    }

  test("roundtrip: stored, deflated, and mixed archives are bit-exact") {
    for (pick <- Seq[Int => Boolean](_ => false, _ => true, _ % 2 == 1)) {
      val ms = members(5)
      val blob = ZipArchive.write(ms, pick)
      val got = ZipArchive.parse(blob).getOrElse(fail("parse failed"))
      assert(got.map(_.name) == ms.map(_.name))
      got.zip(ms).foreach { case (g, w) => assert(g.body.sameElements(w.body)) }
    }
  }

  test("empty and binary bodies roundtrip") {
    val ms = Seq(
      ZipArchive.ZipMember("empty.bin", Array.emptyByteArray),
      ZipArchive.ZipMember("bytes.bin", Array.tabulate(300)(i => (i * 7).toByte)))
    val got = ZipArchive.parse(ZipArchive.write(ms, _ => true)).get
    assert(got(0).body.isEmpty && got(1).body.sameElements(ms(1).body))
  }

  test("corruption anywhere quarantines the whole archive") {
    val blob = ZipArchive.write(members(4), _ % 2 == 0)
    // truncations at every suffix length
    for (cut <- Seq(1, 4, 21, blob.length / 2, blob.length - 1))
      assert(ZipArchive.parse(blob.take(cut)).isEmpty, s"truncation at $cut")
    // single-byte flips across the blob (headers, data, central dir, eocd)
    var rejectedOrChanged = 0
    for (pos <- blob.indices by 7) {
      val mut = blob.clone()
      mut(pos) = (mut(pos) ^ 0x41).toByte
      ZipArchive.parse(mut) match {
        case None => rejectedOrChanged += 1
        case Some(ms) =>
          // a flip the parser accepts must be confined to a member NAME
          // (names are not CRC-protected by the local header we check)
          val orig = ZipArchive.parse(blob).get
          assert(ms.map(_.body.toSeq) == orig.map(_.body.toSeq),
            s"flip at $pos silently changed a body")
      }
    }
    assert(rejectedOrChanged > blob.length / 14, "fuzz barely exercised rejects")
  }

  test("data-descriptor and encrypted flags are rejected") {
    val blob = ZipArchive.write(members(2), _ => false)
    // set flag bit 3 (data descriptor) in the first local header
    val dd = blob.clone(); dd(6) = (dd(6) | 0x08).toByte
    assert(ZipArchive.parse(dd).isEmpty)
    val enc = blob.clone(); enc(6) = (enc(6) | 0x01).toByte
    assert(ZipArchive.parse(enc).isEmpty)
  }

  test("declared-size allocation cap rejects before allocating") {
    val blob = ZipArchive.write(members(1), _ => true)
    // inflate the declared uncompressed size to 1 GiB
    val big = blob.clone()
    big(22) = 0; big(23) = 0; big(24) = 0; big(25) = 0x40
    assert(ZipArchive.parse(big).isEmpty)
  }

  test("central-directory count mismatch is rejected") {
    val blob = ZipArchive.write(members(3), _ => false)
    // EOCD total-entries field is 10 bytes into the EOCD record
    val eocd = blob.length - 22
    val mut = blob.clone()
    mut(eocd + 10) = 9
    assert(ZipArchive.parse(mut).isEmpty)
  }
}
