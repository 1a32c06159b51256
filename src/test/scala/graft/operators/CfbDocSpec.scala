package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** CFB container walk + .doc piece-table extraction. No reference CFB
  * implementation exists in this container (no POI, no olefile), so
  * the pair is construct-and-cross-check: the writer emits
  * spec-faithful [MS-CFB] layouts, the parser is strict, and the
  * hostile cases below mutate real containers into each named fate. */
class CfbDocSpec extends AnyFunSuite {

  private def blobOf(n: Int, seed: Int): Array[Byte] = {
    var s = seed
    Array.fill(n) { s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte }
  }

  test("mini and regular streams round-trip byte-exact") {
    val streams = Seq(
      "TinyStream" -> blobOf(100, 1), // mini (one 64-byte chain + tail)
      "MidMini" -> blobOf(4000, 2), // mini, multi-sector
      "ExactCut" -> blobOf(4096, 3), // exactly at cutoff -> REGULAR
      "BigStream" -> blobOf(20000, 4), // regular, multi-sector
      "Empty" -> Array.emptyByteArray)
    val cfb = Cfb.write(streams)
    val p = Cfb.parse(cfb).toOption.get
    assert(p.majorVersion == 3 && p.sectorSize == 512)
    assert(p.nStreams == 5 && p.nStorages == 0)
    streams.foreach { case (name, body) =>
      assert(p.streams(name).sameElements(body), name)
    }
    // entries arrive in CFB name order (length first, then uppercased)
    assert(p.entries.map(_.path) ==
      Seq("Empty", "MidMini", "ExactCut", "BigStream", "TinyStream"))
  }

  test("hostile containers: cyclic FAT, cyclic directory, truncation") {
    val good = Cfb.write(Seq("A" -> blobOf(300, 7), "B" -> blobOf(9000, 8)))
    assert(Cfb.parse("plain text, not cfb".getBytes) == Left("not_cfb"))
    assert(Cfb.parse(java.util.Arrays.copyOf(good, 300)) ==
      Left("truncated_cfb"))
    // cut the file mid-sector: some chain read must fail by name
    assert(Cfb.parse(java.util.Arrays.copyOf(good, good.length - 600)).isLeft)

    // cyclic FAT: point the directory chain's first sector at itself.
    // FAT sector is sector 0 (offset 512); directory start is in
    // header at 48
    val cyc = good.clone()
    val dirStart = (cyc(48) & 0xff) | ((cyc(49) & 0xff) << 8)
    val fatOff = 512 + 4 * dirStart
    cyc(fatOff) = dirStart.toByte; cyc(fatOff + 1) = 0
    cyc(fatOff + 2) = 0; cyc(fatOff + 3) = 0
    assert(Cfb.parse(cyc) == Left("directory_cycle"))

    // cyclic directory tree: make entry 1's right sibling itself
    val dirSectorOff = 512 + 512 * dirStart
    val e1 = dirSectorOff + 128
    val selfRef = good.clone()
    selfRef(e1 + 72) = 1; selfRef(e1 + 73) = 0
    selfRef(e1 + 74) = 0; selfRef(e1 + 75) = 0
    assert(Cfb.parse(selfRef) == Left("directory_cycle"))

    // stream size lying past its mini chain (3840 declared, 300 real)
    val lie = good.clone()
    lie(e1 + 120) = 0x00; lie(e1 + 121) = 0x0F
    assert(Cfb.parse(lie) == Left("ministream_chain_too_short"))

    // declared FAT count not matching the DIFAT
    val fatLie = good.clone()
    fatLie(44) = 9 // nFat = 9, DIFAT only lists 1
    assert(Cfb.parse(fatLie) == Left("fat_count_mismatch"))

    // bomb: total declared stream bytes above the cap
    assert(Cfb.parse(good, maxOut = 1000) == Left("cfb_bomb"))
  }

  test("doc: mixed cp1252+unicode pieces extract through the piece table") {
    val paras = Seq("plain ascii first paragraph",
      "curly “quotes” and café", // cp1252-able
      "unicode tail 中文 Δ") // forces the UTF-16 piece
    val doc = Doc.write(paras)
    val ex = Doc.extract(doc).toOption.get
    assert(ex.text == paras.mkString("\n") + "\n")
    assert(ex.nParagraphs == 3)
    assert(ex.nPieces == 2)
    assert(ex.nUnicodePieces == 1)
  }

  test("doc: field instruction dropped, result kept; cell marks map") {
    val paras = Seq(
      "before \u0013 AUTHOR \u0014Jane Doe\u0015 after",
      "no-sep field \u0013 HIDDEN \u0015 visible",
      "cell\u0007mark and line\u000bbreak")
    val ex = Doc.extract(Doc.write(paras)).toOption.get
    assert(ex.text ==
      "before Jane Doe after\nno-sep field  visible\n" +
        "cell\tmark and line\nbreak\n")
  }

  test("doc named rejections") {
    assert(Doc.extract("not cfb at all".getBytes) ==
      Left(Doc.Rejected("cfb_not_cfb")))
    // a CFB with no WordDocument stream
    val notDoc = Cfb.write(Seq("SomethingElse" -> blobOf(64, 5)))
    assert(Doc.extract(notDoc) == Left(Doc.Rejected("missing_worddocument")))
    val good = Doc.write(Seq("hello word"))
    val parsed = Cfb.parse(good).toOption.get
    val table = parsed.streams("1Table")

    // fEncrypted is bit 8 of the 0x0A flags -> low bit of byte 0x0B
    val word1 = parsed.streams("WordDocument").clone()
    word1(0x0B) = (word1(0x0B) | 0x01).toByte
    assert(Doc.extract(Cfb.write(Seq(
      "WordDocument" -> word1, "1Table" -> table))) ==
      Left(Doc.Rejected("doc_encrypted")))

    // wrong magic in the stream
    val word2 = parsed.streams("WordDocument").clone()
    word2(0) = 0; word2(1) = 0
    assert(Doc.extract(Cfb.write(Seq(
      "WordDocument" -> word2, "1Table" -> table))) ==
      Left(Doc.Rejected("not_word_document")))

    // missing table stream (fWhichTblStm says 1Table; only 0Table there)
    assert(Doc.extract(Cfb.write(Seq(
      "WordDocument" -> parsed.streams("WordDocument"),
      "0Table" -> table))) ==
      Left(Doc.Rejected("missing_table_stream")))

    // piece data cut off: text bytes begin at 0x400; keep only 2 of them
    val cut = java.util.Arrays.copyOf(parsed.streams("WordDocument"),
      0x400 + 2)
    assert(Doc.extract(Cfb.write(Seq(
      "WordDocument" -> cut, "1Table" -> table))) ==
      Left(Doc.Rejected("piece_escapes_stream")))

    // truncated piece table: lcbClx pointing past the table stream
    val word3 = parsed.streams("WordDocument").clone()
    word3(0x1A6) = 0xFF.toByte; word3(0x1A7) = 0x7F.toByte
    assert(Doc.extract(Cfb.write(Seq(
      "WordDocument" -> word3, "1Table" -> table))) ==
      Left(Doc.Rejected("clx_out_of_table")))
  }
}
