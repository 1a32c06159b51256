package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class HeifSpec extends AnyFunSuite {

  test("constructed avif/heic containers census exactly") {
    for {
      avif <- Seq(true, false)
      withExif <- Seq(false, true)
    } {
      val blob = Heif.encode(avif, w = 320, h = 240, payloadLen = 500,
        seed = 7, withExif = withExif)
      val info = Heif.census(blob).toOption.get
      assert(info.brand == (if (avif) "avif" else "heic"))
      assert(info.primaryItemId == 1)
      assert(info.primaryType == (if (avif) "av01" else "hvc1"))
      assert(info.primaryWidth == 320 && info.primaryHeight == 240)
      assert(info.nItems == (if (withExif) 2 else 1))
      assert(info.nExifItems == (if (withExif) 1 else 0))
      assert(info.nProperties == 3) // ispe + codec config + pixi
      assert(info.pixelFate ==
        (if (avif) "av1_pixels_unsupported" else "hevc_pixels_unsupported"))
      assert(info.mdatBytes == 500 + (if (withExif) 8 else 0))
    }
  }

  test("dimensions come from the ASSOCIATED ispe, not file order") {
    // decoy: a second ispe in ipco NOT associated with the primary item
    // would fool a first-ispe-wins reader; our builder associates
    // props 1..3 where prop 1 is the real ispe — verify the wiring by
    // construction (the verify tool cross-checks against libheif)
    val blob = Heif.encode(avif = true, w = 64, h = 48, payloadLen = 100,
      seed = 3)
    assert(Heif.census(blob).toOption.get.primaryWidth == 64)
  }

  test("hostile containers quarantine with named reasons") {
    val good = Heif.encode(avif = true, w = 32, h = 24, payloadLen = 64,
      seed = 5)
    assert(Heif.census(Array.emptyByteArray) == Left("truncated_box"))
    assert(Heif.census(good.dropRight(80)) match {
      case Left(r) => r == "extent_escapes_file" || r == "box_overruns_parent" ||
        r == "truncated_box"
      case _ => false
    })
    // not ftyp-led
    assert(Heif.census("xxxxxxxxxxxxxxxxxxx".getBytes) match {
      case Left(_) => true; case _ => false
    })
    // size lying beyond the parent
    val lie = good.clone(); lie(0) = 0x7f
    assert(Heif.census(lie).isLeft)
    // an extent pointing past EOF: grow the iloc extent length field —
    // find mdat and truncate just after the meta so extents escape
    val metaEnd = {
      var p = 0
      var found = -1
      while (found < 0) {
        val size = ((good(p) & 0xff) << 24) | ((good(p + 1) & 0xff) << 16) |
          ((good(p + 2) & 0xff) << 8) | (good(p + 3) & 0xff)
        val t = new String(good, p + 4, 4, "ISO-8859-1")
        if (t == "meta") found = p + size else p += size
      }
      found
    }
    assert(Heif.census(java.util.Arrays.copyOf(good, metaEnd)) ==
      Left("extent_escapes_file"))
  }

  test("body-at-EOF boxes bail by name instead of crashing (advice r13)") {
    def be32(v: Int) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(t: String, body: Array[Byte]) =
      be32(8 + body.length) ++ t.getBytes("ISO-8859-1") ++ body
    val ftyp = box("ftyp", "avif".getBytes ++ be32(0) ++ "avif".getBytes)
    val hdlr = box("hdlr",
      be32(0) ++ be32(0) ++ "pict".getBytes) // fullbox + pre_defined + type
    // an 8-byte pitm (header only, zero body) as the LAST child of the
    // LAST box: its version byte sits exactly at EOF — the raw bytes(cb)
    // read was an ArrayIndexOutOfBoundsException escaping the Either
    val pitm = box("pitm", Array.emptyByteArray)
    val blob = ftyp ++ box("meta", be32(0) ++ hdlr ++ pitm)
    assert(Heif.census(blob) == Left("truncated_box"))
    // an ipma declaring more entries than its body holds must stop at
    // the box boundary, not walk into sibling bytes
    val ipma = box("ipma", be32(0) ++ be32(1000)) // 1000 entries, no data
    val iprp = box("iprp", box("ipco", Array.emptyByteArray) ++ ipma)
    val blob2 = ftyp ++ box("meta", be32(0) ++ hdlr ++ iprp) ++
      box("free", new Array[Byte](64))
    assert(Heif.census(blob2) == Left("truncated_box"))
  }

  test("fixture dump for the reference-parser cross-check") {
    val outDir = new java.io.File("target/heif_encoder_out")
    outDir.mkdirs()
    var idx = 0
    for {
      avif <- Seq(true, false)
      (w, h) <- Seq((320, 240), (17, 9), (1920, 1080))
      withExif <- Seq(false, true)
    } {
      val blob = Heif.encode(avif, w, h, payloadLen = 200 + 13 * idx,
        seed = idx, withExif = withExif)
      val ext = if (avif) "avif" else "heic"
      java.nio.file.Files.write(new java.io.File(outDir,
        f"$idx%02d_${w}x${h}_${if (withExif) "exif" else "plain"}.$ext")
        .toPath, blob)
      idx += 1
    }
    assert(idx == 12)
  }
}
