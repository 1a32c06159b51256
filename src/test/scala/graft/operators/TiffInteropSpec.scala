package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Differential interop against the system libtiff: every fixture in
  * src/test/resources/graft/tiff was WRITTEN by libtiff
  * (tools/make_tiff_fixtures.py) across the compression × predictor ×
  * content matrix — including LCG images large enough to push the LZW
  * table past every early-change width boundary and past the
  * 4094-entry Clear — and the .gray sidecar holds the exact pixels
  * libtiff itself reads back. graft must reproduce them byte-exact. */
class TiffInteropSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/tiff/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val manifest: Seq[(String, Int, Int, Int, Int, String)] =
    new String(resource("MANIFEST.txt"), "UTF-8").linesIterator.map { l =>
      val Array(base, w, h, comp, pred, kind) = l.trim.split(" ")
      (base, w.toInt, h.toInt, comp.toInt, pred.toInt, kind)
    }.toSeq

  test("libtiff-written LZW/Deflate/PackBits fixtures decode byte-exact") {
    assert(manifest.size == 25)
    manifest.foreach { case (base, w, h, comp, pred, kind) =>
      val tif = resource(s"$base.tif")
      val want = resource(s"$base.gray")
      val got = Tiff.decodeGray(tif)
      assert(got.isDefined, s"$base ($kind comp=$comp pred=$pred) rejected")
      val (gw, gh, px) = got.get
      assert(gw == w && gh == h, s"$base dims: got ${gw}x$gh want ${w}x$h")
      assert(px.sameElements(want),
        s"$base ($kind comp=$comp pred=$pred) pixels differ")
    }
  }

  test("graft-encoded compressed TIFFs round-trip through graft") {
    for {
      comp <- Seq(1, 5, 8, 32773)
      pred <- if (comp == 1 || comp == 32773) Seq(1) else Seq(1, 2)
      little <- Seq(true, false)
    } {
      val w = 61; val h = 37
      val px = Array.tabulate(w * h)(i =>
        ((i * 31 + (i / w) * 7 + comp) % 256).toByte)
      val enc = Tiff.encodeGray(w, h, px, rowsPerStrip = 10,
        littleEndian = little, compression = comp, predictor = pred)
      val dec = Tiff.decodeGray(enc)
      assert(dec.isDefined, s"comp=$comp pred=$pred little=$little rejected")
      assert(dec.get._3.sameElements(px),
        s"comp=$comp pred=$pred little=$little pixels differ")
    }
  }

  test("LZW streams crossing width bumps and the 4094-entry Clear round-trip") {
    // LCG bytes grow the table ~1 entry per byte: 16K forces 9->10->11
    // ->12 and at least one Clear
    var s = 12345
    val data = Array.fill(16384) {
      s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte
    }
    val enc = Tiff.lzwEncode(data)
    val dec = Tiff.lzwDecode(enc, 0, enc.length, data.length)
    assert(dec.isDefined && dec.get.sameElements(data))
  }

  test("hostile compressed strips reject: truncation, short and long output") {
    val w = 40; val h = 30
    val px = Array.tabulate(w * h)(i => (i % 251).toByte)
    Seq(5, 8, 32773).foreach { comp =>
      val enc = Tiff.encodeGray(w, h, px, rowsPerStrip = h,
        littleEndian = true, compression = comp)
      // chop the tail of the single strip: decode must reject
      assert(Tiff.decodeGray(java.util.Arrays.copyOf(enc, enc.length - 4))
        .isEmpty, s"comp=$comp accepted a truncated strip")
    }
    // a declared height larger than the strip decodes to: short output
    val enc5 = Tiff.encodeGray(w, h, px, rowsPerStrip = h,
      littleEndian = true, compression = 5)
    // II layout: height entry value field at 8 + 2 + 1*12 + 8
    val grown = enc5.clone()
    grown(8 + 2 + 12 + 8) = (h + 1).toByte
    assert(Tiff.decodeGray(grown).isEmpty, "short strip accepted")
  }

  test("graft-encoded TIFFs dump for the reverse libtiff sweep") {
    // tools/verify_tiff_encoders.py reads these back through the REAL
    // libtiff (TIFFReadScanline) and compares pixels — the
    // verify_brotli_encoders.py pattern
    val outDir = new java.io.File("target/tiff_encoder_out")
    outDir.mkdirs()
    var idx = 0
    for {
      comp <- Seq(1, 5, 8, 32773)
      pred <- if (comp == 5 || comp == 8) Seq(1, 2) else Seq(1)
      little <- Seq(true, false)
      (w, h, rps) <- Seq((33, 21, 5), (96, 64, 64))
    } {
      var s = idx * 2654435761L.toInt + 97
      val px = Array.fill(w * h) {
        s = s * 1103515245 + 12345; ((s >> 16) & 0xff).toByte
      }
      val enc = Tiff.encodeGray(w, h, px, rps, little, comp, pred)
      java.nio.file.Files.write(
        new java.io.File(outDir, f"$idx%02d_${w}x${h}_c${comp}_p$pred.tif")
          .toPath, enc)
      java.nio.file.Files.write(
        new java.io.File(outDir, f"$idx%02d_${w}x${h}_c${comp}_p$pred.gray")
          .toPath, px)
      idx += 1
    }
    assert(idx == 24)
  }

  test("unsupported compressions still reject by name (JPEG-in-TIFF, fax)") {
    val good = Tiff.encodeGray(9, 8, Array.fill(72)(7.toByte),
      rowsPerStrip = 8, littleEndian = true)
    // compression entry value field (II): 10 + 3*12 + 8
    Seq(2, 3, 4, 6, 7, 32946).foreach { c =>
      val bad = good.clone()
      bad(10 + 3 * 12 + 8) = (c & 0xff).toByte
      bad(10 + 3 * 12 + 9) = ((c >> 8) & 0xff).toByte
      assert(Tiff.decodeGray(bad).isEmpty, s"compression $c accepted")
    }
  }
}
