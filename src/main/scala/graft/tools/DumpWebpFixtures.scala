package graft.tools

import graft.operators.{Vp8, Vp8l}

/** Dump graft-ENCODED WebP blobs plus their expected pixels for the
  * reverse interop check: `tools/verify_webp_encoders.py` decodes each
  * blob with the SYSTEM libwebp (the reference implementation) and
  * compares pixel-exactly — Vp8InteropSpec proves graft reads real
  * libwebp files; this proves libwebp reads graft's files, sealing
  * both directions of spec conformance.
  *
  *   runMain graft.tools.DumpWebpFixtures <outDir>
  *
  * Layout per case: `<name>.webp` plus `<name>.argb` (lossless:
  * int32-LE w,h then big-endian ARGB) or `<name>.yuv` (lossy:
  * int32-LE w,h then Y,U,V planes at cropped dims).
  */
object DumpWebpFixtures {

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args.headOption.getOrElse("/tmp/graft-webp-enc"))
    java.nio.file.Files.createDirectories(out)

    def write(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(out.resolve(name), bytes)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    // ---- lossless: the q235 feature mix over id-formula pixels ----
    for (id <- 0L until 14L) {
      val w = 5 + (id % 20).toInt
      val h = 4 + (id % 15).toInt
      val mode = (id % 7).toInt
      val px =
        if (mode == 4) {
          val nColors = 2 + (id % 30).toInt
          Array.tabulate(w * h) { k =>
            val x = k % w; val y = k / w
            val ci = ((id + 3 * x + 7 * y) % nColors).toInt
            (0xff << 24) | (((id * 17 + 29 * ci) % 256).toInt << 16) |
              (((id * 23 + 31 * ci) % 256).toInt << 8) |
              ((id * 13 + 37 * ci) % 256).toInt
          }
        } else Array.tabulate(w * h) { k =>
          val x = k % w; val y = k / w
          (0xff << 24) | (((id * 17 + 29 * x + 3 * y) % 256).toInt << 16) |
            (((id * 23 + 31 * y + 5 * x) % 256).toInt << 8) |
            ((id * 13 + 37 * (x / 3) + 7 * (y / 2)) % 256).toInt
        }
      val blob = mode match {
        case 0 => Vp8l.encode(w, h, px, cacheBits = 4 + (id % 5).toInt)
        case 1 => Vp8l.encode(w, h, px, lz77 = false, subtractGreen = true)
        case 2 => Vp8l.encode(w, h, px, cacheBits = 3,
          predictorBits = 2 + (id % 4).toInt)
        case 3 => Vp8l.encode(w, h, px, colorBits = 3)
        case 4 => Vp8l.encode(w, h, px, palette = true, lz77 = false)
        case 5 => Vp8l.encode(w, h, px, cacheBits = 4, predictorBits = 3,
          colorBits = 4, subtractGreen = true)
        case _ => Vp8l.encode(w, h, px, cacheBits = 3, metaSplitBits = 2)
      }
      write(s"lossless_$id.webp", blob)
      val bb = java.nio.ByteBuffer.allocate(8 + px.length * 4)
      bb.put(le32(w)).put(le32(h))
      px.foreach(bb.putInt) // big-endian ARGB, WebPDecodeARGB's layout
      write(s"lossless_$id.argb", bb.array())
    }

    // ---- lossy: the q239 exactness mix (filter level 0) ----
    for (id <- 0L until 10L) {
      val w = 16 + (id % 5).toInt * 16 + (id % 7).toInt
      val h = 16 + (id % 3).toInt * 16 + (id % 5).toInt
      def tY(mx: Int, my: Int) = ((id * 7 + 29 * mx + 31 * my) % 256).toInt
      def tU(mx: Int, my: Int) = ((id * 11 + 13 * mx + 17 * my) % 256).toInt
      def tV(mx: Int, my: Int) = ((id * 5 + 19 * mx + 23 * my) % 256).toInt
      val blob = Vp8.encode(w, h, tY, tU, tV,
        nTokenParts = 1 << (id % 3).toInt, withSegmentation = id % 4 == 1)
      write(s"lossy_$id.webp", blob)
      val uvW = (w + 1) / 2; val uvH = (h + 1) / 2
      val buf = new java.io.ByteArrayOutputStream()
      buf.write(le32(w)); buf.write(le32(h))
      for (py <- 0 until h; pxx <- 0 until w) buf.write(tY(pxx / 16, py / 16))
      for (py <- 0 until uvH; pxx <- 0 until uvW) buf.write(tU(pxx / 8, py / 8))
      for (py <- 0 until uvH; pxx <- 0 until uvW) buf.write(tV(pxx / 8, py / 8))
      write(s"lossy_$id.yuv", buf.toByteArray)
    }
    println(s"wrote ${out.toAbsolutePath}")
  }
}
