package graft.operators

/** Windows ICO container — the favicon format a web crawl actually
  * serves. ICO's quirks are all inherited-but-mutated BMP: each
  * directory entry points at a DIB with NO file header, whose
  * BITMAPINFOHEADER declares DOUBLE the visual height (XOR color rows
  * plus a 1-bpp AND transparency mask, both bottom-up, the mask's rows
  * padded to 32-BIT boundaries — not BMP's byte padding), and a
  * directory byte of 0 means 256. A reader that reuses its BMP decoder
  * verbatim mis-tiles every icon.
  *
  * Contract: 8-bpp palette DIBs, BI_RGB, height exactly 2× the entry's,
  * every offset/size bounds-checked against the file, dimension caps.
  * The AND mask is surfaced (transparent-pixel count), not discarded —
  * transparency is data a thumbnailer needs.
  */
object Ico {

  import LE.{putU16, putU32, u16, u32}

  private def maskStride(w: Int): Int = ((w + 31) / 32) * 4

  /** Encode gray 8-bpp icons; `transparent(k)` marks pixel k of image
    * `imgs(i)` transparent in its AND mask. */
  def encode(imgs: Seq[(Int, Int, Array[Byte], Int => Boolean)]): Array[Byte] = {
    require(imgs.nonEmpty && imgs.size <= 0xffff)
    val bodies = imgs.map { case (w, h, px, transparent) =>
      require(w >= 1 && w <= 256 && h >= 1 && h <= 256 && px.length == w * h)
      val o = new java.io.ByteArrayOutputStream()
      putU32(o, 40); putU32(o, w.toLong); putU32(o, 2L * h) // doubled height
      putU16(o, 1); putU16(o, 8); putU32(o, 0)
      putU32(o, 0); putU32(o, 2835); putU32(o, 2835)
      putU32(o, 256); putU32(o, 0)
      var j = 0
      while (j < 256) { o.write(j); o.write(j); o.write(j); o.write(0); j += 1 }
      val stride = (w + 3) & ~3
      var y = h - 1
      while (y >= 0) { // XOR data bottom-up
        var x = 0
        while (x < w) { o.write(px(y * w + x) & 0xff); x += 1 }
        while (x < stride) { o.write(0); x += 1 }
        y -= 1
      }
      val ms = maskStride(w)
      y = h - 1
      while (y >= 0) { // AND mask bottom-up, 1 bpp MSB-first, 32-bit rows
        val row = new Array[Byte](ms)
        var x = 0
        while (x < w) {
          if (transparent(y * w + x))
            row(x >> 3) = (row(x >> 3) | (0x80 >> (x & 7))).toByte
          x += 1
        }
        o.write(row)
        y -= 1
      }
      o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    putU16(out, 0); putU16(out, 1); putU16(out, imgs.size)
    var off = 6 + 16 * imgs.size
    imgs.zip(bodies).foreach { case ((w, h, _, _), body) =>
      out.write(if (w == 256) 0 else w)
      out.write(if (h == 256) 0 else h)
      out.write(0); out.write(0) // 256-entry palette → 0 per spec
      putU16(out, 1); putU16(out, 8)
      putU32(out, body.length.toLong); putU32(out, off.toLong)
      off += body.length
    }
    bodies.foreach(out.write)
    out.toByteArray
  }

  /** Decode → per icon (w, h, top-down pixels, transparent count). */
  def decode(p: Array[Byte]): Option[Seq[(Int, Int, Array[Byte], Int)]] = {
    if (p.length < 6 || u16(p, 0) != 0 || u16(p, 2) != 1) return None
    val n = u16(p, 4)
    if (n < 1 || 6 + 16 * n > p.length) return None
    val icons = (0 until n).map { e =>
      val d = 6 + 16 * e
      val w0 = p(d) & 0xff; val h0 = p(d + 1) & 0xff
      val w = if (w0 == 0) 256 else w0
      val h = if (h0 == 0) 256 else h0
      val size = u32(p, d + 8); val off = u32(p, d + 12)
      if (off < 0 || size < 0 || off + size > p.length) return None
      val b = off.toInt
      if (size < 40 + 1024) return None
      if (u32(p, b) != 40) return None
      val dw = u32(p, b + 4); val dh = u32(p, b + 8)
      // the DIB height is the XOR+AND total: exactly double the entry's
      if (dw != w || dh != 2L * h) return None
      if (u16(p, b + 12) != 1 || u16(p, b + 14) != 8) return None
      if (u32(p, b + 16) != 0) return None // BI_RGB only
      if (w.toLong * h > (1L << 26)) return None
      val palAt = b + 40
      val xorAt = palAt + 1024
      val stride = (w + 3) & ~3
      val ms = maskStride(w)
      if (xorAt + stride.toLong * h + ms.toLong * h > b + size) return None
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val srcRow = xorAt + (h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val idx = p(srcRow + x) & 0xff
          // palette is gray-identity by contract; verify, don't assume
          if ((p(palAt + idx * 4) & 0xff) != idx) return None
          px(y * w + x) = idx.toByte
          x += 1
        }
        y += 1
      }
      val maskAt = xorAt + stride * h
      var transparent = 0
      y = 0
      while (y < h) {
        val srcRow = maskAt + (h - 1 - y) * ms
        var x = 0
        while (x < w) {
          if (((p(srcRow + (x >> 3)) >> (7 - (x & 7))) & 1) != 0)
            transparent += 1
          x += 1
        }
        y += 1
      }
      (w, h, px, transparent)
    }
    Some(icons)
  }
}
