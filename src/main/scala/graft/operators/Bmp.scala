package graft.operators

/** Windows BMP codec (BITMAPFILEHEADER + BITMAPINFOHEADER, the public
  * DIB format crawled office/document dumps still carry): 8-bpp
  * palette-indexed and 24-bpp BGR truecolor, uncompressed (BI_RGB) and
  * run-length (BI_RLE8) pixel data, bottom-up rows padded to 4 bytes.
  *
  * Same reject-don't-guess contract as the other codecs: any grammar
  * violation — bad magic, unknown bpp/compression, truncated rows, an
  * RLE stream writing past a row or missing its end-of-bitmap escape,
  * dimension caps exceeded — decodes to None, never a guessed image.
  * Decoded output is row-major TOP-DOWN (the orientation every other
  * frame op here uses), so the bottom-up flip is part of what the
  * pixel-replay oracles verify.
  */
object Bmp {

  private val MaxPixels = 1L << 26

  import LE.{putU16, putU32, u16, u32}
  private def i32(b: Array[Byte], i: Int): Int = u32(b, i).toInt

  private def headers(
      o: java.io.ByteArrayOutputStream,
      w: Int, h: Int, bpp: Int, compression: Int,
      paletteEntries: Int, dataSize: Int): Unit = {
    val offset = 14 + 40 + 4 * paletteEntries
    o.write('B'); o.write('M')
    putU32(o, offset.toLong + dataSize)
    putU32(o, 0); putU32(o, offset.toLong)
    putU32(o, 40); putU32(o, w.toLong); putU32(o, h.toLong)
    putU16(o, 1); putU16(o, bpp); putU32(o, compression.toLong)
    putU32(o, dataSize.toLong); putU32(o, 2835); putU32(o, 2835)
    putU32(o, paletteEntries.toLong); putU32(o, 0)
  }

  /** 8-bpp grayscale-palette BMP from top-down row-major bytes. */
  def encodeGray(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h)
    val stride = (w + 3) & ~3
    val o = new java.io.ByteArrayOutputStream()
    headers(o, w, h, bpp = 8, compression = 0, paletteEntries = 256,
      dataSize = stride * h)
    for (c <- 0 until 256) { o.write(c); o.write(c); o.write(c); o.write(0) }
    var y = h - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) { o.write(px(y * w + x)); x += 1 }
      while (x < stride) { o.write(0); x += 1 }
      y -= 1
    }
    o.toByteArray
  }

  /** 24-bpp BGR BMP from top-down row-major RGB triples (r,g,b order in
    * `rgb`; the file stores b,g,r per spec). */
  def encodeColor(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && rgb.length == 3 * w * h)
    val stride = (3 * w + 3) & ~3
    val o = new java.io.ByteArrayOutputStream()
    headers(o, w, h, bpp = 24, compression = 0, paletteEntries = 0,
      dataSize = stride * h)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val i = 3 * (y * w + x)
        o.write(rgb(i + 2)); o.write(rgb(i + 1)); o.write(rgb(i))
        x += 1
      }
      var p = 3 * w
      while (p < stride) { o.write(0); p += 1 }
      y -= 1
    }
    o.toByteArray
  }

  /** 8-bpp BI_RLE8 BMP: encoded runs for repeats, absolute mode for
    * literal stretches, EOL after each row, EOB at the end — the
    * standard escape grammar, exercised end to end. */
  def encodeGrayRle8(w: Int, h: Int, px: Array[Byte]): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h)
    val data = new java.io.ByteArrayOutputStream()
    // repeat-run length at (x, y), capped
    def runAt(y: Int, x: Int, cap: Int): Int = {
      var r = 1
      while (x + r < w && r < cap && px(y * w + x + r) == px(y * w + x)) r += 1
      r
    }
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val run = runAt(y, x, 255)
        if (run >= 3) {
          data.write(run); data.write(px(y * w + x)); x += run
        } else {
          // literal stretch: extend until a >=3 repeat begins (or row
          // end / absolute-mode cap)
          var lit = run
          var stop = false
          while (!stop && x + lit < w && lit < 254) {
            val r2 = runAt(y, x + lit, 3)
            if (r2 >= 3) stop = true else lit += r2
          }
          if (lit >= 3) {
            data.write(0); data.write(lit)
            var i = 0
            while (i < lit) { data.write(px(y * w + x + i)); i += 1 }
            if ((lit & 1) == 1) data.write(0) // word-align absolute mode
          } else {
            // 1-2 stragglers: encoded runs of their own length
            var i = 0
            while (i < lit) { data.write(1); data.write(px(y * w + x + i)); i += 1 }
          }
          x += lit
        }
      }
      data.write(0); data.write(if (y == 0) 1 else 0) // EOL / EOB
      y -= 1
    }
    val payload = data.toByteArray
    val o = new java.io.ByteArrayOutputStream()
    headers(o, w, h, bpp = 8, compression = 1, paletteEntries = 256,
      dataSize = payload.length)
    for (c <- 0 until 256) { o.write(c); o.write(c); o.write(c); o.write(0) }
    o.write(payload)
    o.toByteArray
  }

  /** Decode an 8-bpp BMP to (w, h, top-down grayscale bytes). The
    * palette must be the identity grayscale ramp — this entry point is
    * for EXACT gray replay; color goes through [[decodeColor]], indexed
    * art through [[decodeIndexed]]. */
  def decodeGray(blob: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodeIndexed(blob).flatMap { case (w, h, pal, idx) =>
      // grayscale contract: palette entry c must be (c, c, c)
      val identityRamp =
        pal.indices.forall(c => pal(c) == ((c << 16) | (c << 8) | c))
      if (identityRamp) Some((w, h, idx)) else None
    }

  /** Decode an 8-bpp BMP (BI_RGB or BI_RLE8) to (w, h, palette RGB ints,
    * top-down indices). */
  def decodeIndexed(blob: Array[Byte]): Option[(Int, Int, Array[Int], Array[Byte])] = {
    val hdr = parseHeader(blob).getOrElse(return None)
    val (w, h, bpp, comp, palN, dataOff) = hdr
    if (bpp != 8) return None
    if (comp != 0 && comp != 1) return None
    val palBytes = 14 + 40
    if (palBytes + 4 * palN > blob.length) return None
    val pal = Array.tabulate(palN) { c =>
      val b = blob(palBytes + 4 * c) & 0xff
      val g = blob(palBytes + 4 * c + 1) & 0xff
      val r = blob(palBytes + 4 * c + 2) & 0xff
      (r << 16) | (g << 8) | b
    }
    val out = new Array[Byte](w * h)
    if (comp == 0) {
      val stride = (w + 3) & ~3
      if (dataOff + stride.toLong * h > blob.length) return None
      var y = 0
      while (y < h) {
        val src = dataOff + (h - 1 - y) * stride
        System.arraycopy(blob, src, out, y * w, w)
        y += 1
      }
    } else {
      // BI_RLE8: bottom-up rows, escape grammar; reject overruns and
      // a stream that ends without EOB
      var i = dataOff
      var x = 0
      var row = h - 1
      var eob = false
      while (!eob) {
        if (i + 2 > blob.length) return None
        val n = blob(i) & 0xff
        val v = blob(i + 1) & 0xff
        i += 2
        if (n > 0) {
          if (row < 0 || x + n > w) return None
          var k = 0
          while (k < n) { out(row * w + x + k) = v.toByte; k += 1 }
          x += n
        } else v match {
          case 0 => // end of line: the row must be fully painted —
            // underfilled rows are "undefined pixels" per spec, which
            // the lossless-replay contract rejects like delta escapes
            if (row < 0 || x != w) return None
            x = 0; row -= 1
          case 1 =>
            if (row != 0 || x != w) return None // EOB only after the last full row
            eob = true
          case 2 => // delta: undefined pixels — reject (lossless replay only)
            return None
          case lit =>
            if (row < 0 || x + lit > w || i + lit > blob.length) return None
            var k = 0
            while (k < lit) { out(row * w + x + k) = blob(i + k); k += 1 }
            i += lit + (lit & 1)
            x += lit
        }
      }
      if (i != blob.length) return None // no bytes may trail the EOB
    }
    // every pixel must reference a declared palette entry — an
    // out-of-range index is a grammar violation, and decoding it to
    // "whatever byte it was" would be a guessed image
    if (palN < 256) {
      var k = 0
      while (k < out.length) {
        if ((out(k) & 0xff) >= palN) return None
        k += 1
      }
    }
    Some((w, h, pal, out))
  }

  /** Decode a 24-bpp BI_RGB BMP to (w, h, top-down r,g,b triples). */
  def decodeColor(blob: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val hdr = parseHeader(blob).getOrElse(return None)
    val (w, h, bpp, comp, _, dataOff) = hdr
    if (bpp != 24 || comp != 0) return None
    val stride = (3 * w + 3) & ~3
    if (dataOff + stride.toLong * h > blob.length) return None
    val out = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val src = dataOff + (h - 1 - y) * stride
      var x = 0
      while (x < w) {
        out(3 * (y * w + x)) = blob(src + 3 * x + 2) // r
        out(3 * (y * w + x) + 1) = blob(src + 3 * x + 1) // g
        out(3 * (y * w + x) + 2) = blob(src + 3 * x) // b
        x += 1
      }
      y += 1
    }
    Some((w, h, out))
  }

  /** BMP fixture corpus (doc_id % 3 == 0): REAL gray BMPs with
    * id-derived dims and pixels — w = 5 + id%6, h = 4 + id%5,
    * pixel(y, x) = (id + 3x + 7y) mod 256 — even ids uncompressed
    * BI_RGB, odd ids BI_RLE8, so both pixel-data grammars round-trip
    * on every run. */
  def bmpImagesFromDocuments(
      spark: org.apache.spark.sql.SparkSession,
      documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 6).toInt
        val h = 4 + (id % 5).toInt
        val px = Array.tabulate(w * h)(i =>
          ((id + 3L * (i % w) + 7L * (i / w)) % 256).toByte)
        val blob = if (id % 2 == 0) encodeGray(w, h, px)
          else encodeGrayRle8(w, h, px)
        Multimodal.MediaRow(id, "image", blob)
      })
  }

  /** 24-bpp twin (same ids): channel c of pixel (y, x) =
    * (id + 3x + 7y + 11c) mod 256, stored BGR on disk, decoded back to
    * RGB triples. */
  def bmpColorImagesFromDocuments(
      spark: org.apache.spark.sql.SparkSession,
      documents: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Dataset[Multimodal.MediaRow] = {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    documents.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 5 + (id % 6).toInt
        val h = 4 + (id % 5).toInt
        val rgb = Array.tabulate(3 * w * h) { j =>
          val p = j / 3; val c = j % 3
          ((id + 3L * (p % w) + 7L * (p / w) + 11L * c) % 256).toByte
        }
        Multimodal.MediaRow(id, "image", encodeColor(w, h, rgb))
      })
  }

  /** (media_id, compressed, n_px, px_checksum) per decodable gray BMP;
    * corrupt blobs quarantine (contribute nothing). */
  def extractBmpGrayStats(
      media: org.apache.spark.sql.Dataset[Multimodal.MediaRow]): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      decodeGray(row.payload).map { case (w, h, px) =>
        (row.media_id, (u32(row.payload, 30) == 1),
          w * h, px.foldLeft(0L)((a, b) => a + (b & 0xff)))
      }
    }.toDF("media_id", "compressed", "n_px", "px_checksum")
  }

  /** (media_id, n_px, r_sum, g_sum, b_sum) per decodable 24-bpp BMP. */
  def extractBmpColorStats(
      media: org.apache.spark.sql.Dataset[Multimodal.MediaRow]): org.apache.spark.sql.DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      decodeColor(row.payload).map { case (w, h, rgb) =>
        var r = 0L; var g = 0L; var b = 0L
        var i = 0
        while (i < rgb.length) {
          r += rgb(i) & 0xff; g += rgb(i + 1) & 0xff; b += rgb(i + 2) & 0xff
          i += 3
        }
        (row.media_id, w * h, r, g, b)
      }
    }.toDF("media_id", "n_px", "r_sum", "g_sum", "b_sum")
  }

  /** (w, h, bpp, compression, paletteEntries, dataOffset) or None. */
  private def parseHeader(blob: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int)] = {
    if (blob.length < 54) return None
    if (blob(0) != 'B' || blob(1) != 'M') return None
    val dataOff = u32(blob, 10)
    if (u32(blob, 14) != 40) return None // BITMAPINFOHEADER only
    val w = i32(blob, 18)
    val h = i32(blob, 22)
    if (w < 1 || h < 1) return None // top-down (negative h) not accepted
    if (w.toLong * h > MaxPixels) return None
    if (u16(blob, 26) != 1) return None
    val bpp = u16(blob, 28)
    val comp = u32(blob, 30).toInt
    val palN = {
      val declared = u32(blob, 46).toInt
      if (bpp == 8) { if (declared == 0) 256 else declared } else 0
    }
    if (palN > 256) return None
    if (dataOff < 54 + 4L * palN || dataOff > blob.length) return None
    Some((w, h, bpp, comp, palN, dataOff.toInt))
  }
}
