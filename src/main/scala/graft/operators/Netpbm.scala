package graft.operators

/** Netpbm binary formats — P5 (PGM grayscale) and P6 (PPM RGB): the
  * simplest real raster container, and the one whose entire parsing
  * surface is the HEADER grammar: ASCII tokens separated by arbitrary
  * whitespace, with `#` comment lines allowed anywhere BETWEEN tokens
  * and exactly ONE whitespace byte separating the maxval from the
  * raster (a naive "skip all whitespace" reader eats raster bytes that
  * happen to look like whitespace — the classic Netpbm bug).
  *
  * Contract: maxval 255 only (the 2-byte-per-sample >255 variant is out
  * of contract), dims within the 64M-pixel cap, raster exactly
  * w·h·channels bytes. Anything else — wrong magic, a comment inside a
  * token, truncated raster, trailing garbage — rejects to None.
  */
object Netpbm {

  /** Encode grayscale (P5). A comment line is deliberately planted in
    * the header so decoders must handle it. */
  def encodeGray(w: Int, h: Int, px: Array[Byte],
      comment: String = "graft"): Array[Byte] = {
    require(w >= 1 && h >= 1 && px.length == w * h)
    require(!comment.contains("\n"))
    s"P5\n# $comment\n$w $h\n255\n".getBytes("US-ASCII") ++ px
  }

  /** Encode RGB (P6), interleaved 3 bytes per pixel. */
  def encodeRgb(w: Int, h: Int, rgb: Array[Byte],
      comment: String = "graft"): Array[Byte] = {
    require(w >= 1 && h >= 1 && rgb.length == w * h * 3)
    require(!comment.contains("\n"))
    s"P6\n# $comment\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /** Decode P5/P6 → (w, h, channels, pixels). */
  def decode(p: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (p.length < 2 || p(0) != 'P') return None
    val channels = p(1) match {
      case '5' => 1
      case '6' => 3
      case _ => return None
    }
    // token scanner: whitespace-separated, '#' starts a comment running
    // to end of line; comments only legal BETWEEN tokens
    var i = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    def nextToken(): Option[Long] = {
      while (i < p.length && (isWs(p(i)) || p(i) == '#')) {
        if (p(i) == '#') {
          while (i < p.length && p(i) != '\n') i += 1
        } else i += 1
      }
      if (i >= p.length) return None
      var v = 0L
      var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0')
        if (v > Int.MaxValue) return None
        i += 1
        any = true
      }
      // a token must terminate at whitespace or a comment start; any
      // other byte (a letter fused to digits, a '#' inside the number)
      // is a malformed header
      if (!any) return None
      if (i < p.length && !isWs(p(i)) && p(i) != '#') return None
      Some(v)
    }
    val w = nextToken().getOrElse(return None)
    val h = nextToken().getOrElse(return None)
    val maxval = nextToken().getOrElse(return None)
    if (w < 1 || h < 1 || w * h > (1L << 26)) return None
    if (maxval != 255) return None
    // EXACTLY one whitespace byte between maxval and the raster
    if (i >= p.length || !isWs(p(i))) return None
    i += 1
    val n = (w * h * channels).toInt
    if (p.length - i != n) return None // truncated OR trailing garbage
    Some((w.toInt, h.toInt, channels,
      java.util.Arrays.copyOfRange(p, i, i + n)))
  }
}
