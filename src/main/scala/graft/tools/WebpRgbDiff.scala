package graft.tools

/** Differential check driven by tools/fuzz_webp_rgba.py: the Python
  * side encodes random content with the system libwebp across
  * qualities/sizes (odd dims included) and dumps `WebPDecodeRGBA`
  * expected output; this main runs graft's full lossy chain —
  * RFC 6386 decode to YUV, fancy upsampling, fixed-point matrix, ALPH
  * merge — and requires sample-exact agreement on every file.
  *
  *   python3 tools/fuzz_webp_rgba.py 150   # generates + runs this
  */
object WebpRgbDiff {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "/tmp/webp_rgba_diff")
    val files = java.nio.file.Files.list(dir).iterator()
    var pass = 0
    var fail = 0
    val it = new scala.collection.Iterator[java.nio.file.Path] {
      def hasNext = files.hasNext
      def next() = files.next()
    }
    it.filter(_.toString.endsWith(".webp")).toSeq.sortBy(_.toString)
      .foreach { p =>
        val webp = java.nio.file.Files.readAllBytes(p)
        val want = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          p.toString.stripSuffix(".webp") + ".rgba"))
        // .rgba carries an 8-byte w/h header
        val body = java.util.Arrays.copyOfRange(want, 8, want.length)
        val isLossless = webp.length > 15 &&
          new String(webp, 12, 4, "US-ASCII") == "VP8L"
        val got: Either[String, Array[Byte]] =
          if (isLossless)
            graft.operators.Vp8l.decode(webp) match {
              case Right((w, h, argb)) =>
                val out = new Array[Byte](w * h * 4)
                var k = 0
                while (k < w * h) {
                  out(4 * k) = ((argb(k) >> 16) & 0xff).toByte
                  out(4 * k + 1) = ((argb(k) >> 8) & 0xff).toByte
                  out(4 * k + 2) = (argb(k) & 0xff).toByte
                  out(4 * k + 3) = ((argb(k) >>> 24) & 0xff).toByte
                  k += 1
                }
                Right(out)
              case Left(r) => Left(r.reason)
            }
          else
            graft.operators.Vp8.decode(webp) match {
              case Right(yuv) => Right(graft.operators.WebpRgb.toRgba(yuv))
              case Left(r) => Left(r.reason)
            }
        got match {
          case Right(rgba) if java.util.Arrays.equals(rgba, body) => pass += 1
          case Right(rgba) =>
            fail += 1
            val d = rgba.zip(body).indexWhere(x => x._1 != x._2)
            println(s"DIFF ${p.getFileName}: first byte diff at $d " +
              s"(pixel ${d / 4} ch ${d % 4}) lossless=$isLossless")
          case Left(r) =>
            fail += 1
            println(s"REJ  ${p.getFileName}: $r")
        }
      }
    println(s"$pass/${pass + fail} random libwebp files RGBA-exact")
    if (fail > 0) sys.exit(1)
  }
}
