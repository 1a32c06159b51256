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
        graft.operators.Vp8.decode(webp) match {
          case Right(yuv) =>
            val got = graft.operators.WebpRgb.toRgba(yuv)
            // .rgba carries an 8-byte w/h header
            val body = java.util.Arrays.copyOfRange(want, 8, want.length)
            if (java.util.Arrays.equals(got, body)) pass += 1
            else {
              fail += 1
              val d = got.zip(body).indexWhere(x => x._1 != x._2)
              println(s"DIFF ${p.getFileName}: first byte diff at $d " +
                s"(pixel ${d / 4} ch ${d % 4}) dims ${yuv.w}x${yuv.h}")
            }
          case Left(r) =>
            fail += 1
            println(s"REJ  ${p.getFileName}: ${r.reason}")
        }
      }
    println(s"$pass/${pass + fail} random libwebp files RGBA-exact")
    if (fail > 0) sys.exit(1)
  }
}
