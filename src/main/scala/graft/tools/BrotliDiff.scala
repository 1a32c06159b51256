package graft.tools

/** Differential check driven by tools/fuzz_brotli_diff.py: the Python
  * side generates random-but-VALID brotli streams with the system
  * libbrotli across the full encoder parameter space (qualities 0..11,
  * windows 10..24, GENERIC/TEXT/FONT modes, content shapes, FLUSH
  * splits) into a directory of NN.br/NN.raw pairs; this main decodes
  * every .br with graft.operators.Brotli and requires byte-exact
  * agreement — broad-coverage interop beyond the checked-in fixture
  * set (which stays the deterministic CI gate).
  *
  *   python3 tools/fuzz_brotli_diff.py 300   # generates + runs this
  */
object BrotliDiff {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "/tmp/brotli_diff")
    val brs = java.nio.file.Files.list(dir).iterator()
    var pass = 0
    var fail = 0
    val it = new scala.collection.Iterator[java.nio.file.Path] {
      def hasNext = brs.hasNext
      def next() = brs.next()
    }
    it.filter(_.toString.endsWith(".br")).toSeq.sortBy(_.toString).foreach { p =>
      val br = java.nio.file.Files.readAllBytes(p)
      val raw = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        p.toString.stripSuffix(".br") + ".raw"))
      graft.operators.Brotli.decode(br, maxOut = 1 << 27) match {
        case Right(d) if java.util.Arrays.equals(d.content, raw) => pass += 1
        case Right(d) =>
          fail += 1
          println(s"DIFF ${p.getFileName}: got ${d.content.length} want ${raw.length}")
        case Left(r) =>
          fail += 1
          println(s"REJ  ${p.getFileName}: ${r.reason}")
      }
    }
    println(s"$pass/${pass + fail} random libbrotli streams decode byte-exactly")
    if (fail > 0) sys.exit(1)
  }
}
