package graft.tools

/** Batch half of the Unix-compress differential sweep
  * (tools/fuzz_compress_diff.py): for every `NN.raw` + spec line
  * `NN maxbits`, encode with graft.operators.UnixCompress, write
  * `NN.Z` for the system gzip to verify, and require the graft
  * DECODER to round-trip the same wire byte-exactly. Exit 1 on any
  * mismatch. */
object CompressDiff {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    val spec = java.nio.file.Files.readAllLines(
      new java.io.File(dir, "spec.txt").toPath)
    var pass = 0
    var fail = 0
    spec.forEach { line =>
      val Array(name, maxBitsStr) = line.trim.split(" ")
      val raw = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"$name.raw").toPath)
      val z = graft.operators.UnixCompress.encode(raw, maxBitsStr.toInt)
      java.nio.file.Files.write(new java.io.File(dir, s"$name.Z").toPath, z)
      graft.operators.UnixCompress.decode(z, maxOut = 1 << 27) match {
        case Right(got) if got.sameElements(raw) => pass += 1
        case Right(got) =>
          println(s"FAIL $name: decode bytes differ " +
            s"(${got.length}/${raw.length})")
          fail += 1
        case Left(r) =>
          println(s"FAIL $name: decode rejected ${r.reason}")
          fail += 1
      }
    }
    println(s"$pass/${pass + fail} graft .Z round-trips byte-exact")
    if (fail > 0) sys.exit(1)
  }
}
