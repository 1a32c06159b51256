package graft.tools

/** Batch half of the bzip2 differential sweep
  * (tools/fuzz_bzip2_diff.py): decode every libbz2-written `NN.bz2`
  * under the given directory with graft.operators.Bzip2 and compare
  * byte-exactly against the `NN.raw` sidecar. Exit 1 on any
  * mismatch. */
object Bzip2Diff {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    val cases = dir.listFiles().filter(_.getName.endsWith(".bz2")).sortBy(_.getName)
    var pass = 0
    var fail = 0
    cases.foreach { f =>
      val blob = java.nio.file.Files.readAllBytes(f.toPath)
      val want = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f.getName.stripSuffix(".bz2") + ".raw").toPath)
      graft.operators.Bzip2.decode(blob, maxOut = 1 << 27) match {
        case Right(got) if got.sameElements(want) => pass += 1
        case Right(_) => println(s"FAIL ${f.getName}: bytes differ"); fail += 1
        case Left(r) =>
          println(s"FAIL ${f.getName}: rejected ${r.reason}"); fail += 1
      }
    }
    println(s"$pass/${pass + fail} libbz2-written streams byte-exact under graft")
    if (fail > 0) sys.exit(1)
  }
}
