package graft.tools

/** Batch half of the xz differential sweep (tools/fuzz_xz_diff.py):
  * decode every liblzma-written `NN.xz` under the directory with
  * graft.operators.Xz and compare byte-exactly against the `NN.raw`
  * sidecar. Exit 1 on any mismatch. */
object XzDiff {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    val cases = dir.listFiles().filter(_.getName.endsWith(".xz")).sortBy(_.getName)
    var pass = 0
    var fail = 0
    cases.foreach { f =>
      val blob = java.nio.file.Files.readAllBytes(f.toPath)
      val want = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f.getName.stripSuffix(".xz") + ".raw").toPath)
      graft.operators.Xz.decode(blob, maxOut = 1 << 27) match {
        case Right(got) if got.sameElements(want) => pass += 1
        case Right(_) => println(s"FAIL ${f.getName}: bytes differ"); fail += 1
        case Left(r) =>
          println(s"FAIL ${f.getName}: rejected ${r.reason}"); fail += 1
      }
    }
    println(s"$pass/${pass + fail} liblzma-written streams byte-exact under graft")
    if (fail > 0) sys.exit(1)
  }
}
