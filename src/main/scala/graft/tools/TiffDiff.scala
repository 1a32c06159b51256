package graft.tools

/** Batch half of the TIFF differential sweep
  * (tools/fuzz_tiff_diff.py): decode every libtiff-written `NN.tif`
  * under the given directory with graft.operators.Tiff and compare
  * byte-exactly against the `NN.gray` sidecar libtiff itself read
  * back. Prints one line per failure and a PASS/FAIL summary; exit 1
  * on any mismatch. */
object TiffDiff {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    val cases = dir.listFiles().filter(_.getName.endsWith(".tif")).sortBy(_.getName)
    var pass = 0
    var fail = 0
    cases.foreach { f =>
      val blob = java.nio.file.Files.readAllBytes(f.toPath)
      val want = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, f.getName.stripSuffix(".tif") + ".gray").toPath)
      graft.operators.Tiff.decodeGray(blob) match {
        case Some((w, h, px)) if px.sameElements(want) && w * h == want.length =>
          pass += 1
        case Some(_) =>
          println(s"FAIL ${f.getName}: pixels differ"); fail += 1
        case None =>
          println(s"FAIL ${f.getName}: rejected"); fail += 1
      }
    }
    println(s"$pass/${pass + fail} libtiff-written TIFFs byte-exact under graft")
    if (fail > 0) sys.exit(1)
  }
}
