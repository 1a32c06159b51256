package graft.tools

/** Batch half of tools/verify_sqlite.py: dump Scala-written SQLite
  * fixtures + expected (type, table, rowcount) sidecars for the real
  * engine to open and verify. */
object SqliteFixtures {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File(args(0))
    dir.mkdirs()
    var idx = 0
    for {
      nTables <- Seq(1, 2, 3)
      nRows <- Seq(0, 1, 5, 40)
    } {
      val tables = (0 until nTables).map { t =>
        s"tbl_$t" -> (0 until nRows).map(r =>
          s"fixture row $idx/$t/$r " + ("x" * (10 + 13 * r % 60)))
      }
      val blob = graft.operators.Sqlite.write(tables)
      val name = f"$idx%03d"
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.db").toPath, blob)
      val expect = tables.map { case (t, rows) =>
        s"table\t$t\t${rows.length}"
      }.mkString("\n") + "\n"
      java.nio.file.Files.write(
        new java.io.File(dir, s"$name.db.expect").toPath,
        expect.getBytes("UTF-8"))
      idx += 1
    }
    println(s"$idx fixtures -> $dir")
  }
}
