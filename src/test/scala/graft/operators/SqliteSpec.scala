package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** SQLite census against databases written by the REAL engine (the
  * on-system CPython sqlite3): schema objects, row counts through
  * multi-level b-trees, overflow chains for long rows AND a long
  * CREATE statement in sqlite_master, all three text encodings,
  * plus the Scala fixture writer's files and hostile mutations. */
class SqliteSpec extends AnyFunSuite {

  private def realDb(script: String): Array[Byte] = {
    val f = java.io.File.createTempFile("graft_sqlite", ".db")
    f.delete()
    val py =
      s"""import sqlite3, sys
         |con = sqlite3.connect(sys.argv[1])
         |cur = con.cursor()
         |$script
         |con.commit()
         |con.close()
         |""".stripMargin
    val pr = new ProcessBuilder("python3", "-c", py, f.getAbsolutePath)
      .redirectErrorStream(true).start()
    val log = new String(pr.getInputStream.readAllBytes(), "UTF-8")
    assert(pr.waitFor() == 0, s"python sqlite3 failed: $log")
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    f.delete()
    bytes
  }

  test("real-engine schema and row counts census exactly") {
    val blob = realDb(
      """cur.execute("CREATE TABLE docs (id INTEGER PRIMARY KEY, body TEXT)")
        |cur.execute("CREATE TABLE meta (k TEXT, v REAL)")
        |cur.execute("CREATE INDEX idx_docs ON docs (body)")
        |for i in range(250):
        |    cur.execute("INSERT INTO docs VALUES (?, ?)", (i, f"document body {i} " * 3))
        |cur.executemany("INSERT INTO meta VALUES (?, ?)", [("a", 1.5), ("b", -2.0)])
        |""".stripMargin)
    val info = Sqlite.parse(blob).toOption.get
    assert(info.encoding == "utf-8")
    assert(info.nTables == 2 && info.nIndexes == 1)
    assert(info.schema.map(_.name).toSet ==
      Set("docs", "meta", "idx_docs"))
    val rows = info.tableRows.map(t => t.name -> t.nRows).toMap
    assert(rows("docs") == 250)
    assert(rows("meta") == 2)
  }

  test("multi-level b-trees and overflow chains walk correctly") {
    // page_size 512 forces interior pages quickly; 5 KB rows force
    // overflow chains; a 200-column CREATE overflows sqlite_master
    val manyCols = (0 until 200).map(i => s"col_$i TEXT").mkString(", ")
    val blob = realDb(
      s"""cur.execute("PRAGMA page_size=512")
         |cur.execute("CREATE TABLE big (id INTEGER PRIMARY KEY, body TEXT)")
         |cur.execute("CREATE TABLE wide ($manyCols)")
         |for i in range(3000):
         |    cur.execute("INSERT INTO big VALUES (?, ?)", (i, f"row {i}"))
         |cur.execute("INSERT INTO big VALUES (?, ?)", (99999, "x" * 5000))
         |""".stripMargin)
    val info = Sqlite.parse(blob).toOption.get
    assert(info.pageSize == 512)
    val rows = info.tableRows.map(t => t.name -> t.nRows).toMap
    assert(rows("big") == 3001)
    assert(rows("wide") == 0)
    // the overflowing CREATE came back whole through the chain
    val wide = info.schema.find(_.name == "wide").get
    assert(wide.sql.contains("col_199"))
    assert(info.nPages > 20) // genuinely multi-page
  }

  test("utf-16 encodings decode") {
    for (enc <- Seq("UTF-16le", "UTF-16be")) {
      val blob = realDb(
        s"""cur.execute("PRAGMA encoding='$enc'")
           |cur.execute("CREATE TABLE t (s TEXT)")
           |cur.execute("INSERT INTO t VALUES ('héllo wörld')")
           |""".stripMargin)
      val info = Sqlite.parse(blob).toOption.get
      assert(info.encoding == enc.toLowerCase)
      assert(info.tableRows.head.nRows == 1)
      assert(info.schema.head.sql.contains("CREATE TABLE t"))
    }
  }

  test("the Scala fixture writer parses and counts exactly") {
    val blob = Sqlite.write(Seq(
      "alpha" -> Seq("row one", "row two", "row three"),
      "beta" -> Seq("solo")))
    val info = Sqlite.parse(blob).toOption.get
    assert(info.pageSize == 4096)
    assert(info.nPages == 3)
    assert(info.nTables == 2)
    assert(info.schema.map(_.name) == Seq("alpha", "beta"))
    assert(info.schema.head.sql.startsWith("CREATE TABLE alpha"))
    assert(info.tableRows.map(t => t.name -> t.nRows).toMap ==
      Map("alpha" -> 3L, "beta" -> 1L))
  }

  test("hostile files reject with named reasons") {
    assert(Sqlite.parse("not a database at all".getBytes) ==
      Left("not_sqlite"))
    val good = Sqlite.write(Seq("t" -> Seq("r1", "r2")))
    assert(Sqlite.parse(java.util.Arrays.copyOf(good, 300)) ==
      Left("truncated_sqlite"))
    // bad page size (not a power of two)
    val bad = good.clone(); bad(16) = 0x0F; bad(17) = 0xFF.toByte
    assert(Sqlite.parse(bad) == Left("bad_page_size"))
    // a rootpage pointing past the file
    val oob = good.clone()
    // master row's rootpage byte: find "CREATE TABLE t" payload; the
    // rootpage is a 1-byte int right before the sql text in the record
    val sqlAt = {
      val pat = "CREATE TABLE t".getBytes("UTF-8")
      var i = 0
      var at = -1
      while (at < 0 && i + pat.length <= oob.length) {
        var k = 0
        while (k < pat.length && oob(i + k) == pat(k)) k += 1
        if (k == pat.length) at = i else i += 1
      }
      at
    }
    oob(sqlAt - 1) = 99 // rootpage 99, file has 2 pages
    assert(Sqlite.parse(oob) == Left("page_out_of_range"))
    // btree cycle: make the rootpage point at page 1 (master) -> the
    // master walk visits 1; table walk visiting 1 again is legal (new
    // walk) but its self-reference... instead corrupt the page type
    val badType = good.clone()
    badType(4096) = 7 // table leaf page -> invalid type
    assert(Sqlite.parse(badType) == Left("bad_btree_page_type"))
  }
}
