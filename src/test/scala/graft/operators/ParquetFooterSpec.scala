package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Parquet footer census against the REAL writers and readers on this
  * system: the driver-generated testdata files (Spark/parquet-mr
  * written) census through the from-scratch thrift-compact walk, and
  * the numbers are cross-checked against DuckDB's independent
  * parquet_metadata() (shelled through python3). */
class ParquetFooterSpec extends AnyFunSuite {

  private val sample = "/root/testdata/sf0.001"

  private def firstParquetPart(table: String): java.io.File = {
    val dir = new java.io.File(s"$sample/$table.parquet")
    val f =
      if (dir.isDirectory)
        dir.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName).head
      else dir
    f
  }

  private def duckMeta(path: String): (Long, Long, Long) = {
    val py =
      """import duckdb, sys, json
        |con = duckdb.connect()
        |rg = con.execute("SELECT count(DISTINCT row_group_id), sum(CASE WHEN row_group_id=0 THEN 1 ELSE 0 END) FROM parquet_metadata(?)", [sys.argv[1]]).fetchone()
        |nr = con.execute("SELECT sum(num_rows) FROM (SELECT DISTINCT row_group_id, row_group_num_rows AS num_rows FROM parquet_metadata(?))", [sys.argv[1]]).fetchone()
        |print(json.dumps([int(rg[0]), int(rg[1]), int(nr[0])]))
        |""".stripMargin
    val pr = new ProcessBuilder("python3", "-c", py, path)
      .redirectErrorStream(true).start()
    val out = new String(pr.getInputStream.readAllBytes(), "UTF-8")
    assert(pr.waitFor() == 0, s"duckdb failed: $out")
    val nums = out.trim.stripPrefix("[").stripSuffix("]").split(",")
    (nums(0).trim.toLong, nums(1).trim.toLong, nums(2).trim.toLong)
  }

  test("real Spark-written testdata files census to DuckDB's numbers") {
    for (table <- Seq("documents", "lineitem", "region")) {
      val f = firstParquetPart(table)
      val blob = java.nio.file.Files.readAllBytes(f.toPath)
      val info = ParquetFooter.census(blob).toOption.get
      val (nRowGroups, nColsRg0, nRows) = duckMeta(f.getAbsolutePath)
      assert(info.nRowGroups == nRowGroups, s"$table row groups")
      assert(info.nLeafColumns == nColsRg0, s"$table columns")
      assert(info.nRows == nRows, s"$table rows")
      // the testdata is pyarrow-written; other parts may be parquet-mr
      assert(info.createdBy.contains("parquet") ||
        info.createdBy.contains("arrow"), s"$table created_by")
      assert(info.codecs.nonEmpty, table)
      assert(info.schemaFields.nonEmpty, table)
    }
  }

  test("hostile footers reject with named reasons") {
    val blob = java.nio.file.Files.readAllBytes(
      firstParquetPart("region").toPath)
    assert(ParquetFooter.census("PAR0 something else".getBytes) ==
      Left("not_parquet"))
    assert(ParquetFooter.census(java.util.Arrays.copyOf(blob,
      blob.length - 3)) == Left("truncated_parquet"))
    // footer length lying past the file start
    val lie = blob.clone()
    lie(blob.length - 5) = 0x7F
    assert(ParquetFooter.census(lie) == Left("footer_escapes_file"))
    // flip a byte inside the footer: thrift walk must reject or
    // mis-walk into a named bail, never escape
    var named = 0
    for (k <- 1 to 40) {
      val m = blob.clone()
      val at = blob.length - 9 - k * 7
      m(at) = (m(at) ^ 0x5A).toByte
      ParquetFooter.census(m) match {
        case Left(_) => named += 1
        case Right(_) => () // benign flip (e.g. inside a string)
      }
    }
    assert(named > 0) // at least some flips must land in named fates
  }
}
