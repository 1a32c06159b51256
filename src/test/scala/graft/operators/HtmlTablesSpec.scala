package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row

class HtmlTablesSpec extends SparkSuite {

  import spark.implicits._

  private def one(html: String): Row =
    HtmlTables.census(Seq((1L, html)).toDF("doc_id", "html"))
      .collect().head

  test("two tables with headers, inline markup stripped from cell text") {
    val html =
      """<p>intro</p>
        |<table class="x">
        |  <tr><th>Name</th><th>Age</th></tr>
        |  <tr><td><b>Ann</b></td><td>34</td></tr>
        |  <tr><td>Bob</td><td>35</td></tr>
        |</table>
        |<table><tr><td>solo</td></tr></table>
        |<p>outro</p>""".stripMargin
    val r = one(html)
    assert(r.getInt(1) == 2) // n_tables
    assert(r.getLong(2) == 4) // n_rows
    assert(r.getLong(3) == 7) // n_cells
    assert(r.getLong(4) == 2) // n_header_cells
    assert(r.getInt(5) == 2) // max_row_cells
    // Name+Age+Ann+34+Bob+35+solo = 4+3+3+2+3+2+4 (the <b> wrapper gone)
    assert(r.getLong(6) == 21)
  }

  test("no tables reports zeros, not an empty frame") {
    val r = one("<p>just prose, no tables at all</p>")
    assert(r.getInt(1) == 0 && r.getLong(2) == 0 && r.getLong(3) == 0)
    assert(r.getLong(4) == 0 && r.getInt(5) == 0 && r.getLong(6) == 0)
  }

  test("a table with zero rows still counts as a table") {
    val r = one("<table class=\"empty\"></table>")
    assert(r.getInt(1) == 1 && r.getLong(2) == 0 && r.getLong(3) == 0)
  }

  test("case-insensitive tags and multiline cells") {
    val r = one("<TABLE><TR><TD>line1\nline2</TD></TR></TABLE>")
    assert(r.getInt(1) == 1 && r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(r.getLong(6) == "line1\nline2".length)
  }
}
