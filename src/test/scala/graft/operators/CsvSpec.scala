package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class CsvSpec extends AnyFunSuite {

  test("plain grid: arity, rows, cells") {
    val i = Csv.info("a,b,c\n1,2,3\n4,5,6\n").get
    assert(i.nCols == 3 && i.nRows == 2 && i.nRagged == 0)
    assert(i.dataCells == 6 && i.nQuoted == 0 && i.nEmpty == 0)
  }

  test("quoted fields: embedded delimiter, newline, doubled quote") {
    val i = Csv.info(
      "h1,h2\n\"x,y\",p\n\"line1\nline2\",q\n\"a\"\"b\",r\n").get
    assert(i.nRows == 3 && i.nQuoted == 3 && i.nRagged == 0)
    assert(i.dataCells == 6)
  }

  test("empty cells counted, quoted-empty is quoted not empty") {
    val i = Csv.info("h1,h2,h3\n,x,\n\"\",y,z\n").get
    assert(i.nEmpty == 2) // row1 cols 1 and 3
    assert(i.nQuoted == 1) // the "" cell
  }

  test("ragged rows are counted, not rejected") {
    val i = Csv.info("h1,h2,h3\na,b\nc,d,e,f\ng,h,i\n").get
    assert(i.nRows == 3 && i.nRagged == 2)
    assert(i.dataCells == 2 + 4 + 3)
  }

  test("CRLF records and missing trailing newline both parse") {
    val i = Csv.info("h1,h2\r\na,b\r\nc,d").get
    assert(i.nRows == 2 && i.nRagged == 0 && i.dataCells == 4)
  }

  test("lexical corruption quarantines") {
    assert(Csv.info(null).isEmpty)
    assert(Csv.info("").isEmpty)
    // unterminated quote (the \n is INSIDE the still-open field)
    assert(Csv.info("h1,h2\n\"open,b\n").isEmpty)
    assert(Csv.info("h1,h2\na,\"unterminated").isEmpty)
    // bare quote mid-field
    assert(Csv.info("h1,h2\nab\"c,d\n").isEmpty)
    // junk after closing quote
    assert(Csv.info("h1,h2\n\"a\"x,b\n").isEmpty)
    // stray CR not followed by LF
    assert(Csv.info("h1,h2\na\rb,c\n").isEmpty)
  }
}
