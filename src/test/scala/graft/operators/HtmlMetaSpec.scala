package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class HtmlMetaSpec extends SparkSuite {
  import spark.implicits._

  private def one(html: String) = {
    val df = Seq((1L, html)).toDF("doc_id", "html")
    HtmlMeta.extract(df, col("doc_id"), col("html")).collect()(0)
  }

  test("all fields present, both meta attribute orders, entities decode") {
    val r = one("""<html><head><title>A &amp; B</title>
      |<meta content="dC" name="description">
      |<meta property="og:title" content="O&quot;G">
      |<link rel="canonical" href="http://x/?a=1&amp;b=2">
      |<link rel="alternate" hreflang="en" href="http://x/en">
      |<link rel="alternate" hreflang="fr" href="http://x/fr">
      |</head></html>""".stripMargin)
    assert(r.getString(1) == "A & B")
    assert(r.getString(2) == "dC")
    assert(r.getString(3) == "O\"G")
    assert(r.getString(4) == "http://x/?a=1&b=2")
    assert(r.getInt(5) == 2)
  }

  test("missing fields are NULL, not guesses; first title wins") {
    val r = one("<html><head><title>one</title><title>two</title></head></html>")
    assert(r.getString(1) == "one")
    assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    assert(r.getInt(5) == 0)
    val empty = one("<html><head><title>  </title></head></html>")
    assert(empty.isNullAt(1), "blank title is an absent title")
  }

  test("markup inside the title does not leak") {
    // nested markup stops the [^<] content class — reject-don't-guess
    val r = one("<title>a<b>c</b></title>")
    assert(r.isNullAt(1))
  }
}
