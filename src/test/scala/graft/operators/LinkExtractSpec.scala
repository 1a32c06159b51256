package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class LinkExtractSpec extends SparkSuite {
  import spark.implicits._

  private def links(html: String): Seq[String] =
    Seq(html).toDF("h")
      .select(TextAnalysis.extractLinks(col("h")).as("l"))
      .as[Seq[String]].head()

  test("href values extract; href-less anchors and non-anchor tags don't") {
    assert(links("""<a href="http://x.com/a">t</a>""") == Seq("http://x.com/a"))
    assert(links("""<A HREF="https://Y.org">t</A>""") == Seq("https://Y.org"))
    assert(links("""<a name="top">anchor</a>""") == Seq.empty)
    assert(links("""<img href="http://not-an-anchor.com">""") == Seq.empty)
    assert(links(
      """<a id="l" href="http://a.com">1</a><p>x</p><a href="http://b.com">2</a>""")
      == Seq("http://a.com", "http://b.com"))
  }

  test("anchored tag/attribute: <area>/<abbr>/<audio> and data-href don't fire") {
    assert(links("""<area href="http://map.com/x" shape="rect">""") == Seq.empty)
    assert(links("""<abbr href="http://nope.com">t</abbr>""") == Seq.empty)
    assert(links("""<audio href="http://nope.com"></audio>""") == Seq.empty)
    assert(links("""<a data-href="http://nope.com">t</a>""") == Seq.empty)
    assert(links("""<a id="z" data-href="http://nope.com" href="http://yes.com">t</a>""")
      == Seq("http://yes.com"))
  }

  test("urlHost lowercases and stops at path/query/fragment; non-URLs are empty") {
    val rows = Seq("HTTP://Site-3.Example.COM/p/9", "https://h.io?x=1",
      "http://h.io#frag", "ftp://h.io/x", "relative/path", "")
      .toDF("u").select(TextAnalysis.urlHost(col("u"))).as[String].collect()
    assert(rows.toSeq == Seq("site-3.example.com", "h.io", "h.io", "", "", ""))
  }
}
