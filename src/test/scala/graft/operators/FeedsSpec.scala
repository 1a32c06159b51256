package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row

class FeedsSpec extends SparkSuite {

  import spark.implicits._

  private def rows(content: String): Seq[Row] =
    Feeds.items(Seq((1L, content)).toDF("host", "content"))
      .orderBy("entry_pos").collect().toSeq

  test("RSS: fields, CDATA title, entity decode, guid attribute") {
    val body =
      """<rss version="2.0"><channel>
        |  <title>Chan</title>
        |  <link>https://h.example/</link>
        |  <item>
        |    <title><![CDATA[A & B <raw>]]></title>
        |    <link>https://h.example/a</link>
        |    <guid isPermaLink="false">urn:a</guid>
        |    <pubDate>Tue, 02 Apr 2024 12:30:00 GMT</pubDate>
        |  </item>
        |  <item>
        |    <title>C &amp; D</title>
        |    <link>https://h.example/b?x=1&amp;y=2</link>
        |  </item>
        |</channel></rss>""".stripMargin
    val r = rows(body)
    assert(r.map(_.getString(1)).distinct == Seq("rss"))
    assert(r(0).getString(3) == "A & B <raw>") // CDATA content raw
    assert(r(0).getString(5) == "urn:a") // attributed guid
    assert(r(0).getString(6) == "Tue, 02 Apr 2024 12:30:00 GMT")
    assert(r(1).getString(3) == "C & D")
    assert(r(1).getString(4) == "https://h.example/b?x=1&y=2")
    assert(r(1).isNullAt(5) && r(1).isNullAt(6))
  }

  test("Atom: href attribute link, id as guid, updated as published") {
    val body =
      """<feed xmlns="http://www.w3.org/2005/Atom">
        |  <title>F</title>
        |  <entry>
        |    <title>E0</title>
        |    <id>urn:e0</id>
        |    <link rel="alternate" href="https://h.example/e0"/>
        |    <updated>2024-04-01T10:00:00Z</updated>
        |  </entry>
        |  <entry>
        |    <title>E1</title>
        |    <id>urn:e1</id>
        |    <updated>2024-04-02T10:00:00Z</updated>
        |  </entry>
        |</feed>""".stripMargin
    val r = rows(body)
    assert(r.map(_.getString(1)).distinct == Seq("atom"))
    assert(r(0).getString(4) == "https://h.example/e0")
    assert(r(1).isNullAt(4)) // no link element at all
    assert(r.map(_.getString(5)) == Seq("urn:e0", "urn:e1"))
    assert(r(1).getString(6) == "2024-04-02T10:00:00Z")
  }

  test("drop rule: no link and no guid means not fetchable, not dedupable") {
    val body =
      """<rss version="2.0"><channel>
        |  <item><pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
        |  <item><title>only title</title></item>
        |  <item><guid>urn:kept</guid></item>
        |</channel></rss>""".stripMargin
    val r = rows(body)
    assert(r.size == 1 && r(0).getString(5) == "urn:kept")
    assert(r(0).getInt(2) == 2) // position counts the dropped blocks
  }

  test("hostile shapes: unclosed item, nested markup in field, non-feed") {
    // unclosed trailing item produces no block
    assert(rows(
      """<rss version="2.0"><channel>
        |  <item><guid>urn:a</guid></item>
        |  <item><title>trunc""".stripMargin).size == 1)
    // nested markup inside a simple field is malformed -> null, and the
    // item survives only through its other identity fields
    val r = rows(
      """<rss version="2.0"><channel>
        |  <item><title>x <b>y</b></title><guid>urn:b</guid></item>
        |</channel></rss>""".stripMargin)
    assert(r.size == 1 && r(0).isNullAt(3) && r(0).getString(5) == "urn:b")
    // neither <rss nor <feed -> zero rows, not a guess
    assert(rows("<html><body><item><guid>g</guid></item></body></html>").isEmpty)
  }
}
