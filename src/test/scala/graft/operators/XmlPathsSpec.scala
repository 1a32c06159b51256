package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The shared path-based XML extractor: block splitting, field options
  * (attributes / CDATA / entities), attribute values, and the rules the
  * sitemap/feed walks rely on (null-not-guess on empties and nested
  * markup, non-recursive entity decode). */
class XmlPathsSpec extends SparkSuite {
  import spark.implicits._

  private def one(body: String) = Seq(body).toDF("b")

  private def textOf(body: String, f: XmlPaths.Field): Option[String] =
    Option(one(body).select(XmlPaths.text(col("b"), f)).first().getString(0))

  test("blocks: repeated elements in order, DOTALL bodies") {
    val doc = "<urlset><url>\n<loc>a</loc>\n</url><url><loc>b</loc></url></urlset>"
    val got = one(doc)
      .select(posexplode(XmlPaths.blocks(col("b"), "url")).as(Seq("p", "e")))
      .select("p", "e").as[(Int, String)].collect().toSeq
    assert(got.map(_._1) == Seq(0, 1))
    assert(got(0)._2.contains("<loc>a</loc>"))
    assert(got(1)._2 == "<loc>b</loc>")
  }

  test("plain field: trimmed, empty -> NULL, nested markup -> NULL") {
    assert(textOf("<loc>  x  </loc>", XmlPaths.Field("loc")) == Some("x"))
    assert(textOf("<loc></loc>", XmlPaths.Field("loc")).isEmpty)
    assert(textOf("<loc><b>x</b></loc>", XmlPaths.Field("loc")).isEmpty)
    // attributes on the open tag only match when tolerated
    assert(textOf("""<guid isPermaLink="false">g1</guid>""",
      XmlPaths.Field("guid")).isEmpty)
    assert(textOf("""<guid isPermaLink="false">g1</guid>""",
      XmlPaths.Field("guid", attrs = true)) == Some("g1"))
  }

  test("CDATA unwraps raw; plain content entity-decodes; decode is single-pass") {
    val f = XmlPaths.Field("title", attrs = true, cdata = true, entities = true)
    assert(textOf("<title><![CDATA[a <b> &amp; c]]></title>", f) ==
      Some("a <b> &amp; c"), "CDATA content is raw — no entity decode")
    assert(textOf("<title>a &amp; b &lt;ok&gt;</title>", f) == Some("a & b <ok>"))
    assert(textOf("<title>&amp;amp;</title>", f) == Some("&amp;"),
      "escaped escapes decode once, not recursively")
  }

  test("attribute extraction with entity decode") {
    val b = """<entry><link rel="alt" href="http://x/?a=1&amp;b=2"/></entry>"""
    val got = one(b).select(XmlPaths.attr(col("b"), "link", "href")).first().getString(0)
    assert(got == "http://x/?a=1&b=2")
    assert(one("<entry><link/></entry>")
      .select(XmlPaths.attr(col("b"), "link", "href")).first().isNullAt(0))
  }
}
