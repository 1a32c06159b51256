package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SitemapSpec extends SparkSuite {
  import spark.implicits._

  test("urlset extraction: trim, entity decode, optional fields, hostile tails") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc> https://a.example/x?q=1&amp;r=2 </loc>
        |    <lastmod>2024-05-01</lastmod>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><loc>https://a.example/y</loc><changefreq>weekly</changefreq></url>
        |  <url><lastmod>2024-01-01</lastmod></url>
        |  <url><loc>https://a.example/trunc
        |</urlset>""".stripMargin
    val got = Sitemap.entries(Seq((1L, xml)).toDF("host", "content"))
      .orderBy("entry_pos").collect()
    assert(got.length == 2) // loc-less dropped, unclosed unmatched
    assert(got(0).getString(1) == "https://a.example/x?q=1&r=2")
    assert(got(0).getString(2) == "2024-05-01")
    assert(got(0).getDouble(4) == 0.8)
    assert(got(1).getString(1) == "https://a.example/y")
    assert(got(1).isNullAt(2) && got(1).getString(3) == "weekly" && got(1).isNullAt(4))
  }

  test("sitemapindex children") {
    val xml = "<sitemapindex><sitemap><loc>https://a/s1.xml</loc>" +
      "<lastmod>2024-02-02</lastmod></sitemap>" +
      "<sitemap><loc>https://a/s2.xml</loc></sitemap></sitemapindex>"
    val got = Sitemap.children(Seq((1L, xml)).toDF("host", "content"))
      .orderBy("entry_pos").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("https://a/s1.xml", "https://a/s2.xml"))
    assert(got(0).getString(2) == "2024-02-02" && got(1).isNullAt(2))
  }

  test("double-escaped entities decode one level only") {
    val got = Seq(("&amp;lt;tag&amp;gt; &quot;q&quot; &apos;a&apos;"))
      .toDF("s").select(Sitemap.decodeEntities(col("s"))).first().getString(0)
    assert(got == "&lt;tag&gt; \"q\" 'a'")
  }
}
