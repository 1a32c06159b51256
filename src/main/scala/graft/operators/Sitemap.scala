package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap XML walk (sitemaps.org protocol) — the other half of the
  * crawl-discovery seam next to [[Robots]]: a `<urlset>` lists pages
  * with optional freshness hints, a `<sitemapindex>` lists child
  * sitemaps; a frontier builder unions the extracted URLs with the
  * link graph and prioritizes by `lastmod`/`priority`.
  *
  * Extraction is regex-relational (`regexp_extract_all` per `<url>` /
  * `<sitemap>` block, then per-field extracts) — the same
  * tolerant-subset treatment as the HTML link extraction in
  * `TextAnalysis.extractLinks`, replayable verbatim in any engine with
  * POSIX regexes, which is how the oracle checks it. Entity-decoding
  * covers the five XML built-ins (`&amp; &lt; &gt; &quot; &apos;`) —
  * the ones the protocol requires escaped in a `<loc>`.
  */
object Sitemap {

  private val UrlBlock = "(?s)<url>(.*?)</url>"
  private val IndexBlock = "(?s)<sitemap>(.*?)</sitemap>"

  /** Decode the five XML built-in entities. `&amp;` last, so escaped
    * escapes decode once, not recursively. */
  def decodeEntities(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&apos;", "'"),
      "&amp;", "&")

  private def field(entry: Column, tag: String): Column = {
    val v = trim(regexp_extract(entry, s"<$tag>\\s*([^<]*?)\\s*</$tag>", 1))
    when(v === "", lit(null).cast("string")).otherwise(v)
  }

  /** (host, content) -> one row per page entry:
    * (host, loc, lastmod, changefreq, priority, entry_pos). Rows whose
    * `<loc>` is missing are dropped — an entry without a URL is noise,
    * not a fetch candidate. */
  def entries(sitemaps: DataFrame): DataFrame =
    sitemaps
      .select(col("host"),
        posexplode(regexp_extract_all(col("content"), lit(UrlBlock), lit(1)))
          .as(Seq("entry_pos", "entry")))
      .select(col("host"),
        decodeEntities(field(col("entry"), "loc")).as("loc"),
        field(col("entry"), "lastmod").as("lastmod"),
        field(col("entry"), "changefreq").as("changefreq"),
        field(col("entry"), "priority").cast("double").as("priority"),
        col("entry_pos"))
      .filter(col("loc").isNotNull)

  /** (host, content) -> child sitemaps of a `<sitemapindex>`:
    * (host, child_loc, lastmod, entry_pos). */
  def children(sitemaps: DataFrame): DataFrame =
    sitemaps
      .select(col("host"),
        posexplode(regexp_extract_all(col("content"), lit(IndexBlock), lit(1)))
          .as(Seq("entry_pos", "entry")))
      .select(col("host"),
        decodeEntities(field(col("entry"), "loc")).as("child_loc"),
        field(col("entry"), "lastmod").as("lastmod"),
        col("entry_pos"))
      .filter(col("child_loc").isNotNull)
}
