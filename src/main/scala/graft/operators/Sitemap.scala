package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap XML walk (sitemaps.org protocol) — the other half of the
  * crawl-discovery seam next to [[Robots]]: a `<urlset>` lists pages
  * with optional freshness hints, a `<sitemapindex>` lists child
  * sitemaps; a frontier builder unions the extracted URLs with the
  * link graph and prioritizes by `lastmod`/`priority`.
  *
  * Expressed over [[XmlPaths]] (the shared path-based extractor): a
  * sitemap is a TABLE OF PATHS — repeated `<url>`/`<sitemap>` blocks,
  * four text fields each — not a bespoke parser. Regex-relational, so
  * the oracle replays it verbatim; entity-decoding covers the five XML
  * built-ins on `<loc>` (the ones the protocol requires escaped).
  */
object Sitemap {

  /** Decode the five XML built-in entities (kept here as the historical
    * entry point; the implementation lives in [[XmlPaths]]). */
  def decodeEntities(c: Column): Column = XmlPaths.decodeEntities(c)

  private def field(entry: Column, tag: String): Column =
    XmlPaths.text(entry, XmlPaths.Field(tag))

  /** (host, content) -> one row per page entry:
    * (host, loc, lastmod, changefreq, priority, entry_pos). Rows whose
    * `<loc>` is missing are dropped — an entry without a URL is noise,
    * not a fetch candidate. */
  def entries(sitemaps: DataFrame): DataFrame =
    sitemaps
      .select(col("host"),
        posexplode(XmlPaths.blocks(col("content"), "url"))
          .as(Seq("entry_pos", "entry")))
      .select(col("host"),
        XmlPaths.text(col("entry"),
          XmlPaths.Field("loc", entities = true)).as("loc"),
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
        posexplode(XmlPaths.blocks(col("content"), "sitemap"))
          .as(Seq("entry_pos", "entry")))
      .select(col("host"),
        XmlPaths.text(col("entry"),
          XmlPaths.Field("loc", entities = true)).as("child_loc"),
        field(col("entry"), "lastmod").as("lastmod"),
        col("entry_pos"))
      .filter(col("child_loc").isNotNull)
}
