package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RSS 2.0 / Atom 1.0 feed walk — the syndication half of the
  * crawl-discovery seam ([[Robots]] gates fetching, [[Sitemap]] lists
  * pages, feeds announce NEW pages): a crawler that polls feeds learns
  * about fresh documents long before a full site re-crawl, and a
  * training-data pipeline dedups the same article arriving via feed,
  * sitemap, and link graph by the item's guid/id.
  *
  * Expressed over [[XmlPaths]]: each dialect is a table of paths —
  * `<item>`/`<entry>` blocks, attribute-tolerant CDATA-aware text
  * fields, and Atom's href ATTRIBUTE — replayable verbatim in any
  * engine with POSIX regexes, which is how the oracle checks it. Two
  * dialects, one output shape:
  *
  *  - RSS 2.0: `<item>` blocks; `<title>`, `<link>` (element text),
  *    `<guid>`, `<pubDate>`. Every element is optional per spec.
  *  - Atom 1.0: `<entry>` blocks; `<title>`, `<id>`, `<updated>`, and
  *    the link carried as an attribute (`<link href="..."/>`).
  *
  * Titles may be `<![CDATA[...]]>`-wrapped (common for RSS titles with
  * markup-significant characters) — CDATA content is taken RAW, plain
  * content is entity-decoded, per the XML data model. Items with
  * neither a link nor a guid/id are dropped, not guessed at: with no
  * URL and no identity an item can neither be fetched nor deduped.
  * Per-row regex work over the feed column — no shuffle, linear
  * scaling; the frontier join downstream is the only exchange.
  */
object Feeds {

  private def field(entry: Column, tag: String): Column =
    XmlPaths.text(entry,
      XmlPaths.Field(tag, attrs = true, cdata = true, entities = true))

  /** (host, content) -> one row per feed item:
    * (host, kind, entry_pos, title, link, guid, published).
    * `kind` is 'rss' or 'atom' from the document element; contents that
    * are neither produce no rows. `published` carries the dialect's
    * native timestamp string (`pubDate` / `updated`) unparsed — RFC 822
    * vs RFC 3339 normalization is a consumer decision. */
  def items(feeds: DataFrame): DataFrame = {
    val kind = when(col("content").contains("<rss"), "rss")
      .when(col("content").contains("<feed"), "atom")
    val withKind = feeds.select(col("host"), col("content"), kind.as("kind"))
      .filter(col("kind").isNotNull)
    val block = when(col("kind") === "rss",
      lit(XmlPaths.blockPattern("item"))).otherwise(lit(XmlPaths.blockPattern("entry")))
    withKind
      .select(col("host"), col("kind"),
        posexplode(regexp_extract_all(col("content"), block, lit(1)))
          .as(Seq("entry_pos", "entry")))
      .select(col("host"), col("kind"), col("entry_pos"),
        field(col("entry"), "title").as("title"),
        when(col("kind") === "rss", field(col("entry"), "link"))
          .otherwise(XmlPaths.attr(col("entry"), "link", "href")).as("link"),
        when(col("kind") === "rss", field(col("entry"), "guid"))
          .otherwise(field(col("entry"), "id")).as("guid"),
        when(col("kind") === "rss", field(col("entry"), "pubDate"))
          .otherwise(field(col("entry"), "updated")).as("published"))
      .filter(col("link").isNotNull || col("guid").isNotNull)
  }
}
