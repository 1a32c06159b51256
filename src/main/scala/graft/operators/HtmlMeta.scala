package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Page-metadata extraction — the per-page header fields a crawl
  * pipeline consumes before (and besides) body text: `<title>`, the
  * meta description, OpenGraph title, `<link rel=canonical>` (the
  * dedup key the SITE declares, complementing
  * [[TextAnalysis.canonicalizeUrl]]'s syntactic one), and the hreflang
  * alternate census (multilingual mirror detection — the same document
  * arriving per language is exactly what per-language dedup wants to
  * know about).
  *
  * Same regex-relational discipline as the link/table extraction: every
  * field is a codegen'd `regexp_extract` replayable verbatim by the
  * oracle; attribute order is tolerated by coalescing the two
  * orderings (name-then-content and content-then-name — both live on
  * the real web). Per-row work, no shuffle.
  */
object HtmlMeta {

  private def nullIfEmpty(c: Column): Column =
    when(c === "", lit(null).cast("string")).otherwise(c)

  /** First `<title>` inner text, entity-decoded, trimmed. */
  def title(html: Column): Column =
    nullIfEmpty(XmlPaths.decodeEntities(trim(regexp_extract(html,
      "(?s)<title(?:\\s[^>]*)?>\\s*([^<]*?)\\s*</title>", 1))))

  /** `content` of `<meta name=...>` (or `property=...`), both attribute
    * orders. */
  def metaContent(html: Column, key: String): Column = {
    val nameFirst = regexp_extract(html,
      s"""<meta\\s[^>]*(?:name|property)="$key"[^>]*content="([^"]*)"""", 1)
    val contentFirst = regexp_extract(html,
      s"""<meta\\s[^>]*content="([^"]*)"[^>]*(?:name|property)="$key"""", 1)
    nullIfEmpty(XmlPaths.decodeEntities(
      when(nameFirst =!= "", nameFirst).otherwise(contentFirst)))
  }

  /** `href` of `<link rel="canonical">`. */
  def canonicalUrl(html: Column): Column =
    nullIfEmpty(XmlPaths.decodeEntities(regexp_extract(html,
      """<link\s[^>]*rel="canonical"[^>]*href="([^"]*)"""", 1)))

  /** Number of `<link rel="alternate" hreflang=...>` declarations. */
  def hreflangCount(html: Column): Column =
    size(regexp_extract_all(html,
      lit("""<link\s[^>]*rel="alternate"[^>]*hreflang="([^"]*)""""), lit(1)))

  /** One row per page: (id, title, meta_description, og_title,
    * canonical_url, n_hreflang). */
  def extract(docs: DataFrame, idCol: Column, htmlCol: Column): DataFrame =
    docs.select(idCol.as("doc_id"),
      title(htmlCol).as("title"),
      metaContent(htmlCol, "description").as("meta_description"),
      metaContent(htmlCol, "og:title").as("og_title"),
      canonicalUrl(htmlCol).as("canonical_url"),
      hreflangCount(htmlCol).cast("int").as("n_hreflang"))
}
