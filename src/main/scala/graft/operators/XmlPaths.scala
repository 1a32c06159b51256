package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small path-based XML extractor — the shared core under the
  * sitemap/feed walks (and the next XML-shaped format: a TABLE OF PATHS,
  * not a new parser). Deliberately a tolerant REGEX-RELATIONAL subset,
  * not an XML parser: repeated-element block extraction, element text
  * (attribute-tolerant, optional CDATA unwrap, optional entity decode),
  * attribute values, and the five built-in entities. No DTD, no
  * namespaces-as-semantics, no nesting grammar — formats that need a
  * real tree walk (deep, recursive) get a dedicated decoder; the
  * crawl-facing formats this serves (sitemaps.org, RSS 2.0, Atom 1.0)
  * are flat lists of flat records, which is exactly what a
  * `regexp_extract_all`-based subset replays verbatim in any engine
  * with POSIX regexes — how every oracle checks it.
  *
  * Everything stays a codegen'd Column expression: per-row regex work,
  * no UDFs, no shuffle — linear over a 100 TB content column.
  */
object XmlPaths {

  /** One text field to pull out of an element body.
    *  - `attrs`: tolerate attributes on the open tag
    *    (`<guid isPermaLink="false">`);
    *  - `cdata`: unwrap `<![CDATA[...]]>` (content taken RAW, per the
    *    XML data model);
    *  - `entities`: decode the five built-ins on non-CDATA content. */
  final case class Field(element: String,
      attrs: Boolean = false, cdata: Boolean = false, entities: Boolean = false)

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

  private def openTag(element: String, attrs: Boolean): String =
    if (attrs) s"<$element(?:\\s[^>]*)?>" else s"<$element>"

  /** The regex for repeated `<element>...</element>` blocks; group 1 is
    * the body. DOTALL so bodies span lines. */
  def blockPattern(element: String, attrs: Boolean = false): String =
    s"(?s)${openTag(element, attrs)}(.*?)</$element>"

  /** Array of the bodies of every `<element>` block in `content`. */
  def blocks(content: Column, element: String, attrs: Boolean = false): Column =
    regexp_extract_all(content, lit(blockPattern(element, attrs)), lit(1))

  private val Cdata = "(?s)^<!\\[CDATA\\[(.*)\\]\\]>$"

  /** Trimmed inner text of the first `<element>` in `body`, per the
    * field's options; empty/missing → NULL (a blank field is an absent
    * field, never a guess). The non-CDATA branch forbids '<' in content
    * — nested markup inside a simple field is malformed for this subset. */
  def text(body: Column, f: Field): Column = {
    val valuePat =
      if (f.cdata) "(<!\\[CDATA\\[.*?\\]\\]>|[^<]*?)"
      else "([^<]*?)"
    val prefix = if (f.cdata) "(?s)" else ""
    val raw = trim(regexp_extract(body,
      s"$prefix${openTag(f.element, f.attrs)}\\s*$valuePat\\s*</${f.element}>", 1))
    val un =
      if (f.cdata)
        when(raw.rlike(Cdata), regexp_extract(raw, Cdata, 1))
          .otherwise(if (f.entities) decodeEntities(raw) else raw)
      else if (f.entities) decodeEntities(raw)
      else raw
    when(un === "", lit(null).cast("string")).otherwise(un)
  }

  /** First double-quoted `attribute` value on an `<element ...>` tag in
    * `body`, entity-decoded (attribute values are entity-escaped per
    * XML); NULL when absent. */
  def attr(body: Column, element: String, attribute: String): Column = {
    val v = regexp_extract(body,
      s"<$element\\s[^>]*$attribute=\"([^\"]*)\"", 1)
    when(v === "", lit(null).cast("string")).otherwise(decodeEntities(v))
  }
}
