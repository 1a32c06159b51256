package graft.operators

/** Generic XML structure walk — the event-driven tree parser the
  * regex-relational [[XmlPaths]] subset deliberately is not. XmlPaths
  * serves flat crawl formats (sitemaps, RSS, Atom) as codegen'd Column
  * regexes; THIS walk serves the deep, recursive formats — office
  * documents (DOCX rides it, see [[Docx]]), EPUB, half of web APIs —
  * where nesting is the semantics and a regex subset would mis-parse.
  *
  * Strict well-formedness subset of XML 1.0, reject-don't-guess (the
  * JsonWalk contract): one root element, balanced and properly nested
  * tags, quoted attribute values with no duplicate names per element,
  * the five built-in entities plus numeric character references
  * (decimal and hex, valid non-surrogate code points only), comments
  * (`--` forbidden inside, per spec), CDATA sections, processing
  * instructions, an optional XML declaration. No DTD — `<!DOCTYPE`
  * quarantines by NAME (`dtd_unsupported`): internal subsets can
  * declare entities whose expansion is the classic billion-laughs
  * bomb, and a curation pipeline routes those shards to a hardened
  * pass rather than guessing. Nesting beyond depth 64 rejects
  * (`depth_cap`), mirroring JsonWalk.
  *
  * Parsing is a single forward scan over the decoded string —
  * per-row `mapPartitions` work downstream, no shuffle, linear over a
  * 100 TB content column. Events stream to a [[XmlWalk.Handler]] so
  * the census and format-specific extractors (DOCX) share one parser
  * instead of each growing its own.
  */
object XmlWalk {

  private val MaxDepth = 64

  /** Structure census — the schema-inference triage numbers (q218 for
    * CSV, q224 for JSON, this for XML). Text chars are counted DECODED
    * (an `&amp;` or `&#x2013;` is one char) and include CDATA content
    * and inter-element whitespace — the XML data model's character
    * data, not encoding overhead. */
  final case class Info(
      rootTag: String,
      maxDepth: Int,
      nElements: Long,
      nAttrs: Long,
      nTextChars: Long,
      nCdata: Long,
      nComments: Long,
      nPis: Long)

  /** Receiver for the walk's events. `depth` is 1 for the root. */
  trait Handler {
    def startElement(name: String, attrs: Seq[(String, String)], depth: Int): Unit = ()
    def endElement(name: String, depth: Int): Unit = ()
    /** Decoded character data; one call per contiguous run / CDATA
      * section. Only fires INSIDE the root element. */
    def text(decoded: String, cdata: Boolean): Unit = ()
    def comment(): Unit = ()
    def processingInstruction(): Unit = ()
  }

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  private def isNameStart(c: Char): Boolean =
    c == '_' || c == ':' || Character.isLetter(c)
  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || c == '-' || c == '.' || (c >= '0' && c <= '9')

  /** Walk `s`, streaming events to `h`. Left(reason) on any
    * well-formedness violation — no events are "taken back", so a
    * handler must treat a Left as poisoning whatever it accumulated. */
  def walk(s: String, h: Handler): Either[String, Unit] =
    try { new Scanner(s, h).document(); Right(()) }
    catch { case b: Bail => Left(b.reason) }

  /** Census a blob: structure counters or a named rejection. */
  def census(s: String): Either[String, Info] = {
    val c = new CensusHandler
    walk(s, c).map { _ =>
      Info(c.rootTag, c.maxDepth, c.nElements, c.nAttrs, c.nTextChars,
        c.nCdata, c.nComments, c.nPis)
    }
  }

  private final class CensusHandler extends Handler {
    var rootTag = ""
    var maxDepth = 0
    var nElements = 0L
    var nAttrs = 0L
    var nTextChars = 0L
    var nCdata = 0L
    var nComments = 0L
    var nPis = 0L
    override def startElement(name: String, attrs: Seq[(String, String)],
        depth: Int): Unit = {
      if (depth == 1) rootTag = name
      if (depth > maxDepth) maxDepth = depth
      nElements += 1
      nAttrs += attrs.length
    }
    override def text(decoded: String, cdata: Boolean): Unit = {
      nTextChars += decoded.codePointCount(0, decoded.length)
      if (cdata) nCdata += 1
    }
    override def comment(): Unit = nComments += 1
    override def processingInstruction(): Unit = nPis += 1
  }

  private final class Scanner(s: String, h: Handler) {
    private var i = 0

    private def eof: Boolean = i >= s.length
    private def cur: Char = { if (eof) bail("truncated_xml"); s.charAt(i) }
    private def ws(): Unit =
      while (!eof && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    private def expect(lit: String, reason: String): Unit = {
      if (!s.startsWith(lit, i)) bail(reason)
      i += lit.length
    }

    private def name(): String = {
      if (eof || !isNameStart(cur)) bail("bad_name")
      val start = i
      i += 1
      while (!eof && isNameChar(s.charAt(i))) i += 1
      s.substring(start, i)
    }

    /** One entity or character reference starting at '&'; appends the
      * decoded char(s). */
    private def reference(out: java.lang.StringBuilder): Unit = {
      i += 1 // '&'
      if (eof) bail("bad_entity")
      if (cur == '#') {
        i += 1
        var cp = 0
        var any = false
        if (!eof && (cur == 'x' || cur == 'X')) {
          i += 1
          while (!eof && cur != ';') {
            val c = cur
            val d =
              if (c >= '0' && c <= '9') c - '0'
              else if (c >= 'a' && c <= 'f') c - 'a' + 10
              else if (c >= 'A' && c <= 'F') c - 'A' + 10
              else bail("bad_entity")
            cp = cp * 16 + d
            if (cp > 0x10FFFF) bail("bad_entity")
            any = true; i += 1
          }
        } else {
          while (!eof && cur != ';') {
            val c = cur
            if (c < '0' || c > '9') bail("bad_entity")
            cp = cp * 10 + (c - '0')
            if (cp > 0x10FFFF) bail("bad_entity")
            any = true; i += 1
          }
        }
        if (eof || !any) bail("bad_entity")
        i += 1 // ';'
        // XML 1.0 Char production: forbid NUL/control (except \t\n\r)
        // and the surrogate block — a surrogate CODE POINT is not a
        // character, it's half of a broken pair
        if (cp == 0 || (cp < 0x20 && cp != 0x9 && cp != 0xA && cp != 0xD) ||
          (cp >= 0xD800 && cp <= 0xDFFF)) bail("bad_entity")
        out.appendCodePoint(cp)
      } else {
        val start = i
        while (!eof && cur != ';') {
          if (!isNameChar(cur)) bail("bad_entity")
          i += 1
        }
        if (eof) bail("bad_entity")
        val ent = s.substring(start, i)
        i += 1 // ';'
        ent match {
          case "lt" => out.append('<')
          case "gt" => out.append('>')
          case "amp" => out.append('&')
          case "apos" => out.append('\'')
          case "quot" => out.append('"')
          // any other named entity needs a DTD to define it — same
          // named rejection class as the DOCTYPE gate
          case _ => bail("bad_entity")
        }
      }
    }

    private def attrValue(): String = {
      if (eof || (cur != '"' && cur != '\'')) bail("bad_attribute")
      val quote = cur
      i += 1
      val out = new java.lang.StringBuilder
      while (!eof && cur != quote) {
        val c = cur
        if (c == '<') bail("bad_attribute") // raw '<' forbidden in values
        else if (c == '&') reference(out)
        else { out.append(c); i += 1 }
      }
      if (eof) bail("truncated_xml")
      i += 1 // closing quote
      out.toString
    }

    /** `<!--` already consumed up to `<!`. */
    private def commentBody(): Unit = {
      expect("--", "bad_markup")
      val end = s.indexOf("--", i)
      if (end < 0) bail("truncated_xml")
      if (!s.startsWith("-->", end)) bail("bad_comment") // '--' inside
      i = end + 3
      h.comment()
    }

    private def piBody(): Unit = {
      i += 1 // '?'
      name() // PI target (rejects empty)
      val end = s.indexOf("?>", i)
      if (end < 0) bail("truncated_xml")
      i = end + 2
      h.processingInstruction()
    }

    private def cdataBody(): Unit = {
      expect("[CDATA[", "bad_markup")
      val end = s.indexOf("]]>", i)
      if (end < 0) bail("truncated_xml")
      h.text(s.substring(i, end), cdata = true)
      i = end + 3
    }

    /** Misc content allowed outside the root: comments, PIs,
      * whitespace. Anything else bails with `reason`. */
    private def misc(reason: String): Unit = {
      var progress = true
      while (progress && !eof) {
        ws()
        if (!eof) {
          if (s.startsWith("<!--", i)) { i += 2; commentBody() }
          else if (s.startsWith("<?", i)) { i += 1; piBody() }
          else if (cur == '<') progress = false
          else bail(reason)
        }
      }
    }

    def document(): Unit = {
      // optional BOM + XML declaration (a PI-shaped prolog)
      if (!eof && cur == '\uFEFF') i += 1 // decoded BOM, if the transcoder left it
      // the declaration is exactly '<?xml' followed by whitespace or
      // '?' — a PI whose target merely STARTS with 'xml' (e.g.
      // <?xml-stylesheet ...?>) is an ordinary PI per the XML 1.0
      // grammar and must fall through to piBody() to be counted
      if (s.startsWith("<?xml", i) && i + 5 < s.length &&
          (s.charAt(i + 5) == '?' || Character.isWhitespace(s.charAt(i + 5)))) {
        val end = s.indexOf("?>", i)
        if (end < 0) bail("truncated_xml")
        i = end + 2
      }
      misc("text_outside_root")
      if (eof) bail("no_root_element")
      if (s.startsWith("<!DOCTYPE", i)) bail("dtd_unsupported")
      if (cur != '<') bail("text_outside_root")
      element(1)
      misc("text_outside_root")
      ws()
      if (!eof) {
        if (cur == '<') bail("multiple_roots") else bail("text_outside_root")
      }
    }

    /** One element, cursor ON its '<'. */
    private def element(depth: Int): Unit = {
      if (depth > MaxDepth) bail("depth_cap")
      i += 1 // '<'
      val tag = name()
      val attrs = Seq.newBuilder[(String, String)]
      val seen = scala.collection.mutable.HashSet.empty[String]
      var open = true
      var selfClosed = false
      while (open) {
        val before = i
        ws()
        if (eof) bail("truncated_xml")
        cur match {
          case '>' => i += 1; open = false
          case '/' =>
            expect("/>", "bad_markup")
            open = false; selfClosed = true
          case _ =>
            if (i == before) bail("bad_markup") // attr needs leading space
            val an = name()
            if (!seen.add(an)) bail("duplicate_attribute")
            ws()
            if (eof || cur != '=') bail("bad_attribute")
            i += 1
            ws()
            attrs += ((an, attrValue()))
        }
      }
      h.startElement(tag, attrs.result(), depth)
      if (!selfClosed) {
        content(depth)
        // cursor on "</"
        i += 2
        val closing = name()
        if (closing != tag) bail("mismatched_tag")
        ws()
        if (eof || cur != '>') bail("bad_markup")
        i += 1
      }
      h.endElement(tag, depth)
    }

    /** Element content up to (not consuming) the matching `</`. */
    private def content(depth: Int): Unit = {
      val out = new java.lang.StringBuilder
      def flush(): Unit =
        if (out.length > 0) { h.text(out.toString, cdata = false); out.setLength(0) }
      while (true) {
        if (eof) bail("truncated_xml")
        val c = cur
        if (c == '<') {
          if (s.startsWith("</", i)) { flush(); return }
          else if (s.startsWith("<!--", i)) { flush(); i += 2; commentBody() }
          else if (s.startsWith("<![", i)) { flush(); i += 2; cdataBody() }
          else if (s.startsWith("<!", i)) bail("bad_markup")
          else if (s.startsWith("<?", i)) { flush(); i += 1; piBody() }
          else { flush(); element(depth + 1) }
        } else if (c == '&') reference(out)
        else if (c == '>') { out.append(c); i += 1 }
        else {
          if (s.startsWith("]]>", i)) bail("bad_markup") // forbidden in text
          out.append(c); i += 1
        }
      }
    }
  }
}
