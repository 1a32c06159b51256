package graft.operators

import scala.collection.mutable.ArrayBuffer

/** Minimal PDF text extraction — the single most common non-HTML document
  * format in a web crawl. Implements the public-spec (ISO 32000-1) subset
  * a text-mining ingest actually needs:
  *
  *   - classic cross-reference TABLE walk (`startxref` → `xref` →
  *     `trailer` → `/Root`), single section, direct offsets
  *   - the document tree: Catalog → Pages (→ nested Pages) → Page →
  *     `/Contents` stream(s), Kids walked in order with a visited-set so
  *     reference cycles quarantine instead of looping
  *   - `/FlateDecode` content streams (zlib, via the same JDK Inflater
  *     already used for the compression-ratio scorer)
  *   - content-stream text operators: `Tj`, `'`, and `TJ` between
  *     `BT`/`ET`, with full literal-string escape handling (the eight
  *     named escapes, 1-3 digit octal, line continuation, and the
  *     CR/CRLF→LF end-of-line normalization the spec mandates inside
  *     strings) and hex strings (odd-digit zero padding)
  *
  * Same quarantine contract as [[Warc]]: a blob violating the grammar
  * anywhere — bad header, unparseable or truncated xref, offsets outside
  * the blob, an indirect or wrong `/Length`, a `/Prev` chain (incremental
  * updates are out of subset), an unknown filter, a reference loop, a
  * text operator outside BT/ET, unbalanced parens — extracts to None,
  * never to a partial page list. At 100 TB you quarantine corrupt
  * documents; you do not ship half of one into the training set.
  *
  * Beyond-reference operator (the reference pipeline ingests no binary
  * documents); public-spec subset, hand-built like the other codecs.
  */
object Pdf {

  // ------------------------------------------------------------------
  // Writer: deterministic single-xref PDFs for fixtures. Shown text is
  // modeled explicitly so fixtures exercise every extraction path.
  // ------------------------------------------------------------------

  /** One text-showing operation inside a page's content stream. */
  sealed trait TextOp
  /** `(…) Tj` — literal string (writer escapes `\ ( ) \r \n`). */
  final case class Lit(s: String) extends TextOp
  /** `[(a) -250 (b) …] TJ` — array form with kerning numbers between
    * parts; extracted text is the concatenation of the string elements. */
  final case class Arr(parts: Seq[String]) extends TextOp
  /** `<48…> Tj` — hex-string form. */
  final case class Hex(s: String) extends TextOp

  /** One page: its shown ops (text = concatenation, in order) and
    * whether the content stream is Flate-compressed. */
  final case class Page(ops: Seq[TextOp], flate: Boolean)

  private def escapeLit(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '('  => sb.append("\\(")
      case ')'  => sb.append("\\)")
      // raw CR (and CRLF) inside a literal string reads back as LF per
      // the spec's EOL normalization — escape both so round-trip is exact
      case '\r' => sb.append("\\r")
      case '\n' => sb.append("\\n")
      case c    => sb.append(c)
    }
    sb.toString
  }

  private def hexOf(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  private def renderOps(ops: Seq[TextOp]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("BT /F1 12 Tf 72 720 Td ")
    ops.zipWithIndex.foreach { case (op, i) =>
      if (i > 0) sb.append("0 -14 Td ")
      op match {
        case Lit(s) => sb.append('(').append(escapeLit(s)).append(") Tj ")
        case Arr(parts) =>
          sb.append('[')
          parts.zipWithIndex.foreach { case (p, j) =>
            if (j > 0) sb.append(' ').append(-200 - 10 * j).append(' ')
            sb.append('(').append(escapeLit(p)).append(')')
          }
          sb.append("] TJ ")
        case Hex(s) =>
          sb.append('<').append(hexOf(s.getBytes("UTF-8"))).append("> Tj ")
      }
    }
    sb.append("ET")
    sb.toString.getBytes("UTF-8")
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Serialize a document. Object layout: 1 = Catalog, 2 = Pages,
    * 2k+1 / 2k+2 = page k's Page / Contents. Single xref section,
    * deterministic byte-for-byte. */
  def write(pages: Seq[Page]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("UTF-8"))
    val offsets = ArrayBuffer[Int]()
    w("%PDF-1.4\n")
    val kids = pages.indices.map(k => s"${2 * k + 3} 0 R").mkString(" ")
    offsets += out.size()
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets += out.size()
    w(s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count ${pages.size} >>\nendobj\n")
    pages.zipWithIndex.foreach { case (p, k) =>
      val pageNum = 2 * k + 3
      offsets += out.size()
      w(s"$pageNum 0 obj\n<< /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${pageNum + 1} 0 R >>\nendobj\n")
      val raw = renderOps(p.ops)
      val data = if (p.flate) deflate(raw) else raw
      val filter = if (p.flate) " /Filter /FlateDecode" else ""
      offsets += out.size()
      w(s"${pageNum + 1} 0 obj\n<< /Length ${data.length}$filter >>\nstream\n")
      out.write(data)
      w("\nendstream\nendobj\n")
    }
    val xrefAt = out.size()
    val n = offsets.size + 1
    w(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Object model + lexer for the parser
  // ------------------------------------------------------------------

  private sealed trait Obj
  private case class PInt(v: Long) extends Obj
  private case class PReal(v: Double) extends Obj
  private case class PName(v: String) extends Obj
  private case class PStr(bytes: Array[Byte]) extends Obj
  private case class PArr(items: Vector[Obj]) extends Obj
  private case class PDict(m: Map[String, Obj]) extends Obj
  private case class PRef(num: Int) extends Obj
  private case object PNull extends Obj
  private case class PBool(v: Boolean) extends Obj
  /** Signals any grammar violation; caught once at the top. */
  private final class Bad extends RuntimeException("bad pdf")
  private def bad(): Nothing = throw new Bad

  private def isWs(b: Byte): Boolean = b == ' ' || b == '\t' || b == '\r' ||
    b == '\n' || b == '\f' || b == 0
  private def isDelim(b: Byte): Boolean = "()<>[]{}/%".indexOf(b.toChar) >= 0

  /** Cursor-based lexer/parser over the whole blob. */
  private final class Lexer(val buf: Array[Byte], var pos: Int) {
    def atEnd: Boolean = pos >= buf.length
    def peek: Byte = { if (atEnd) bad(); buf(pos) }
    def next(): Byte = { val b = peek; pos += 1; b }

    def skipWs(): Unit = {
      var going = true
      while (going && !atEnd) {
        if (isWs(buf(pos))) pos += 1
        else if (buf(pos) == '%') { // comment to EOL
          while (!atEnd && buf(pos) != '\r' && buf(pos) != '\n') pos += 1
        } else going = false
      }
    }

    def keyword(): String = {
      skipWs()
      val start = pos
      while (!atEnd && !isWs(buf(pos)) && !isDelim(buf(pos))) pos += 1
      if (pos == start) bad()
      new String(buf, start, pos - start, "US-ASCII")
    }

    def expect(kw: String): Unit = if (keyword() != kw) bad()

    /** One object; `resolveLen` inlines integer refs for /Length only. */
    def obj(): Obj = {
      skipWs()
      if (atEnd) bad()
      (peek: @annotation.switch) match {
        case '/' => name()
        case '(' => literalString()
        case '[' =>
          pos += 1
          val items = Vector.newBuilder[Obj]
          skipWs()
          while (peek != ']') { items += obj(); skipWs() }
          pos += 1
          PArr(items.result())
        case '<' =>
          if (pos + 1 < buf.length && buf(pos + 1) == '<') dict()
          else hexString()
        case _ => numberOrKeyword()
      }
    }

    def name(): PName = {
      if (next() != '/') bad()
      val sb = new StringBuilder
      while (!atEnd && !isWs(buf(pos)) && !isDelim(buf(pos))) {
        if (buf(pos) == '#') { // #xx hex escape in names
          if (pos + 2 >= buf.length) bad()
          val h = Integer.parseInt(
            new String(buf, pos + 1, 2, "US-ASCII"), 16)
          sb.append(h.toChar); pos += 3
        } else { sb.append(buf(pos).toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    def dict(): PDict = {
      pos += 2 // <<
      val m = Map.newBuilder[String, Obj]
      skipWs()
      while (!(peek == '>' && pos + 1 < buf.length && buf(pos + 1) == '>')) {
        val k = name().v
        m += k -> obj()
        skipWs()
      }
      pos += 2
      PDict(m.result())
    }

    /** Literal string: nesting parens, the eight escapes, octal, line
      * continuation, and in-string EOL normalization (CR, CRLF → LF). */
    def literalString(): PStr = {
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        val b = next()
        b match {
          case '(' => depth += 1; out.write(b)
          case ')' => depth -= 1; if (depth > 0) out.write(b)
          case '\\' =>
            val e = next()
            e match {
              case 'n' => out.write('\n')
              case 'r' => out.write('\r')
              case 't' => out.write('\t')
              case 'b' => out.write('\b')
              case 'f' => out.write('\f')
              case '(' => out.write('(')
              case ')' => out.write(')')
              case '\\' => out.write('\\')
              case '\r' => // line continuation: swallow CR and optional LF
                if (!atEnd && peek == '\n') pos += 1
              case '\n' => // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = d - '0'
                var k = 1
                while (k < 3 && !atEnd && peek >= '0' && peek <= '7') {
                  v = v * 8 + (next() - '0'); k += 1
                }
                out.write(v & 0xff)
              case _ => bad() // a reversed solidus before anything else
            }
          case '\r' => // EOL inside string normalizes to LF
            if (!atEnd && peek == '\n') pos += 1
            out.write('\n')
          case _ => out.write(b)
        }
      }
      PStr(out.toByteArray)
    }

    /** Hex string `<…>`: whitespace allowed, odd digit count padded. */
    def hexString(): PStr = {
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var b = next()
      while (b != '>') {
        if (!isWs(b)) {
          val d = Character.digit(b.toChar, 16)
          if (d < 0) bad()
          if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
        }
        b = next()
      }
      if (hi >= 0) out.write(hi * 16)
      PStr(out.toByteArray)
    }

    def numberOrKeyword(): Obj = {
      val start = pos
      val kw = keyword()
      kw match {
        case "true"  => PBool(true)
        case "false" => PBool(false)
        case "null"  => PNull
        case _ =>
          if (!kw.matches("[+-]?[0-9.]+")) bad()
          if (kw.contains('.')) PReal(kw.toDouble)
          else {
            val v = try kw.toLong catch { case _: NumberFormatException => bad() }
            // possible `num gen R` reference: look ahead
            val save = pos
            skipWs()
            val p2 = pos
            if (!atEnd && buf(pos) >= '0' && buf(pos) <= '9') {
              val genTok = try keyword() catch { case _: Bad => pos = save; return PInt(v) }
              if (genTok.forall(_.isDigit)) {
                skipWs()
                if (!atEnd && peek == 'R' &&
                    (pos + 1 >= buf.length || isWs(buf(pos + 1)) ||
                      isDelim(buf(pos + 1)))) {
                  pos += 1
                  if (v < 0 || v > Int.MaxValue) bad()
                  return PRef(v.toInt)
                }
              }
            }
            pos = save
            val _ = p2
            PInt(v)
          }
      }
    }
  }

  // ------------------------------------------------------------------
  // Document walk
  // ------------------------------------------------------------------

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = try inf.inflate(buf)
          catch { case _: java.util.zip.DataFormatException => bad() }
        if (n == 0 && !inf.finished()) bad() // truncated / needs dict
        out.write(buf, 0, n)
      }
      if (inf.getRemaining != 0) bad() // trailing garbage in the stream
    } finally inf.end()
    out.toByteArray
  }

  /** Parsed body of one indirect object: the value, plus stream bytes
    * (post-filter) when it is a stream object. */
  private final case class Indirect(value: Obj, stream: Option[Array[Byte]])

  private final class Doc(buf: Array[Byte], xref: Map[Int, Int]) {

    def parseObjectAt(num: Int): Indirect = {
      val off = xref.getOrElse(num, bad())
      if (off < 0 || off >= buf.length) bad()
      val lx = new Lexer(buf, off)
      val numTok = lx.keyword()
      if (numTok != num.toString) bad()
      val genTok = lx.keyword()
      if (!genTok.forall(_.isDigit)) bad()
      lx.expect("obj")
      val value = lx.obj()
      lx.skipWs()
      // stream or endobj
      val save = lx.pos
      val kw = try lx.keyword() catch { case _: Bad => bad() }
      if (kw == "endobj") Indirect(value, None)
      else if (kw == "stream") {
        val dict = value match { case d: PDict => d; case _ => bad() }
        // exactly one EOL after `stream` (CRLF or LF; lone CR forbidden)
        var p = lx.pos
        if (p < buf.length && buf(p) == '\r') p += 1
        if (p >= buf.length || buf(p) != '\n') bad()
        p += 1
        // /Length must be a DIRECT integer in this subset: resolving an
        // indirect length needs the xref we are mid-walk on — real
        // readers do it, this one quarantines instead of guessing
        val len = dict.m.get("Length") match {
          case Some(PInt(v)) if v >= 0 => v.toInt
          case _ => bad()
        }
        if (p + len > buf.length) bad()
        val data = java.util.Arrays.copyOfRange(buf, p, p + len)
        val after = new Lexer(buf, p + len)
        after.expect("endstream")
        after.expect("endobj")
        val decoded = dict.m.get("Filter") match {
          case None => data
          case Some(PName("FlateDecode")) => inflate(data)
          case Some(PArr(Vector(PName("FlateDecode")))) => inflate(data)
          case Some(_) => bad() // unknown filter: quarantine, don't guess
        }
        Indirect(dict, Some(decoded))
      } else { val _ = save; bad() }
    }

    def resolve(o: Obj): Obj = o match {
      case PRef(n) => parseObjectAt(n).value
      case other   => other
    }

    def dictOf(o: Obj): PDict =
      resolve(o) match { case d: PDict => d; case _ => bad() }
  }

  // ------------------------------------------------------------------
  // Content-stream text extraction
  // ------------------------------------------------------------------

  private def textOfContent(content: Array[Byte]): Array[Byte] = {
    val lx = new Lexer(content, 0)
    val out = new java.io.ByteArrayOutputStream()
    val operands = ArrayBuffer[Obj]()
    var inText = false
    lx.skipWs()
    while (!lx.atEnd) {
      val b = lx.peek
      if (b == '/' || b == '(' || b == '[' || b == '<' ||
          b == '+' || b == '-' || b == '.' || (b >= '0' && b <= '9')) {
        operands += lx.obj()
      } else {
        val op = lx.keyword()
        op match {
          case "BT" => if (inText) bad(); inText = true; operands.clear()
          case "ET" => if (!inText) bad(); inText = false; operands.clear()
          case "Tj" | "'" =>
            if (!inText) bad()
            operands.lastOption match {
              case Some(PStr(s)) => out.write(s, 0, s.length)
              case _ => bad()
            }
            operands.clear()
          case "TJ" =>
            if (!inText) bad()
            operands.lastOption match {
              case Some(PArr(items)) =>
                items.foreach {
                  case PStr(s) => out.write(s, 0, s.length)
                  case PInt(_) | PReal(_) => ()
                  case _ => bad()
                }
              case _ => bad()
            }
            operands.clear()
          case _ => operands.clear() // Tf, Td, cm, … consume their operands
        }
      }
      lx.skipWs()
    }
    if (inText) bad() // unbalanced BT
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Entry point
  // ------------------------------------------------------------------

  /** Extract per-page text (UTF-8 decoded, pages in Kids order), or None
    * if the blob violates the supported grammar anywhere. */
  def extractText(blob: Array[Byte]): Option[Seq[String]] =
    try Some(extractOrThrow(blob)) catch {
      case _: Bad => None
      case _: IndexOutOfBoundsException => None
      case _: NumberFormatException => None
      case _: StackOverflowError => None // pathological nesting
    }

  private def extractOrThrow(blob: Array[Byte]): Seq[String] = {
    if (blob.length < 16) bad()
    if (!new String(blob, 0, 5, "US-ASCII").equals("%PDF-")) bad()

    // ---- startxref: last occurrence near the end of the file
    val tailStart = math.max(0, blob.length - 256)
    val tail = new String(blob, tailStart, blob.length - tailStart, "ISO-8859-1")
    val sxAt = tail.lastIndexOf("startxref")
    if (sxAt < 0) bad()
    val lx0 = new Lexer(blob, tailStart + sxAt)
    lx0.expect("startxref")
    val xrefAt = lx0.keyword() match {
      case s if s.forall(_.isDigit) && s.nonEmpty => s.toLong
      case _ => bad()
    }
    if (xrefAt < 0 || xrefAt >= blob.length) bad()

    // ---- xref table: subsections of 20-byte entries
    val lx = new Lexer(blob, xrefAt.toInt)
    lx.expect("xref")
    val xref = Map.newBuilder[Int, Int]
    var kw = lx.keyword()
    while (kw != "trailer") {
      val start = if (kw.forall(_.isDigit) && kw.nonEmpty) kw.toInt else bad()
      val count = lx.keyword() match {
        case s if s.forall(_.isDigit) && s.nonEmpty => s.toInt
        case _ => bad()
      }
      if (count < 0 || count > 1000000) bad()
      lx.skipWs()
      var i = 0
      while (i < count) {
        if (lx.pos + 20 > blob.length) bad()
        val entry = new String(blob, lx.pos, 20, "US-ASCII")
        if (!entry.matches("\\d{10} \\d{5} [nf](\\r\\n| \\n| \\r)")) bad()
        if (entry.charAt(17) == 'n')
          xref += (start + i) -> entry.substring(0, 10).toInt
        lx.pos += 20
        i += 1
      }
      kw = lx.keyword()
    }
    val trailer = lx.obj() match { case d: PDict => d; case _ => bad() }
    // incremental-update chains are out of subset: quarantine, because
    // following /Prev means merging xref generations this walker doesn't
    if (trailer.m.contains("Prev") || trailer.m.contains("XRefStm")) bad()

    val doc = new Doc(blob, xref.result())
    val rootRef = trailer.m.getOrElse("Root", bad())
    val root = doc.dictOf(rootRef)
    if (root.m.get("Type") != Some(PName("Catalog"))) bad()

    // ---- page-tree walk, visited-set against reference cycles
    val visited = scala.collection.mutable.Set[Int]()
    val pages = ArrayBuffer[PDict]()
    def walk(ref: Obj, depth: Int): Unit = {
      if (depth > 32) bad()
      ref match {
        case PRef(n) => if (!visited.add(n)) bad()
        case _ => bad() // Kids entries must be references
      }
      val node = doc.dictOf(ref)
      node.m.get("Type") match {
        case Some(PName("Pages")) =>
          node.m.get("Kids") match {
            case Some(PArr(kids)) => kids.foreach(walk(_, depth + 1))
            case _ => bad()
          }
        case Some(PName("Page")) => pages += node
        case _ => bad()
      }
    }
    walk(root.m.getOrElse("Pages", bad()), 0)

    // ---- per-page content: single stream ref or array of refs
    pages.toSeq.map { page =>
      val content = new java.io.ByteArrayOutputStream()
      def appendStream(ref: Obj): Unit = ref match {
        case PRef(n) =>
          val ind = doc.parseObjectAt(n)
          val data = ind.stream.getOrElse(bad())
          if (content.size() > 0) content.write('\n') // spec: streams are
          content.write(data, 0, data.length)          // joined with WS
        case _ => bad()
      }
      page.m.get("Contents") match {
        case Some(r: PRef)    => appendStream(r)
        case Some(PArr(rs))   => rs.foreach(appendStream)
        case None             => () // a page with no content: empty text
        case _                => bad()
      }
      new String(textOfContent(content.toByteArray), "UTF-8")
    }
  }
}
