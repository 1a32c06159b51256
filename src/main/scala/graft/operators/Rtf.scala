package graft.operators

/** RTF text extraction — the one legacy office format that is NOT a
  * zip: plain-bytes control-word markup (the public RTF 1.x
  * specification), still endemic in mail attachments and document
  * dumps. A naive "strip the braces" reader leaks font tables, style
  * sheets, and generator stamps into body text; this walker keeps a
  * proper group stack and destination discipline.
  *
  * Grammar walked:
  *   - `{` / `}` push/pop group state (the skip flag and the \ucN
  *     fallback count are GROUP-SCOPED, restored on pop);
  *   - control words `\word[-]N` with their optional space delimiter;
  *     control symbols `\x`;
  *   - `\par`/`\line` → '\n', `\tab` → '\t', `\~` → NBSP-as-space,
  *     `\{` `\}` `\\` → literals;
  *   - `\'xx` → a cp1252 byte (the RTF default charset; `\ansicpg`
  *     values other than 1252 quarantine by name rather than decode
  *     with the wrong table);
  *   - `\uN` → the signed-16-bit code point, then the group's \ucN
  *     (default 1) fallback chars are SKIPPED (the double-emission
  *     bug every naive reader has);
  *   - `\binN` skips N raw bytes (which may contain braces — counting
  *     them as group delimiters corrupts the stack);
  *   - destinations: `{\*\...}` and the known non-content tables
  *     (fonttbl, colortbl, stylesheet, info, pict, fldinst, header,
  *     footer) are skipped whole; `\fldrslt` (a field's RESULT) is
  *     content and kept.
  *
  * Reject-don't-guess: a blob not opening with `{\rtf`, unbalanced
  * groups at EOF, a truncated control word/hex escape, or an
  * unsupported declared code page quarantines with a named reason.
  * Per-row byte work, no shuffle.
  */
object Rtf {

  final case class Extracted(text: String, nGroups: Long, nSkipped: Long)

  final case class Rejected(reason: String)

  private final class Bail(val reason: String) extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }
  private def bail(reason: String): Nothing = throw new Bail(reason)

  // cp1252's 0x80-0x9F block (the rest is latin-1-identical)
  private val Cp1252High: Array[Char] = Array(
    '\u20AC', '\u0081', '\u201A', '\u0192', '\u201E', '\u2026', '\u2020',
    '\u2021', '\u02C6', '\u2030', '\u0160', '\u2039', '\u0152', '\u008D',
    '\u017D', '\u008F', '\u0090', '\u2018', '\u2019', '\u201C', '\u201D',
    '\u2022', '\u2013', '\u2014', '\u02DC', '\u2122', '\u0161', '\u203A',
    '\u0153', '\u009D', '\u017E', '\u0178')

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "fldinst",
    "header", "footer", "footnote", "generator", "themedata",
    "latentstyles", "listtable", "listoverridetable", "rsidtbl")

  def extract(blob: Array[Byte]): Either[Rejected, Extracted] =
    try {
      val s = blob
      if (s.length < 6 || s(0) != '{' || s(1) != '\\' || s(2) != 'r' ||
        s(3) != 't' || s(4) != 'f') bail("not_rtf")
      val out = new java.lang.StringBuilder
      var i = 0
      var depth = 0
      var nGroups = 0L
      var nSkipped = 0L
      // group-scoped state: (skip flag, uc fallback count)
      var skip = false
      var uc = 1
      val stack = new java.util.ArrayDeque[(Boolean, Int)]()
      var pendingUcSkip = 0

      def readWord(): (String, Long, Boolean) = {
        // cursor past '\'; returns (word, numeric param or MinValue,
        // hasParam)
        val start = i
        while (i < s.length && ((s(i) >= 'a' && s(i) <= 'z') ||
          (s(i) >= 'A' && s(i) <= 'Z'))) i += 1
        if (i == start) bail("bad_control_word")
        val word = new String(s, start, i - start, "US-ASCII")
        var neg = false
        var hasParam = false
        var v = 0L
        if (i < s.length && s(i) == '-') { neg = true; i += 1; hasParam = true }
        while (i < s.length && s(i) >= '0' && s(i) <= '9') {
          v = v * 10 + (s(i) - '0')
          if (v > 1000000000L) bail("bad_control_param")
          hasParam = true
          i += 1
        }
        if (neg && v == 0 && !hasParam) bail("bad_control_param")
        // the single space delimiter is part of the control word
        if (i < s.length && s(i) == ' ') i += 1
        (word, if (neg) -v else v, hasParam)
      }

      def emit(c: Char): Unit =
        if (!skip) {
          if (pendingUcSkip > 0) pendingUcSkip -= 1
          else out.append(c)
        }

      while (i < s.length) {
        val c = s(i)
        c match {
          case '{' =>
            stack.push((skip, uc))
            depth += 1
            nGroups += 1
            i += 1
            // {\*\dest ...}: the whole group is a skippable destination
            if (i + 1 < s.length && s(i) == '\\' && s(i + 1) == '*') {
              skip = true
              nSkipped += 1
              i += 2
            }
          case '}' =>
            if (depth == 0) bail("unbalanced_groups")
            val (pSkip, pUc) = stack.pop()
            skip = pSkip; uc = pUc
            depth -= 1
            i += 1
          case '\\' =>
            i += 1
            if (i >= s.length) bail("truncated_rtf")
            val d = s(i)
            if ((d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z')) {
              val (word, param, hasParam) = readWord()
              word match {
                case "par" | "line" => emit('\n')
                case "tab" => emit('\t')
                case "uc" => uc = math.max(0, param.toInt)
                case "u" =>
                  if (!hasParam) bail("bad_control_param")
                  if (!skip) {
                    // signed 16-bit per spec; negatives wrap
                    val cp = (if (param < 0) param + 65536 else param).toInt
                    if (cp >= 0xD800 && cp <= 0xDFFF) bail("bad_unicode_escape")
                    if (pendingUcSkip > 0) pendingUcSkip -= 1
                    else out.append(cp.toChar)
                    // skip the group's fallback chars AFTER this point
                    pendingUcSkip += uc
                  }
                case "bin" =>
                  if (param < 0 || i + param > s.length) bail("truncated_rtf")
                  i += param.toInt // raw bytes: braces inside don't count
                case "ansicpg" =>
                  if (param != 1252 && param != 0)
                    bail(s"codepage_unsupported_$param")
                case w if SkipDestinations.contains(w) =>
                  if (!skip) { skip = true; nSkipped += 1 }
                case _ => () // formatting words: no text effect
              }
            } else {
              i += 1
              d match {
                case '\'' =>
                  if (i + 2 > s.length) bail("truncated_rtf")
                  def hex(b: Byte): Int = b match {
                    case x if x >= '0' && x <= '9' => x - '0'
                    case x if x >= 'a' && x <= 'f' => x - 'a' + 10
                    case x if x >= 'A' && x <= 'F' => x - 'A' + 10
                    case _ => bail("bad_hex_escape")
                  }
                  val v = (hex(s(i)) << 4) | hex(s(i + 1))
                  i += 2
                  emit(
                    if (v >= 0x80 && v <= 0x9F) Cp1252High(v - 0x80)
                    else v.toChar)
                case '{' | '}' | '\\' => emit(d.toChar)
                case '~' => emit(' ') // non-breaking space
                case '-' | '_' => () // optional/non-breaking hyphen marks
                case '*' => () // handled at group start; stray \* is inert
                case '\n' | '\r' => emit('\n') // escaped newline = \par
                case _ => () // other control symbols: no text
              }
            }
          case '\r' | '\n' => i += 1 // raw newlines are markup whitespace
          case _ =>
            // raw (unescaped) high bytes are cp1252 text exactly like
            // the \'xx escapes — many generators write them directly,
            // so 0x80-0x9F must route through the same mapping or a
            // raw 0x93 yields U+0093 instead of the intended U+201C
            val v = c & 0xff
            emit(if (v >= 0x80 && v <= 0x9F) Cp1252High(v - 0x80) else v.toChar)
            i += 1
        }
      }
      if (depth != 0) bail("unbalanced_groups")
      Right(Extracted(out.toString, nGroups, nSkipped))
    } catch { case e: Bail => Left(Rejected(e.reason)) }

  /** Fixture writer: paragraphs with `\par`, non-ASCII as `\uN` with
    * a '?' fallback (exercising the \uc skip), 0x80-0xFF cp1252 chars
    * as `\'xx`, plus fonttbl/stylesheet/info/generator decoys the
    * extractor must drop. */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val body = paragraphs.map { p =>
      val sb = new StringBuilder
      p.foreach {
        case c if c == '\\' || c == '{' || c == '}' => sb.append('\\').append(c)
        case '\t' => sb.append("\\tab ")
        case c if c < 0x80 => sb.append(c)
        case c =>
          val back = cp1252ByteOf(c)
          if (back >= 0) sb.append(f"\\'$back%02x")
          else sb.append(s"\\u${c.toInt}?")
      }
      sb.toString
    }.mkString("\\par\n")
    val doc = "{\\rtf1\\ansi\\ansicpg1252\\deff0\\uc1" +
      "{\\fonttbl{\\f0\\fswiss Helvetica;}{\\f1\\fmodern Courier FONTDECOY;}}" +
      "{\\stylesheet{\\s0 Normal STYLEDECOY;}}" +
      "{\\info{\\title TITLEDECOY}{\\author AUTHORDECOY}}" +
      "{\\*\\generator GraftWriter 1.0 GENDECOY;}" +
      "\\f0\\fs24 " + body + "}"
    doc.getBytes("ISO-8859-1")
  }

  private def cp1252ByteOf(c: Char): Int = {
    if (c >= 0xA0 && c <= 0xFF) c.toInt
    else {
      val hi = Cp1252High.indexOf(c)
      if (hi >= 0) hi + 0x80 else -1
    }
  }
}
