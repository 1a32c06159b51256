package graft.operators

/** JSON structure walk — the schema-inference triage pass: before a
  * pipeline flattens crawled JSON/API dumps into columns it needs the
  * SHAPE census (nesting depth, container and key counts, value-type
  * mix, string volume), and a strict lexical verdict — a truncated or
  * hand-edited blob must quarantine, not half-parse. Spark's own
  * `get_json_object` answers "pull this path"; this walk answers
  * "census a corpus of blobs", the q218-for-JSON.
  *
  * Strict RFC 8259 subset, reject-don't-guess: trailing content after
  * the top-level value, unterminated strings, bad escapes, malformed
  * numbers, unquoted keys, trailing commas, and nesting beyond depth
  * 64 all return None. String characters are counted UNESCAPED (a
  * `\uXXXX` or `\n` is one char), so the census reflects text volume,
  * not encoding overhead. Per-row `mapPartitions` work, no shuffle.
  */
object JsonWalk {

  final case class Info(
      maxDepth: Int,
      nObjects: Long,
      nArrays: Long,
      nKeys: Long,
      nStrings: Long,
      nNumbers: Long,
      nBools: Long,
      nNulls: Long,
      maxArrayLen: Int,
      stringChars: Long)

  private val MaxDepth = 64

  private final class Walker(s: String) {
    var i = 0
    var maxDepth = 0
    var nObjects = 0L
    var nArrays = 0L
    var nKeys = 0L
    var nStrings = 0L
    var nNumbers = 0L
    var nBools = 0L
    var nNulls = 0L
    var maxArrayLen = 0
    var stringChars = 0L

    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    /** Consume a string literal, return its UNESCAPED length or -1. */
    def str(): Int = {
      if (i >= s.length || s.charAt(i) != '"') return -1
      i += 1
      var len = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') { i += 1; return len }
        else if (c == '\\') {
          if (i + 1 >= s.length) return -1
          val e = s.charAt(i + 1)
          if (e == 'u') {
            if (i + 5 >= s.length ||
              !(2 to 5).forall(k => isHex(s.charAt(i + k)))) return -1
            i += 6
          } else if ("\"\\/bfnrt".indexOf(e) >= 0) i += 2
          else return -1
          len += 1
        } else if (c < 0x20) return -1 // raw control char in string
        else { i += 1; len += 1 }
      }
      -1 // unterminated
    }

    private def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    def number(): Boolean = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      if (i >= s.length || !s.charAt(i).isDigit) return false
      if (s.charAt(i) == '0') i += 1
      else while (i < s.length && s.charAt(i).isDigit) i += 1
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        if (i >= s.length || !s.charAt(i).isDigit) return false
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i >= s.length || !s.charAt(i).isDigit) return false
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      i > start
    }

    def lit(word: String): Boolean =
      s.regionMatches(i, word, 0, word.length) && { i += word.length; true }

    def value(depth: Int): Boolean = {
      if (depth > MaxDepth) return false
      if (depth > maxDepth) maxDepth = depth
      ws()
      if (i >= s.length) return false
      s.charAt(i) match {
        case '{' =>
          nObjects += 1; i += 1; ws()
          if (i < s.length && s.charAt(i) == '}') { i += 1; return true }
          while (true) {
            ws()
            val kl = str()
            if (kl < 0) return false
            nKeys += 1
            ws()
            if (i >= s.length || s.charAt(i) != ':') return false
            i += 1
            if (!value(depth + 1)) return false
            ws()
            if (i >= s.length) return false
            s.charAt(i) match {
              case ',' => i += 1
              case '}' => i += 1; return true
              case _ => return false
            }
          }
          true
        case '[' =>
          nArrays += 1; i += 1; ws()
          if (i < s.length && s.charAt(i) == ']') { i += 1; return true }
          var len = 0
          while (true) {
            if (!value(depth + 1)) return false
            len += 1
            if (len > maxArrayLen) maxArrayLen = len
            ws()
            if (i >= s.length) return false
            s.charAt(i) match {
              case ',' => i += 1
              case ']' => i += 1; return true
              case _ => return false
            }
          }
          true
        case '"' =>
          val l = str()
          if (l < 0) false
          else { nStrings += 1; stringChars += l; true }
        case 't' => if (lit("true")) { nBools += 1; true } else false
        case 'f' => if (lit("false")) { nBools += 1; true } else false
        case 'n' => if (lit("null")) { nNulls += 1; true } else false
        case _ => if (number()) { nNumbers += 1; true } else false
      }
    }
  }

  /** Census one JSON document. None = lexical corruption. */
  def info(raw: String): Option[Info] = {
    if (raw == null || raw.isEmpty) return None
    val w = new Walker(raw)
    if (!w.value(1)) return None
    w.ws()
    if (w.i != raw.length) return None // trailing junk
    Some(Info(w.maxDepth, w.nObjects, w.nArrays, w.nKeys, w.nStrings,
      w.nNumbers, w.nBools, w.nNulls, w.maxArrayLen, w.stringChars))
  }
}
