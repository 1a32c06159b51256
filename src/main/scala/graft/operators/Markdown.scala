package graft.operators

/** Markdown structure walk — the document-shape census a code-corpus
  * pipeline runs before deciding how to weight, split, or strip a page:
  * heading outline, fenced code blocks (with info-string language tags),
  * links/images, and the prose/code character split.
  *
  * Reference obligation: none (beyond-reference training-data mandate).
  * Grammar is the CommonMark subset that is line-decidable:
  *  - ATX headings: 1-6 `#` then a space (or end of line).
  *  - Fenced code: a line opening with >=3 backticks, optional
  *    info string (first word = language tag); closed by a fence line of
  *    at least the opening length with no info string. An unclosed fence
  *    runs to EOF (CommonMark's rule) — counted, flagged.
  *  - Inline links `[text](url)` and images `![alt](url)` counted
  *    OUTSIDE fenced blocks only.
  *
  * Single pass, O(1) state per record — composes with mapPartitions like
  * the codec walks; no shuffle, linear in payload at any corpus size.
  */
object Markdown {

  final case class MdInfo(
      nHeadings: Int,
      maxHeadingDepth: Int,
      nFences: Int,
      unclosedFence: Boolean,
      codeLines: Long,
      codeChars: Long,
      fenceLangs: String, // sorted distinct info-string tags, csv
      nLinks: Int,
      nImages: Int,
      proseChars: Long)

  private val Heading = """(#{1,6})(?:\s.*|)""".r
  private val Link = """(!?)\[[^\]]*\]\([^)]*\)""".r

  /** Walk a markdown document. Total = every document parses (markdown
    * has no reject state — any text IS markdown); the hostile-input
    * surface is fences that never close, which CommonMark defines
    * rather than rejects. */
  def info(body: String): MdInfo = {
    val lines =
      if (body == null || body.isEmpty) Array.empty[String]
      else body.split("\r\n|\n", -1)
    var nHeadings = 0
    var maxDepth = 0
    var nFences = 0
    var codeLines = 0L
    var codeChars = 0L
    var nLinks = 0
    var nImages = 0
    var proseChars = 0L
    val langs = scala.collection.mutable.SortedSet.empty[String]
    var fenceLen = 0 // 0 = outside a fence
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      val trimmed = line.trim
      val ticks = trimmed.takeWhile(_ == '`').length
      if (fenceLen > 0) {
        if (ticks >= fenceLen && trimmed.drop(ticks).isEmpty) fenceLen = 0
        else { codeLines += 1; codeChars += line.length }
      } else if (ticks >= 3) {
        fenceLen = ticks
        nFences += 1
        val info = trimmed.drop(ticks).trim
        if (info.nonEmpty) langs += info.takeWhile(!_.isWhitespace)
      } else {
        trimmed match {
          case Heading(hashes) =>
            nHeadings += 1
            maxDepth = math.max(maxDepth, hashes.length)
          case _ =>
            Link.findAllMatchIn(line).foreach { m =>
              if (m.group(1).nonEmpty) nImages += 1 else nLinks += 1
            }
            proseChars += line.length
        }
      }
      i += 1
    }
    MdInfo(nHeadings, maxDepth, nFences, unclosedFence = fenceLen > 0,
      codeLines, codeChars, langs.mkString(","), nLinks, nImages, proseChars)
  }
}
