package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class MarkdownSpec extends AnyFunSuite {

  test("headings, fences, links, and the prose/code split") {
    val doc =
      """# Title
        |
        |Some prose with a [link](http://a) and an ![img](http://b).
        |
        |## Section
        |
        |```scala
        |val x = 1
        |val y = 2
        |```
        |
        |### Deep
        |
        |```
        |plain block
        |```
        |tail""".stripMargin
    val i = Markdown.info(doc)
    assert(i.nHeadings == 3 && i.maxHeadingDepth == 3)
    assert(i.nFences == 2 && !i.unclosedFence)
    assert(i.codeLines == 3)
    assert(i.codeChars == "val x = 1".length + "val y = 2".length + "plain block".length)
    assert(i.fenceLangs == "scala")
    assert(i.nLinks == 1 && i.nImages == 1)
    // prose: blanks + the prose line + "tail" count; headings do not
    assert(i.proseChars ==
      "Some prose with a [link](http://a) and an ![img](http://b).".length + 4)
  }

  test("links inside fences are code, not links; info strings census") {
    val doc =
      """```python extra words
        |x = "[not a link](url)"
        |```
        |```python
        |y = 1
        |```""".stripMargin
    val i = Markdown.info(doc)
    assert(i.nLinks == 0 && i.nFences == 2)
    assert(i.fenceLangs == "python") // distinct, first word only
    assert(i.codeLines == 2)
  }

  test("CommonMark edge rules: fence close length, unclosed to EOF") {
    // a closing fence must be at least the opening length
    val i1 = Markdown.info("````\ncode\n```\nstill code\n````\nprose")
    assert(i1.nFences == 1 && !i1.unclosedFence && i1.codeLines == 3)
    val i2 = Markdown.info("```\nnever closed")
    assert(i2.nFences == 1 && i2.unclosedFence && i2.codeLines == 1)
    // heading requires a space (or bare hashes); ####### is 7 -> prose
    assert(Markdown.info("#bare").nHeadings == 0)
    assert(Markdown.info("##").nHeadings == 1)
    assert(Markdown.info("#######").nHeadings == 0)
  }

  test("null / empty / CRLF") {
    assert(Markdown.info(null).proseChars == 0)
    assert(Markdown.info("").nHeadings == 0)
    val i = Markdown.info("# A\r\n```\r\ncode\r\n```\r\n")
    assert(i.nHeadings == 1 && i.nFences == 1 && i.codeLines == 1)
  }
}
