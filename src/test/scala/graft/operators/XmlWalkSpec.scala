package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class XmlWalkSpec extends AnyFunSuite {

  private def info(s: String): XmlWalk.Info = XmlWalk.census(s).toOption.get
  private def reject(s: String): String =
    XmlWalk.census(s).swap.toOption.getOrElse(fail(s"accepted: $s"))

  test("well-formed document censuses structure exactly") {
    val doc =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<!-- prolog comment -->
        |<catalog xmlns="urn:x" version="2">
        |  <item id="1" lang="en">alpha &amp; beta</item>
        |  <item id="2">
        |    <name>n&#233;e</name>
        |    <blob><![CDATA[raw <markup> kept]]></blob>
        |  </item>
        |  <?target data?>
        |  <empty/>
        |</catalog>""".stripMargin
    val c = info(doc)
    assert(c.rootTag == "catalog")
    assert(c.maxDepth == 3) // catalog > item > name
    assert(c.nElements == 6) // catalog, item, item, name, blob, empty
    assert(c.nAttrs == 5) // xmlns+version, id+lang, id
    assert(c.nComments == 1)
    assert(c.nPis == 1)
    assert(c.nCdata == 1)
  }

  test("entity and character references decode; text chars are counted decoded") {
    // "a&b" (3) + "née" (3) + "–" (1 via hex ref) + "<x>" (3)
    val doc = "<r><a>a&amp;b</a><b>n&#233;e</b><c>&#x2013;</c>" +
      "<d><![CDATA[<x>]]></d></r>"
    assert(info(doc).nTextChars == 10)
  }

  test("inter-element whitespace counts as character data") {
    assert(info("<r>\n  <a/>\n</r>").nTextChars == 4)
    assert(info("<r><a/></r>").nTextChars == 0)
  }

  test("supplementary code points count once") {
    assert(info("<r>&#x1F600;</r>").nTextChars == 1)
  }

  test("malformed documents quarantine with named reasons") {
    assert(reject("<a><b></a></b>") == "mismatched_tag")
    assert(reject("<a>") == "truncated_xml")
    assert(reject("<a attr></a>") == "bad_attribute")
    assert(reject("<a x=unquoted></a>") == "bad_attribute")
    assert(reject("<a x=\"1\" x=\"2\"></a>") == "duplicate_attribute")
    assert(reject("<a>&undefined;</a>") == "bad_entity")
    assert(reject("<a>&#xD800;</a>") == "bad_entity") // surrogate ref
    assert(reject("<a>&#;</a>") == "bad_entity")
    assert(reject("<a></a><b></b>") == "multiple_roots")
    assert(reject("<a></a>trailing") == "text_outside_root")
    assert(reject("leading<a></a>") == "text_outside_root")
    assert(reject("<a><!-- -- --></a>") == "bad_comment")
    assert(reject("<a>]]></a>") == "bad_markup")
    assert(reject("<!DOCTYPE html><a></a>") == "dtd_unsupported")
    assert(reject("") == "no_root_element")
    assert(reject("<a x=\"v\"y=\"w\"></a>") == "bad_markup") // no space
  }

  test("depth cap rejects beyond 64 and accepts at 64") {
    def nested(n: Int) = ("<d>" * n) + ("</d>" * n)
    assert(XmlWalk.census(nested(64)).isRight)
    assert(reject(nested(65)) == "depth_cap")
  }

  test("self-closing, namespaced, and attribute-entity forms parse") {
    val c = info("""<ns:r><ns:e a="x &lt; y" b='q"q'/></ns:r>""")
    assert(c.rootTag == "ns:r" && c.nElements == 2 && c.nAttrs == 2)
    // attribute value with raw '<' is malformed
    assert(reject("<r a=\"x < y\"/>") == "bad_attribute")
  }

  test("handler receives split text runs and reassembles in order") {
    val got = new StringBuilder
    val h = new XmlWalk.Handler {
      override def text(decoded: String, cdata: Boolean): Unit =
        got.append(decoded)
    }
    // entity boundaries split the text into multiple events
    assert(XmlWalk.walk("<r>one&amp;<c/>two<![CDATA[three]]></r>", h).isRight)
    assert(got.toString == "one&twothree")
  }

  test("xml-stylesheet PI is a PI, not the declaration (advice r13)") {
    // a PI whose target merely STARTS with 'xml' must be counted; only
    // exactly '<?xml' + whitespace/'?' is the declaration
    assert(info("<?xml-stylesheet type=\"text/xsl\" href=\"s.xsl\"?><r/>")
      .nPis == 1)
    assert(info("<?xml version=\"1.0\"?><r/>").nPis == 0)
    assert(info("<?xml?><r/>").nPis == 0) // declaration-shaped, tolerated
  }
}
