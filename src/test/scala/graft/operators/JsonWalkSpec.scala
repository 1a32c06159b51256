package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class JsonWalkSpec extends AnyFunSuite {

  test("structure census of a nested document") {
    val i = JsonWalk.info(
      """{"id": 7, "tags": ["a", "bb"], "meta": {"ok": true, "note": null},
        |"score": -1.25e2}""".stripMargin).get
    assert(i.nObjects == 2 && i.nArrays == 1)
    assert(i.nKeys == 6) // id, tags, meta, ok, note, score
    assert(i.nStrings == 2 && i.stringChars == 3) // "a" + "bb"
    assert(i.nNumbers == 2 && i.nBools == 1 && i.nNulls == 1)
    assert(i.maxArrayLen == 2)
    assert(i.maxDepth == 3) // root 1 -> meta 2 -> its scalars 3
  }

  test("escapes count as one unescaped char each") {
    val i = JsonWalk.info("""{"s": "a\nbé\\"}""").get
    assert(i.stringChars == 5) // a, \n, b, é, backslash
  }

  test("scalar roots and empty containers") {
    assert(JsonWalk.info("42").get.nNumbers == 1)
    assert(JsonWalk.info("\"x\"").get.stringChars == 1)
    val e = JsonWalk.info("{\"a\": [], \"b\": {}}").get
    assert(e.nArrays == 1 && e.nObjects == 2 && e.maxArrayLen == 0)
  }

  test("lexical corruption quarantines") {
    for (bad <- Seq(
      null, "", "{", "[1, 2", "{\"a\": 1,}", "[1, 2,]",
      "{'a': 1}", "{\"a\" 1}", "{\"a\": 01}", "{\"a\": +1}",
      "{\"a\": 1} trailing", "\"unterminated", "{\"a\": \"bad \\x esc\"}",
      "{\"a\": tru}", "nul", "{\"a\": .5}", "{\"a\": 1.}", "{\"a\": 1e}"))
      assert(JsonWalk.info(bad).isEmpty, s"should reject: $bad")
  }

  test("depth cap rejects pathological nesting") {
    val deep = "[" * 100 + "1" + "]" * 100
    assert(JsonWalk.info(deep).isEmpty)
    val ok = "[" * 50 + "1" + "]" * 50
    assert(JsonWalk.info(ok).exists(_.maxDepth == 51))
  }
}
