package graft.operators

import graft.SparkSuite

class RobotsSpec extends SparkSuite {
  import spark.implicits._

  private def verdicts(content: String, reqs: Seq[(String, String)]): Map[(String, String), (Boolean, String)] = {
    val robots = Seq((1L, content)).toDF("host", "content")
    val requests = reqs.map { case (a, p) => (1L, a, p) }.toDF("host", "agent", "path")
    Robots.evaluate(Robots.parse(robots), Robots.parseAgents(robots), requests)
      .collect()
      .map(r => (r.getString(1), r.getString(2)) -> (r.getBoolean(3), r.getString(5)))
      .toMap
  }

  test("longest match wins; allow beats disallow on a length tie") {
    val v = verdicts(
      "User-agent: *\nDisallow: /a/\nAllow: /a/b\nDisallow: /x/y\nAllow: /x/z\n",
      Seq(("bot", "/a/b/c"), ("bot", "/a/q"), ("bot", "/elsewhere")))
    assert(v(("bot", "/a/b/c")) == (true, "allow")) // /a/b (4) beats /a/ (3)
    assert(v(("bot", "/a/q")) == (false, "disallow"))
    assert(v(("bot", "/elsewhere")) == (true, "none"))
  }

  test("tie on identical length: allow pre-empts disallow") {
    val v = verdicts(
      "User-agent: *\nDisallow: /dir/\nAllow: /dir2\n", // both length 5
      Seq(("bot", "/dir2/page")))
    assert(v(("bot", "/dir2/page"))._1)
  }

  test("wildcard and end anchor") {
    val v = verdicts(
      "User-agent: *\nDisallow: /t/*.log$\nDisallow: /img*big\n",
      Seq(("b", "/t/a.log"), ("b", "/t/a.logx"), ("b", "/imgXXbigYY"),
        ("b", "/img-big")))
    assert(!v(("b", "/t/a.log"))._1)
    assert(v(("b", "/t/a.logx"))._1) // $ anchor: .logx does not end in .log
    assert(!v(("b", "/imgXXbigYY"))._1) // un-anchored pattern is a prefix
    assert(!v(("b", "/img-big"))._1)
  }

  test("literal % and _ in patterns are not LIKE metacharacters") {
    val v = verdicts(
      "User-agent: *\nDisallow: /100%_done\n",
      Seq(("b", "/100%_done/x"), ("b", "/100x_done"), ("b", "/100%Xdone")))
    assert(!v(("b", "/100%_done/x"))._1)
    assert(v(("b", "/100x_done"))._1) // % must not match 'x'
    assert(v(("b", "/100%Xdone"))._1) // _ must not match 'X'
  }

  test("exact agent group pre-empts *, case-insensitively, even when rule-less") {
    val v = verdicts(
      "User-agent: Good-Bot\nDisallow:\n\nUser-agent: *\nDisallow: /\n",
      Seq(("good-bot", "/any"), ("GOOD-BOT", "/any"), ("other", "/any")))
    assert(v(("good-bot", "/any"))._1) // empty Disallow = no restriction
    assert(v(("GOOD-BOT", "/any"))._1)
    assert(!v(("other", "/any"))._1)
  }

  test("multi-agent groups, rules before any group ignored, comments skipped") {
    val v = verdicts(
      "Disallow: /orphan\n# note\nUser-agent: a\nUser-agent: b\nDisallow: /g/ # inline\nCrawl-delay: 10\n",
      Seq(("a", "/g/x"), ("b", "/g/x"), ("a", "/orphan"), ("c", "/g/x")))
    assert(!v(("a", "/g/x"))._1 && !v(("b", "/g/x"))._1)
    assert(v(("a", "/orphan"))._1) // orphan rule contributes nothing
    assert(v(("c", "/g/x"))._1) // no * group, no exact group -> allowed
  }

  test("a second User-agent line after rules starts a new group") {
    val v = verdicts(
      "User-agent: a\nDisallow: /onlya\nUser-agent: b\nDisallow: /onlyb\n",
      Seq(("a", "/onlyb/x"), ("b", "/onlyb/x")))
    assert(v(("a", "/onlyb/x"))._1) // /onlyb belongs to b's group only
    assert(!v(("b", "/onlyb/x"))._1)
  }
}
