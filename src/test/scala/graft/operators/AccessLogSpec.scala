package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.Row

class AccessLogSpec extends SparkSuite {

  import spark.implicits._

  private def parse(line: String): Row =
    AccessLog.parse(Seq(line).toDF("line")).collect().head

  test("combined format: all twelve fields") {
    val r = parse("""10.0.3.7 - alice [02/Apr/2024:12:30:00 +0000] "GET /a/b?x=1 HTTP/1.1" 200 5120 "http://ref.example/" "bot/1.0 (+http://x)"""")
    assert(r.getBoolean(0))
    assert(r.getString(1) == "10.0.3.7")
    assert(r.getString(3) == "alice")
    assert(r.getString(4) == "02/Apr/2024:12:30:00 +0000")
    assert(r.getString(5) == "GET" && r.getString(6) == "/a/b?x=1")
    assert(r.getString(7) == "HTTP/1.1")
    assert(r.getInt(8) == 200 && r.getLong(9) == 5120)
    assert(r.getString(10) == "http://ref.example/")
    assert(r.getString(11) == "bot/1.0 (+http://x)")
  }

  test("common format without referer/ua tail; dash bytes decode to 0") {
    val r = parse("""192.168.1.1 - - [01/Jan/2024:00:00:00 +0000] "HEAD / HTTP/1.0" 301 -""")
    assert(r.getBoolean(0))
    assert(r.getInt(8) == 301 && r.getLong(9) == 0)
    assert(r.isNullAt(10) && r.isNullAt(11))
  }

  test("garbage lines carry matched=false with null fields") {
    for (bad <- Seq(
      "not a log line at all",
      // status must be exactly three digits
      """1.2.3.4 - - [x] "GET / HTTP/1.1" 20 99""",
      // unterminated request quote
      """1.2.3.4 - - [x] "GET / HTTP/1.1 200 99""",
      // trailing junk after the combined tail
      """1.2.3.4 - - [x] "GET / HTTP/1.1" 200 99 "r" "u" extra""")) {
      val r = parse(bad)
      assert(!r.getBoolean(0), s"should reject: $bad")
      assert(r.isNullAt(1) && r.isNullAt(8))
    }
  }
}
