package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Common/Combined Log Format parse — the server-log seam: access logs
  * are a staple large-scale text corpus (traffic analytics, abuse
  * triage, crawl-budget accounting), and the parse is the gate before
  * any of the event-style analytics (q147 funnels, q194 anomaly
  * z-scores) can run on them.
  *
  * One anchored regex per line, evaluated relationally (codegen'd
  * `rlike`/`regexp_extract`, zero shuffle): CLF's seven fixed fields
  * plus the Combined format's optional referer/user-agent tail. A line
  * that doesn't match the grammar ANCHORED END-TO-END is carried with
  * `matched = false` and null fields — reject-don't-guess at line
  * grain, so one garbage line quarantines itself, never the file, and
  * downstream censuses decide whether to count or drop the rejects.
  * The `-` convention for "no bytes" decodes to 0 per the format spec.
  */
object AccessLog {

  private val Pattern =
    "^(\\S+) (\\S+) (\\S+) \\[([^\\]]+)\\] \"(\\S+) (\\S+) ([^\"]*)\" " +
      "(\\d{3}) (\\d+|-)( \"([^\"]*)\" \"([^\"]*)\")?$"

  private def grp(c: Column, i: Int): Column = {
    val v = regexp_extract(c, Pattern, i)
    when(v === "", lit(null).cast("string")).otherwise(v)
  }

  /** (line) -> (matched, ip, ident, user, ts_raw, method, path, proto,
    * status, bytes, referer, user_agent). Unmatched lines keep nulls. */
  def parse(logs: DataFrame): DataFrame = {
    val m = col("line").rlike(Pattern)
    logs.select(
      m.as("matched"),
      when(m, grp(col("line"), 1)).as("ip"),
      when(m, grp(col("line"), 2)).as("ident"),
      when(m, grp(col("line"), 3)).as("user"),
      when(m, grp(col("line"), 4)).as("ts_raw"),
      when(m, grp(col("line"), 5)).as("method"),
      when(m, grp(col("line"), 6)).as("path"),
      when(m, grp(col("line"), 7)).as("proto"),
      when(m, grp(col("line"), 8).cast("int")).as("status"),
      when(m, when(grp(col("line"), 9) === "-", lit(0L))
        .otherwise(grp(col("line"), 9).cast("long"))).as("bytes"),
      when(m, grp(col("line"), 11)).as("referer"),
      when(m, grp(col("line"), 12)).as("user_agent"))
  }
}
