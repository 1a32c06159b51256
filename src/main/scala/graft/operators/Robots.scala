package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and crawl-policy evaluation (RFC 9309 subset) —
  * the gate a web-crawl ingestion pipeline applies before a URL is
  * fetched at all, evaluated here at corpus scale: one rule table
  * joined against billions of (host, agent, path) requests.
  *
  * Supported grammar (the published REP standard, RFC 9309):
  *  - groups: one or more consecutive `User-agent:` lines followed by
  *    `Allow:` / `Disallow:` rules; rules before any group are ignored;
  *    a later `User-agent:` line (not directly preceded by another)
  *    starts a new group;
  *  - `#` comments, blank lines, and unknown directives (`Sitemap:`,
  *    `Crawl-delay:`) are skipped;
  *  - agent product tokens match case-insensitively; a request uses the
  *    exact-matching groups when any exist, else the `*` groups;
  *  - patterns anchor at the path start, `*` matches any octet
  *    sequence, a trailing `$` anchors the end; the longest matching
  *    pattern wins and, on a length tie, Allow beats Disallow (the
  *    least-restrictive RFC rule); an empty `Disallow:` value means
  *    "no restriction" and contributes no rule; a request matching no
  *    rule (or finding no applicable group) is allowed.
  *
  * Everything is relational — parse is explode + window over line
  * numbers, evaluation is a join whose match predicate is the pattern
  * compiled to a SQL `LIKE ... ESCAPE` (so the same semantics replay on
  * any ANSI engine, which is how the oracle checks it). The rules side
  * of the join is one row per (host, group, agent, rule) — tiny next to
  * the request stream — so at scale Spark broadcasts it and the
  * evaluation is a map-side join with no shuffle of the request stream.
  */
object Robots {

  /** (host, content) -> (host, group_id, agent, rule_type, pattern).
    * Groups with no usable rules (e.g. only empty `Disallow:` values)
    * emit nothing here but still claim their agents — use
    * [[parseAgents]] for group-membership questions, because an
    * exact-agent group that allows everything must still pre-empt the
    * `*` group. */
  def parse(robots: DataFrame): DataFrame = {
    val lines = robots
      .select(col("host"), posexplode(split(col("content"), "\n")).as(Seq("li", "line")))
      .withColumn("directive",
        lower(regexp_extract(col("line"), "^\\s*([A-Za-z-]+)\\s*:", 1)))
      .withColumn("value",
        trim(regexp_extract(col("line"), "^\\s*[A-Za-z-]+\\s*:\\s*([^#]*)", 1)))
      .filter(col("directive").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy("host").orderBy("li")
    val grouped = lines
      .withColumn("ua_start",
        (col("directive") === "user-agent" &&
          (lag(col("directive"), 1).over(w).isNull ||
            lag(col("directive"), 1).over(w) =!= "user-agent")).cast("int"))
      .withColumn("group_id", sum(col("ua_start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.filter(col("directive") === "user-agent")
      .select(col("host"), col("group_id"), lower(col("value")).as("agent"))
    val rules = grouped
      .filter(col("directive").isin("allow", "disallow") && col("value") =!= "")
      .select(col("host"), col("group_id"),
        col("directive").as("rule_type"), col("value").as("pattern"))
    // rules before any User-agent line (group_id joins nothing) drop here
    rules.join(agents, Seq("host", "group_id"))
      .select("host", "group_id", "agent", "rule_type", "pattern")
  }

  /** (host, content) -> (host, agent): every agent claimed by any
    * group, rule-bearing or not. */
  def parseAgents(robots: DataFrame): DataFrame =
    robots
      .select(col("host"), explode(split(col("content"), "\n")).as("line"))
      .filter(lower(regexp_extract(col("line"), "^\\s*([A-Za-z-]+)\\s*:", 1))
        === "user-agent")
      .select(col("host"),
        lower(trim(regexp_extract(col("line"),
          "^\\s*[A-Za-z-]+\\s*:\\s*([^#]*)", 1))).as("agent"))
      .distinct()

  /** The pattern compiled to a `LIKE` pattern (escape char `\`):
    * `*` -> `%`, literal `%`/`_`/`\` escaped, trailing `$` anchors by
    * omitting the implicit trailing `%`. */
  def likePattern(pattern: Column): Column = {
    val esc = regexp_replace(
      regexp_replace(
        regexp_replace(pattern, "\\\\", "\\\\\\\\"),
        "%", "\\\\%"),
      "_", "\\\\_")
    val star = regexp_replace(esc, "\\*", "%")
    when(pattern.endsWith("$"), star.substr(lit(1), length(star) - 1))
      .otherwise(concat(star, lit("%")))
  }

  /** Evaluate requests (host, agent, path) against [[parse]]d rules,
    * with [[parseAgents]] deciding exact-group pre-emption.
    * Output: (host, agent, path, allowed, rule_len, rule_type). */
  def evaluate(rules: DataFrame, agents: DataFrame, requests: DataFrame): DataFrame = {
    val r = rules
      .withColumn("like_pat", likePattern(col("pattern")))
      .select(col("host"), col("agent").as("rule_agent"),
        col("rule_type"), col("pattern"), col("like_pat"))

    // exact-agent groups pre-empt the * groups entirely (RFC: the most
    // specific matching group is used, not the union) — including
    // rule-less exact groups, which allow everything
    val reqAgents = requests.select("host", "agent").distinct()
    val hasExact = reqAgents.join(agents,
        reqAgents("host") === agents("host") &&
          lower(reqAgents("agent")) === agents("agent"), "left_semi")
      .withColumn("has_exact", lit(true))
    val req = requests.join(hasExact, Seq("host", "agent"), "left")
      .withColumn("eff_agent",
        when(col("has_exact"), lower(col("agent"))).otherwise(lit("*")))

    val matched = req.join(broadcast(r),
        req("host") === r("host") && col("eff_agent") === r("rule_agent") &&
          expr("path LIKE like_pat ESCAPE '\\\\'"),
        "left")
      .select(req("host"), col("agent"), col("path"),
        r("rule_type").as("m_type"), r("pattern").as("m_pattern"))
    val w = Window.partitionBy("host", "agent", "path")
      .orderBy(length(col("m_pattern")).desc,
        (col("m_type") === "allow").desc, col("m_pattern"))
    matched
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("host"), col("agent"), col("path"),
        (col("m_type").isNull || col("m_type") === "allow").as("allowed"),
        coalesce(length(col("m_pattern")), lit(0)).as("rule_len"),
        coalesce(col("m_type"), lit("none")).as("rule_type"))
  }
}
