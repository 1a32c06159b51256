package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL-compatibility column helpers re-expressed as pure Catalyst
  * compositions (codegen-friendly, no UDFs).
  *
  * The reference system (kemri-ucsf/MRSBoraETL) is MySQL 5.x
  * stored-procedure SQL; these helpers reproduce the constructs it leans
  * on — ordered GROUP_CONCAT (flat_obs_v1.0.sql:123-135), the
  * SUBSTRING_INDEX/LOCATE value-extraction surgery
  * (flat_visit_summary_v1.0.sql:202), and regexp decode tables
  * (flat_visit_summary_v1.0.sql:211-523) — on Spark built-ins so Catalyst
  * can constant-fold / prune / whole-stage-codegen through them.
  */
object MysqlFunctions {

  /** MySQL `GROUP_CONCAT(expr ORDER BY k1, k2 SEPARATOR sep)`.
    *
    * `collect_list` is order-nondeterministic under parallel aggregation,
    * so the ordering is enforced by collecting `struct(orderKeys..., value)`
    * and `array_sort`-ing (struct ordering = lexicographic by field), then
    * projecting the value field. NULL values are skipped, matching MySQL
    * GROUP_CONCAT semantics (reference relies on this: the 7-way typed
    * value CASE in flat_obs_v1.0.sql:124-132 yields NULL only for rows
    * that must not contribute an entry).
    *
    * Unlike MySQL there is no `group_concat_max_len` truncation
    * (flat_obs_v1.0.sql:25 sets 100000); the unbounded form is strictly
    * more correct. Use [[groupConcatTruncated]] for byte-fidelity.
    *
    * NOTE on null order keys: MySQL `ORDER BY` places NULLs first
    * ascending; Spark's struct ordering does the same (null field sorts
    * before any value), so no extra handling is needed.
    */
  def groupConcat(
      value: Column,
      orderKeys: Seq[Column],
      sep: String = " ## ",
      distinct: Boolean = false): Column = {
    val keyed = struct(
      orderKeys.zipWithIndex.map { case (k, i) => k.as(s"k$i") } :+ value.as("v"): _*)
    // collect only rows whose rendered value is non-null (GROUP_CONCAT skips NULL)
    val collected = collect_list(when(value.isNotNull, keyed))
    val sorted = transform(array_sort(collected), x => x.getField("v"))
    // MySQL GROUP_CONCAT(DISTINCT ... ORDER BY ...): DISTINCT applies to the
    // rendered string; array already sorted so array_distinct keeps order.
    val deduped = if (distinct) array_distinct(sorted) else sorted
    // MySQL returns NULL (not '') when every input value is NULL.
    when(size(deduped) > 0, array_join(deduped, sep))
  }

  /** Faithful-mode GROUP_CONCAT with MySQL's `group_concat_max_len`
    * truncation (default raised to 100000 by the reference,
    * flat_obs_v1.0.sql:25). Delegates to [[GroupConcatAgg]], whose
    * truncation counts UTF-8 BYTES like MySQL (a `substring` would count
    * UTF-16 code units and overshoot on multibyte text).
    */
  def groupConcatTruncated(
      value: Column,
      orderKeys: Seq[Column],
      sep: String = " ## ",
      maxLen: Int = 100000): Column =
    GroupConcatAgg(value, orderKeys, sep, maxLen, distinct = false)

  /** MySQL `IF(cond, a, b)`. */
  def mysqlIf(cond: Column, a: Column, b: Column): Column =
    when(cond, a).otherwise(b)

  /** The reference's P11 value-extraction surgery
    * (flat_visit_summary_v1.0.sql:202):
    * `replace(replace(substring_index(substring(obs, locate(key, obs)), sep, 1), key, ''), '!!', '')`
    * — pull the first entry for `key` (e.g. `"!!6743="`) out of an encoded
    * obs map and strip the key and boundary tokens. The reference's
    * count-driven variant returns the LAST occurrence; [[ObsMap.lastValueFor]]
    * reproduces that. This helper is the simple first-occurrence form used
    * when a concept appears at most once per group.
    *
    * Returns an empty string when the key is absent (locate=0 makes
    * substring start at 0 which MySQL treats as the whole string; we guard
    * explicitly and return null for absent keys instead — deviation
    * documented in SURVEY §7.4).
    */
  def extractMapEntry(obs: Column, key: String, sep: String = " ## "): Column = {
    val pos = locate(key, obs)
    val tail = obs.substr(pos, length(obs))
    val entry = substring_index(tail, sep, 1)
    when(pos > 0,
      regexp_replace(regexp_replace(entry, java.util.regex.Pattern.quote(key), ""), "!!", ""))
  }

  /** Decode table: map a raw coded value (already extracted from the obs
    * map) through a literal code→label lookup, with optional default.
    * Replaces the reference's ~320 lines of searched CASE over regexps
    * (flat_visit_summary_v1.0.sql:211-523) with a declarative table.
    */
  def decodeByTable(
      raw: Column,
      table: Seq[(String, String)],
      default: Column = lit(null)): Column =
    table.foldRight(default) { case ((code, label), acc) =>
      when(raw === lit(code), lit(label)).otherwise(acc)
    }

  /** Decode directly against the encoded obs-map string — the faithful
    * form of the reference's `obs regexp '!!1836=(1065)!!'` decode arms
    * (flat_visit_summary_v1.0.sql:211-219). `table` maps conceptValue
    * patterns (e.g. "1836=1065") to labels; first match wins, like a
    * searched CASE.
    *
    * The reference's regexp patterns are literal strings (the parens are
    * no-op groups), so each arm evaluates as `contains` — a codegen'd
    * UTF8String.contains scan, not a java.util.regex machine. With ~150
    * decode arms per visit-summary row this is the difference between a
    * string scan and 150 regex executions per row (together with the
    * regexp_extract_all extraction rewrite: 34 s → 12 s on the q56 stage
    * at sf0.1).
    */
  def regexpDecode(
      obs: Column,
      table: Seq[(String, String)],
      default: Column = lit(null)): Column = {
    val arms = table.foldRight(default) { case ((kv, label), acc) =>
      when(obs.contains(s"!!$kv!!"), lit(label)).otherwise(acc)
    }
    // Single-concept tables (all of the reference's are) get a presence
    // guard: one "!!<concept>=" scan short-circuits the whole arm chain
    // when the concept is absent from the row — the common case on real
    // encounters, where a 40-arm regimen table would otherwise scan the
    // map 40 times to conclude nothing matched.
    val concepts = table.map(_._1.takeWhile(_ != '=')).distinct
    if (concepts.sizeIs == 1)
      when(obs.contains(s"!!${concepts.head}="), arms).otherwise(default)
    else arms
  }

  /** MySQL `TIMESTAMPDIFF(SECOND, a, b)` (run metrics,
    * flat_obs_v1.0.sql:345). */
  def timestampDiffSeconds(a: Column, b: Column): Column =
    unix_timestamp(b) - unix_timestamp(a)
}
