package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's signature data structure: a per-group map
  * `concept_id → rendered value` serialized as
  * `"!!<concept>=<value>!! ## !!<concept>=<value>!! ## …"` with boundary
  * token `"!!"` (flat_obs_v1.0.sql:32) and separator `" ## "`
  * (flat_obs_v1.0.sql:134; flat_visit_summary_v1.0.sql:13).
  *
  * Internally the engine carries the typed form
  * `array<struct<concept:int, value:string>>` (a concept can repeat —
  * e.g. multiple 1271 TESTS-ORDERED entries per group,
  * flat_lab_obs_v1.0.sql:123) and converts to/from the string form at the
  * edges so outputs byte-match the reference encoding.
  */
object ObsMap {
  val Boundary = "!!"
  val Sep = " ## "

  val entryType: DataType =
    ArrayType(StructType(Seq(
      StructField("concept", IntegerType),
      StructField("value", StringType))))

  /** Render one map entry `!!<concept>=<value>!!` (flat_obs_v1.0.sql:125-131). */
  def renderEntry(concept: Column, value: Column): Column =
    concat(lit(Boundary), concept, lit("="), value, lit(Boundary))

  /** The 7-way typed-value coalesce of the EAV model
    * (flat_obs_v1.0.sql:124-132): exactly one of the `value_*` columns is
    * set per obs row; render it as a string, dates via `date()` i.e.
    * date-only (flat_obs_v1.0.sql:127).
    */
  /** MySQL renders DOUBLE in plain decimal notation without trailing
    * zeros (24.0 → "24", 120.50 → "120.5", 1e7 → "10000000"). A direct
    * double→string cast diverges at ±1e7 (Spark switches to scientific
    * notation where MySQL and DuckDB print plain digits; clinically real
    * for viral loads). Render through DECIMAL(30,10): plain notation
    * always, a dot always present (so the trailing-zero strip can never
    * eat integer zeros), deterministic across engines.
    */
  private def mysqlNum(c: Column): Column =
    regexp_replace(
      regexp_replace(c.cast("decimal(30,10)").cast("string"), "0+$", ""),
      "\\.$", "")

  def renderTypedValue(
      valueCoded: Column,
      valueNumeric: Column,
      valueDatetime: Column,
      valueBoolean: Column,
      valueText: Column,
      valueDrug: Column,
      valueModifier: Column): Column =
    when(valueCoded.isNotNull, valueCoded.cast(StringType))
      .when(valueNumeric.isNotNull, mysqlNum(valueNumeric))
      .when(valueDatetime.isNotNull, to_date(valueDatetime).cast(StringType))
      .when(valueBoolean.isNotNull, valueBoolean.cast(IntegerType).cast(StringType))
      .when(valueText.isNotNull, valueText)
      .when(valueDrug.isNotNull, valueDrug.cast(StringType))
      .when(valueModifier.isNotNull, valueModifier)

  /** Aggregate: encode a group's (concept, value) rows into the map
    * string, ordered by `(concept_id, value_coded)` exactly as the
    * reference's `GROUP_CONCAT ... ORDER BY o.concept_id, value_coded`
    * (flat_obs_v1.0.sql:133). Extra tie-break on the rendered string for
    * full determinism (SURVEY §7.3 — the reference leaves ties unordered).
    */
  def encode(
      concept: Column,
      renderedValue: Column,
      valueCodedOrderKey: Column,
      distinct: Boolean = false): Column =
    MysqlFunctions.groupConcat(
      renderEntry(concept, renderedValue),
      Seq(concept, valueCodedOrderKey, renderedValue),
      Sep,
      distinct)

  /** Decode an encoded map string back to
    * `array<struct<concept:int, value:string>>`. Values may themselves
    * contain `=` (free-text obs), so split on the first `=` only.
    * (`str_to_map` can't express this; SURVEY §2.10.)
    */
  def decode(obs: Column): Column =
    transform(
      split(obs, java.util.regex.Pattern.quote(Sep)),
      e => {
        // Entries are "!!<concept>=<value>!!"; parse with substring math
        // (HOF lambdas evaluate interpreted, so per-entry regex here costs
        // three regex machines per entry per extraction call — measured on
        // the visit-summary decode projection). substring_index splits on
        // the FIRST '=' so free-text values containing '=' stay intact.
        val inner = e.substr(lit(3), length(e) - 4)
        val concept = substring_index(inner, "=", 1)
        struct(
          concept.cast(IntegerType).as("concept"),
          inner.substr(length(concept) + 2, length(inner)).as("value"))
      })

  /** All values for `concept` in an encoded map, in map order. */
  def valuesFor(obs: Column, concept: Int): Column =
    transform(
      filter(decode(obs), e => e.getField("concept") === lit(concept)),
      e => e.getField("value"))

  /** First value for `concept`, or null (try_element_at: ANSI-safe on
    * empty arrays). */
  def valueFor(obs: Column, concept: Int): Column =
    try_element_at(valuesFor(obs, concept), lit(1))

  /** LAST value for `concept`, or null — matches the reference's
    * count-driven `substring_index` extraction which lands on the last
    * occurrence when a concept repeats (SURVEY §2.2 P11).
    */
  def lastValueFor(obs: Column, concept: Int): Column =
    try_element_at(valuesFor(obs, concept), lit(-1))

  /** Does the map contain `concept=code`? The faithful decode predicate
    * `obs regexp '!!<concept>=(<code>)!!'` — the parens in the reference
    * patterns are regex groups, no-ops for matching
    * (flat_visit_summary_v1.0.sql:212; SURVEY §2.8).
    */
  def containsEntry(obs: Column, concept: Int, code: String): Column =
    obs.contains(s"$Boundary$concept=$code$Boundary")
}
