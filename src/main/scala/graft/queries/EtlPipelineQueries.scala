package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables.load
import graft.etl.{FlatObs, FlatLatestHivSummary, Schemas}

/** End-to-end checks of the ETL stages themselves, driven through the real
  * stage code on an EAV mapping of the TPC-H fixtures:
  * lineitem rows → obs (concept = partkey, value_numeric = quantity),
  * orders → encounters, customer → persons. The DuckDB oracle replays the
  * stage semantics in SQL, so the full pipeline — typed-value rendering,
  * fake visit ids, map ordering, canonical schema — is hash-checked, not
  * just the individual operators.
  */
object EtlPipelineQueries {

  /** Map fixtures → OpenMRS-shaped sources (deterministic, no RNG). */
  private def eavSources(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val li = load(s, dir, "lineitem")
    val o = load(s, dir, "orders")
    val c = load(s, dir, "customer")
    val obs = li.join(o.select(col("o_orderkey"), col("o_custkey")),
      col("l_orderkey") === col("o_orderkey"))
      .select(
        (col("l_orderkey") * 8 + col("l_linenumber")).cast("int").as("obs_id"),
        col("o_custkey").cast("int").as("person_id"),
        col("l_orderkey").cast("int").as("encounter_id"),
        col("l_partkey").cast("int").as("concept_id"),
        col("l_shipdate").as("obs_datetime"),
        lit(null).cast("int").as("value_coded"),
        col("l_quantity").as("value_numeric"),
        lit(null).cast("timestamp").as("value_datetime"),
        lit(null).cast("int").as("value_boolean"),
        lit(null).cast("string").as("value_text"),
        lit(null).cast("int").as("value_drug"),
        lit(null).cast("string").as("value_modifier"),
        col("l_shipdate").as("date_created"),
        lit(0).as("voided"),
        lit(null).cast("timestamp").as("date_voided"))
    val encounter = o.select(
      col("o_orderkey").cast("int").as("encounter_id"),
      col("o_custkey").cast("int").as("patient_id"),
      lit(null).cast("int").as("visit_id"), // all fake → deterministic minting
      col("o_orderdate").as("encounter_datetime"),
      when(col("o_orderstatus") === "F", 21).when(col("o_orderstatus") === "O", 22)
        .otherwise(35).as("encounter_type"),
      lit(1).as("location_id"),
      col("o_orderdate").as("date_created"),
      lit(null).cast("timestamp").as("date_changed"),
      lit(0).as("voided"))
    val person = c.select(
      col("c_custkey").cast("int").as("person_id"),
      col("c_name").as("uuid"),
      (col("c_custkey") % 97 === 0).cast("int").as("voided"))
    (obs, encounter, person)
  }

  val all: Seq[OpQuery] = Seq(

    // The full flat_obs stage: grouping, 7-way render (numeric arm), map
    // ordering, fake visit ids, voided-person purge, canonical schema.
    OpQuery.sql(
      "q43_flat_obs_stage",
      """WITH obs AS (
        |  SELECT CAST(l_orderkey*8+l_linenumber AS INT) obs_id, CAST(o_custkey AS INT) person_id,
        |         CAST(l_orderkey AS INT) encounter_id, CAST(l_partkey AS INT) concept_id,
        |         l_shipdate obs_datetime, l_quantity value_numeric, l_shipdate date_created
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_orderkey > 0),  -- the stage keeps encounter_id > 0 only (flat_obs_v1.0.sql:204)
        |enc AS (SELECT CAST(o_orderkey AS INT) encounter_id, o_orderdate,
        |               CASE WHEN o_orderstatus='F' THEN 21 WHEN o_orderstatus='O' THEN 22 ELSE 35 END etype
        |        FROM orders),
        |flat AS (
        |  SELECT o.encounter_id,
        |    max(o.person_id) AS person_id,
        |    CAST(10000000 + o.encounter_id AS INT) AS visit_id,
        |    max(e.o_orderdate) AS encounter_datetime,
        |    max(e.etype) AS encounter_type,
        |    1 AS location_id,
        |    string_agg('!!' || concept_id || '=' ||
        |               regexp_replace(CAST(value_numeric AS VARCHAR), '\.0$', '') || '!!',
        |               ' ## ' ORDER BY concept_id,
        |                        regexp_replace(CAST(value_numeric AS VARCHAR), '\.0$', '')) AS obs,
        |    string_agg('!!' || concept_id || '=' || CAST(CAST(obs_datetime AS DATE) AS VARCHAR) || '!!',
        |               ' ## ' ORDER BY concept_id,
        |                        regexp_replace(CAST(value_numeric AS VARCHAR), '\.0$', ''),
        |                        '!!' || concept_id || '=' || CAST(CAST(obs_datetime AS DATE) AS VARCHAR) || '!!') AS obs_datetimes,
        |    max(o.date_created) AS max_date_created
        |  FROM obs o JOIN enc e USING (encounter_id)
        |  GROUP BY o.encounter_id)
        |SELECT * FROM flat WHERE person_id % 97 <> 0""".stripMargin) {
      (s, dir) =>
        val (obs, encounter, person) = eavSources(s, dir)
        FlatObs.build(obs, encounter, person)
    },

    // The latest-row stage (W2 fix) through the real stage code.
    OpQuery.sql(
      "q44_latest_summary_stage",
      """WITH vs AS (
        |  SELECT CAST(o_custkey AS INT) person_id, concat('c', o_custkey) uuid,
        |         o_orderdate encounter_datetime,
        |         CAST(o_orderkey AS INT) encounter_id,
        |         CASE WHEN o_orderstatus='F' THEN 21 ELSE 22 END encounter_type,
        |         1 location_id, CAST(NULL AS TIMESTAMP) enrollment_date,
        |         CAST(NULL AS TIMESTAMP) hiv_start_date,
        |         CAST(o_totalprice AS VARCHAR) weight, '170' height,
        |         o_orderpriority currentregmen, 'Good' arvs_adherence,
        |         '1' who_stage, CAST(NULL AS VARCHAR) tb_status
        |  FROM orders),
        |latest AS (
        |  SELECT person_id, uuid, encounter_type, location_id, weight, height,
        |         who_stage, tb_status
        |  FROM vs QUALIFY row_number() OVER
        |    (PARTITION BY person_id ORDER BY encounter_datetime DESC, encounter_id DESC) = 1),
        |aggs AS (
        |  SELECT person_id, max(encounter_datetime) encounter_datetime,
        |         max(enrollment_date) enrollment_date, max(hiv_start_date) hiv_start_date,
        |         max(currentregmen) current_regimen, max(arvs_adherence) arvs_adherence
        |  FROM vs GROUP BY person_id)
        |SELECT person_id, uuid, encounter_datetime, encounter_type, location_id,
        |       enrollment_date, hiv_start_date, weight, height, current_regimen,
        |       arvs_adherence, who_stage, tb_status
        |FROM latest JOIN aggs USING (person_id)""".stripMargin) {
      (s, dir) =>
        val vs = load(s, dir, "orders").select(
          col("o_custkey").cast("int").as("person_id"),
          concat(lit("c"), col("o_custkey")).as("uuid"),
          col("o_orderdate").as("encounter_datetime"),
          col("o_orderkey").cast("int").as("encounter_id"),
          when(col("o_orderstatus") === "F", 21).otherwise(22).as("encounter_type"),
          lit(1).as("location_id"),
          lit(null).cast("timestamp").as("enrollment_date"),
          lit(null).cast("timestamp").as("hiv_start_date"),
          col("o_totalprice").cast("string").as("weight"),
          lit("170").as("height"),
          col("o_orderpriority").as("currentregmen"),
          lit("Good").as("arvs_adherence"),
          lit("1").as("who_stage"),
          lit(null).cast("string").as("tb_status"))
        FlatLatestHivSummary.build(vs)
    }
  )
}
