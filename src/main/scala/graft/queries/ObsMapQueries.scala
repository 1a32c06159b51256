package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables.load
import graft.functions.{MysqlFunctions, ObsMap}

/** Coverage for the reference's signature obs-map encoding (SURVEY §1.1.3,
  * §2.5 A1-A3, §2.2 P11, §2.8 string surgery) exercised on the lineitem
  * fixture: per order, a map `partkey → quantity` rendered exactly like the
  * reference's `"!!<concept>=<value>!! ## …"` GROUP_CONCAT form, then
  * decoded back with both the clean regexp path and the faithful
  * SUBSTRING_INDEX/LOCATE surgery.
  */
object ObsMapQueries {

  val all: Seq[OpQuery] = Seq(

    // A1: ordered GROUP_CONCAT building the encoded map
    // (flat_obs_v1.0.sql:123-135; ORDER BY concept, value :133).
    OpQuery.sql(
      "q12_group_concat_obsmap",
      """SELECT l_orderkey,
        |  string_agg('!!' || l_partkey || '=' || CAST(l_quantity AS VARCHAR) || '!!',
        |             ' ## ' ORDER BY l_partkey, l_quantity, l_linenumber) AS obs,
        |  string_agg(CAST(CAST(l_shipdate AS DATE) AS VARCHAR),
        |             ' ## ' ORDER BY l_partkey, l_quantity, l_linenumber) AS obs_datetimes,
        |  count(*) AS n_obs
        |FROM lineitem GROUP BY l_orderkey""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(
            MysqlFunctions.groupConcat(
              ObsMap.renderEntry(col("l_partkey"), col("l_quantity").cast("string")),
              Seq(col("l_partkey"), col("l_quantity"), col("l_linenumber"))).as("obs"),
            MysqlFunctions.groupConcat(
              to_date(col("l_shipdate")).cast("string"),
              Seq(col("l_partkey"), col("l_quantity"), col("l_linenumber"))).as("obs_datetimes"),
            count(lit(1)).as("n_obs"))
    },

    // P11 (clean mode): regexp_extract of one concept's value from the map.
    OpQuery.sql(
      "q23_obsmap_extract_regexp",
      """WITH m AS (
        |  SELECT l_orderkey,
        |    string_agg('!!' || l_partkey || '=' || CAST(l_quantity AS VARCHAR) || '!!',
        |               ' ## ' ORDER BY l_partkey, l_quantity, l_linenumber) AS obs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey, regexp_extract(obs, '!!1=([^!]*)!!', 1) AS part1_qty
        |FROM m WHERE obs LIKE '%!!1=%'""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(MysqlFunctions.groupConcat(
            ObsMap.renderEntry(col("l_partkey"), col("l_quantity").cast("string")),
            Seq(col("l_partkey"), col("l_quantity"), col("l_linenumber"))).as("obs"))
          .filter(col("obs").contains("!!1="))
          .select(col("l_orderkey"), regexp_extract(col("obs"), "!!1=([^!]*)!!", 1).as("part1_qty"))
    },

    // P11 (faithful mode): the reference's SUBSTRING_INDEX/LOCATE/REPLACE
    // surgery (flat_visit_summary_v1.0.sql:202) for the same extraction.
    OpQuery.sql(
      "q24_obsmap_extract_surgery",
      """WITH m AS (
        |  SELECT l_orderkey,
        |    string_agg('!!' || l_partkey || '=' || CAST(l_quantity AS VARCHAR) || '!!',
        |               ' ## ' ORDER BY l_partkey, l_quantity, l_linenumber) AS obs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  replace(replace(split_part(substr(obs, strpos(obs, '!!2=')), ' ## ', 1), '!!2=', ''), '!!', '') AS part2_qty
        |FROM m WHERE strpos(obs, '!!2=') > 0""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(MysqlFunctions.groupConcat(
            ObsMap.renderEntry(col("l_partkey"), col("l_quantity").cast("string")),
            Seq(col("l_partkey"), col("l_quantity"), col("l_linenumber"))).as("obs"))
          .filter(locate("!!2=", col("obs")) > 0)
          .select(col("l_orderkey"),
            MysqlFunctions.extractMapEntry(col("obs"), "!!2=").as("part2_qty"))
    },

    // P10: regexp decode table over the encoded map — code → label CASE
    // chain (flat_visit_summary_v1.0.sql:211-219 pregnancy decode shape).
    OpQuery.sql(
      "q25_obsmap_regexp_decode",
      """WITH m AS (
        |  SELECT l_orderkey,
        |    string_agg('!!' || l_partkey || '=' || CAST(l_quantity AS VARCHAR) || '!!',
        |               ' ## ' ORDER BY l_partkey, l_quantity, l_linenumber) AS obs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CASE WHEN obs LIKE '%!!1=50.0!!%' THEN 'FULL'
        |       WHEN obs LIKE '%!!1=1.0!!%' THEN 'SINGLE'
        |       WHEN obs LIKE '%!!1=%' THEN 'OTHER'
        |       ELSE NULL END AS part1_band
        |FROM m""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(MysqlFunctions.groupConcat(
            ObsMap.renderEntry(col("l_partkey"), col("l_quantity").cast("string")),
            Seq(col("l_partkey"), col("l_quantity"), col("l_linenumber"))).as("obs"))
          .select(col("l_orderkey"),
            MysqlFunctions.regexpDecode(col("obs"),
              Seq("1=50.0" -> "FULL", "1=1.0" -> "SINGLE"),
              when(col("obs").contains("!!1="), lit("OTHER"))).as("part1_band"))
    },

    // §2.8 scalars: date(), timestampdiff, IF — the run-metrics functions.
    OpQuery.sql(
      "q26_mysql_scalars",
      """SELECT event_id, CAST(ts AS DATE) AS day,
        |  CAST(date_diff('second', CAST(CAST(ts AS DATE) AS TIMESTAMP), ts) AS BIGINT) AS secs_into_day,
        |  CASE WHEN value > 250 THEN 'hi' ELSE 'lo' END AS value_band
        |FROM events""".stripMargin) {
      (s, dir) =>
        load(s, dir, "events").select(
          col("event_id"), to_date(col("ts")).as("day"),
          MysqlFunctions.timestampDiffSeconds(
            to_date(col("ts")).cast("timestamp"), col("ts")).as("secs_into_day"),
          MysqlFunctions.mysqlIf(col("value") > 250, lit("hi"), lit("lo")).as("value_band"))
    },

    // §2.7: UNION ALL with explicit null/literal padding — the clinical ∪
    // lab staging append (flat_visit_summary_v1.0.sql:157-173).
    OpQuery.sql(
      "q27_union_all_padded",
      """SELECT o_orderkey AS row_id, o_orderstatus AS status, CAST(NULL AS DOUBLE) AS qty,
        |       1 AS is_clinical, 1 AS sort_index
        |FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT l_orderkey, NULL, l_quantity, 0, 2
        |FROM lineitem WHERE l_quantity > 49""".stripMargin) {
      (s, dir) =>
        val a = load(s, dir, "orders").filter(col("o_orderstatus") === "F").select(
          col("o_orderkey").as("row_id"), col("o_orderstatus").as("status"),
          lit(null).cast("double").as("qty"), lit(1).as("is_clinical"), lit(1).as("sort_index"))
        val b = load(s, dir, "lineitem").filter(col("l_quantity") > 49).select(
          col("l_orderkey").as("row_id"), lit(null).cast("string").as("status"),
          col("l_quantity").as("qty"), lit(0).as("is_clinical"), lit(2).as("sort_index"))
        a.unionByName(b)
    }
  )
}
