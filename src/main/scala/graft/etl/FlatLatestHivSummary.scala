package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.LatestRow

/** Stage 3: one latest summary row per patient — the Spark rebuild of
  * `generate_latest_hiv_summary()` (flat_latest_hiv_summary_v1.0.sql:3-41).
  *
  * The reference's `GROUP BY person_id ORDER BY encounter_datetime desc`
  * with bare columns (:22-36) relies on MySQL's ONLY_FULL_GROUP_BY-off
  * nondeterminism: bare columns come from an arbitrary row while MAX
  * aggregates are true maxima — and the plain INSERT (no key, no truncate)
  * duplicates rows on re-run (§7.4.8). The rebuild implements the intent:
  * bare columns from the deterministic latest row (encounter_datetime
  * desc, encounter_id desc tie-break) joined with the true MAX aggregates,
  * idempotent by construction (SURVEY §2.6 W2).
  */
object FlatLatestHivSummary {

  def build(flatVisitSummary: DataFrame): DataFrame = {
    val latest = LatestRow(
      flatVisitSummary, Seq("person_id"), Seq(col("encounter_datetime"), col("encounter_id")))
      .select(
        col("person_id"), col("uuid"), col("encounter_type"), col("location_id"),
        col("weight"), col("height"), col("who_stage"), col("tb_status"))
    val aggs = flatVisitSummary.groupBy("person_id").agg(
      max("encounter_datetime").as("encounter_datetime"),
      max("enrollment_date").as("enrollment_date"),
      max("hiv_start_date").as("hiv_start_date"),
      max("currentregmen").as("current_regimen"),
      max("arvs_adherence").as("arvs_adherence"))
    latest.join(aggs, Seq("person_id"))
      .select("person_id", "uuid", "encounter_datetime", "encounter_type", "location_id",
        "enrollment_date", "hiv_start_date", "weight", "height", "current_regimen",
        "arvs_adherence", "who_stage", "tb_status")
  }
}
