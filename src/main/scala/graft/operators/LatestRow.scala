package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-row-per-group (SURVEY §2.6 W2).
  *
  * The reference's `flat_latest_hiv_summary` uses MySQL's
  * ONLY_FULL_GROUP_BY-off `GROUP BY person_id ORDER BY encounter_datetime
  * desc` pulling non-aggregated columns
  * (flat_latest_hiv_summary_v1.0.sql:22-36) — *intent*: one latest summary
  * row per patient; *actual MySQL semantics*: an arbitrary row for the bare
  * columns plus true MAX for the aggregated ones (a "Frankenstein row",
  * SURVEY §7.4.8). The rebuild implements the intent deterministically:
  * `row_number()` over a descending window, with caller-supplied
  * tie-breakers for full determinism.
  */
object LatestRow {

  /** Keep the latest row per `keys`, ordered by `orderBy` descending
    * (append further tie-break columns for determinism).
    */
  def apply(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
