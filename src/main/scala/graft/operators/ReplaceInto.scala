package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MySQL `REPLACE INTO` (delete-then-insert on primary key) re-expressed as
  * a distributed merge: the reference upserts aggregated groups keyed by
  * `encounter_id` (flat_obs_v1.0.sql:115,157,210,294;
  * flat_orders_v1.0.sql:57,76; flat_lab_obs_v1.0.sql:102).
  *
  * Semantics to preserve (SURVEY §2.4 K2, §7.3):
  *  - rows in `incoming` replace same-key rows in `existing`;
  *  - within `incoming`, the LAST row per key wins (MySQL REPLACE applied
  *    sequentially) — callers supply `lastWins` ordering columns whose
  *    descending order identifies "last";
  *  - `existing` rows with no incoming key survive unchanged.
  *
  * Scale notes: the anti-join against the (small) incoming key set is
  * broadcast by Catalyst/AQE when incoming is a delta batch — the common
  * incremental case. The within-batch dedup shuffles only `incoming`.
  */
object ReplaceInto {

  def apply(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      lastWins: Seq[Column] = Nil): DataFrame = {
    val deduped =
      if (lastWins.isEmpty) incoming.dropDuplicates(keys)
      else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(lastWins.map(_.desc): _*)
        incoming
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn")
      }
    val incomingKeys = deduped.select(keys.map(col): _*).distinct()
    existing
      .join(incomingKeys, keys, "left_anti")
      .unionByName(deduped.select(existing.columns.toIndexedSeq.map(col): _*))
  }

  /** `DELETE t FROM t JOIN keys` (SURVEY §2.4 K4 / §2.3 J6): keep all rows
    * whose key is NOT in `deleteKeys`.
    */
  def deleteMatching(target: DataFrame, deleteKeys: DataFrame, keys: Seq[String]): DataFrame =
    target.join(deleteKeys.select(keys.map(col): _*).distinct(), keys, "left_anti")
}
