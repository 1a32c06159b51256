package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the payload of
  * the most recent right row with `ts <= left.ts` for the same key — the
  * "latest prior reading" pattern (latest lab result before a visit,
  * last known price before a trade, most recent profile before an event).
  *
  * Spark has no ASOF JOIN; the naive forms are a correlated subquery per
  * row or a range join + per-left-row max — both quadratic in rows per
  * key. This is the scalable formulation: tag the two inputs, UNION them,
  * and take a running `last_value(payload) IGNORE NULLS` over each key's
  * event-time order. ONE shuffle by key, linear scan within key, no
  * join at all — the plan a native engine's ASOF operator would produce.
  * At 100 TB the shuffle is keyed by the join key (uniform for user-like
  * keys); a pathologically hot key is a salting candidate, but as-of
  * semantics then need per-salt boundary stitching — keep hot keys whole.
  *
  * Tie semantics: a right row at exactly left.ts IS visible (<=), which
  * the sort encodes by ordering right (side 0) before left (side 1) at
  * equal ts; among equal-ts right rows the highest `seq` wins — pass a
  * unique id to make that deterministic. The payload travels inside a
  * struct so a right row whose payload is genuinely NULL still matches
  * (IGNORE NULLS skips missing rows, not null values).
  */
object AsOfJoin {

  /** left/right must both have columns `key` and `ts`; `payload` names a
    * right column to carry; `seq` is a right column breaking equal-ts
    * ties (highest wins). Returns every left row + `payload` (null when
    * no right row is at or before the left ts).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: String,
      seq: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val rowType = left.select(struct(leftCols.map(col): _*).as("r")).schema("r").dataType
    val pType = right.select(struct(col(payload).as("v")).as("p")).schema("p").dataType
    val l = left.select(
      col(key), col(ts), lit(1).as("__side"), lit(null).cast("long").as("__seq"),
      lit(null).cast(pType).as("__p"),
      struct(leftCols.map(col): _*).as("__row"))
    val r = right.select(
      col(key), col(ts), lit(0).as("__side"), col(seq).cast("long").as("__seq"),
      struct(col(payload).as("v")).as("__p"), lit(null).cast(rowType).as("__row"))
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) :+
        col("__asof.v").as(payload): _*)
  }
}
