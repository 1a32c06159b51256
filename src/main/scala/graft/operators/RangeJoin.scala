package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: match each point to every interval
  * containing it (`lo <= x < hi`, half-open) — events inside incident
  * windows, readings inside validity periods. Spark's optimizer plans a
  * bare range predicate as BroadcastNestedLoopJoin (all-pairs); that dies
  * when neither side broadcasts.
  *
  * Scalable form: quantize the axis into fixed-width buckets. Points land
  * in exactly one bucket; each interval explodes to the buckets it
  * covers; equi-join on bucket + residual containment filter. Cost =
  * points + intervals × ceil(span/width) join rows instead of |points| ×
  * |intervals|. Pick `bucketWidth` near the typical interval length: one
  * width-sized interval then explodes to ≤ 2 buckets, and a point's
  * bucket holds only intervals that could plausibly contain it. A point
  * matches an interval via exactly one bucket (its own), so no
  * post-join dedup is needed. Hot buckets (many overlapping intervals)
  * are AQE skew-join territory; pathological cases call for a second,
  * coarser bucket tier.
  */
object RangeJoin {

  /** `points` carries a numeric column `x`; `intervals` carries numeric
    * `lo`/`hi` (half-open). Returns points × containing-intervals with
    * all columns from both sides (caller keeps names disjoint).
    * Degenerate intervals (hi <= lo) match nothing.
    */
  def intervalJoin(
      points: DataFrame,
      x: String,
      intervals: DataFrame,
      lo: String,
      hi: String,
      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("__b", floor(col(x) / bucketWidth).cast("long"))
    // last covered bucket: floor(hi / w), NOT floor((hi - 1) / w) — the
    // minus-one form is only valid on integer axes; a fractional hi
    // (e.g. 10.5) still covers points in bucket floor(10.5/w), which the
    // tighter bound would skip. When hi sits exactly on a bucket
    // boundary this explodes one extra candidate bucket whose points all
    // fail the residual x < hi — a few spurious candidates, never a
    // missed match.
    val i = intervals
      .filter(col(hi) > col(lo)) // sequence() would DESCEND on an empty interval
      .withColumn("__b", explode(sequence(
        floor(col(lo) / bucketWidth).cast("long"),
        floor(col(hi) / bucketWidth).cast("long"))))
    p.join(i, Seq("__b"))
      .filter(col(x) >= col(lo) && col(x) < col(hi))
      .drop("__b")
  }
}
