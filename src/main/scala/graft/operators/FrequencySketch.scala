package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch, relational form: token frequencies over a corpus too
  * large to hold exact per-token counts (the 100 TB question "how often
  * does this n-gram appear" behind contamination screens, boilerplate
  * thresholds, and stop-list mining).
  *
  * The sketch is a (depth x width) counter grid: each occurrence
  * increments one slot per depth row, chosen by an md5 hash salted with
  * the depth index. Estimates read the MINIMUM of a token's depth slots —
  * always >= the true count (counters only ever overestimate, by other
  * tokens colliding into the same slot), with the classic (eps, delta)
  * bound: width w bounds the overestimate by eps*N for eps = e/w at
  * confidence 1 - exp(-depth).
  *
  * Scale shape: building is explode + groupBy(depth, slot) — map-side
  * combinable, one shuffle of at most depth*width rows out of each
  * partition regardless of corpus size; the finished sketch is
  * depth*width rows total (broadcastable), and two sketches MERGE by
  * adding slot-wise (counters are additive), so per-day sketches
  * union+sum into per-month ones without touching the corpus again. The
  * md5 slot hash is engine-portable, so an external engine replays the
  * sketch bit-for-bit (q81's oracle does).
  */
object FrequencySketch {

  /** Slot index of `token` in depth row `d`. */
  def slot(token: Column, d: Int, width: Int): Column =
    Curation.samplingBucket(token, width, salt = s"cm$d|")

  /** Build the sketch from one row per token OCCURRENCE: returns
    * (depth, slot, n) — at most depth*width rows. */
  def countMinBuild(occurrences: DataFrame, token: Column, width: Int, depth: Int): DataFrame =
    occurrences
      .select(posexplode(array((0 until depth).map(d => slot(token, d, width)): _*)))
      .select(col("pos").cast("int").as("depth"), col("col").as("slot"))
      .groupBy("depth", "slot")
      .agg(count(lit(1)).as("n"))

  /** Merge sketches built with the same (width, depth): slot-wise sum. */
  def countMinMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("depth", "slot")
      .agg(sum(col("n")).as("n"))

  /** Point estimates for `queries` (one row per distinct token in column
    * `token`): min over depth rows of the token's slot counters. The
    * sketch is depth*width rows → broadcast; a token absent from every
    * slot estimates 0 (its slots were never incremented).
    */
  def countMinEstimate(
      sketch: DataFrame,
      queries: DataFrame,
      token: Column,
      width: Int,
      depth: Int): DataFrame =
    queries
      .withColumn("__tok", token)
      .select(col("*"), posexplode(
        array((0 until depth).map(d => slot(col("__tok"), d, width)): _*)))
      .withColumnRenamed("pos", "depth").withColumnRenamed("col", "slot")
      .withColumn("depth", col("depth").cast("int"))
      .join(broadcast(sketch), Seq("depth", "slot"), "left")
      .groupBy("__tok")
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
      .withColumnRenamed("__tok", "token")
}
