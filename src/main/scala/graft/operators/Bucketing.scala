package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SURVEY §1.4: the reference's secondary
  * indexes on join keys become bucketing here).
  *
  * Writing both sides of a recurring big-big join bucketed by the join key
  * with the same bucket count lets Spark sort-merge-join them with NO
  * shuffle exchange — at 100 TB the shuffle is the dominant cost of the
  * obs↔encounter and flat_obs↔flat_orders joins, and both recur every
  * incremental tick, so pre-bucketing the flat tables amortizes one write
  * into every downstream read.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); plain
  * `.parquet()` writes can't carry it.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketKey: String,
      numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketKey)
      .sortBy(bucketKey)
      .saveAsTable(tableName)

  /** True when the executed plan of `df` contains no SHUFFLE exchange —
    * the assertion that bucketing actually removed the shuffle. Broadcast
    * and reused exchanges are not shuffles and must not fail the check
    * (an auto-broadcast dim join is shuffle-free). */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString
      .replace("BroadcastExchange", "")
      .replace("ReusedExchange", "")
      .contains("Exchange")
}
