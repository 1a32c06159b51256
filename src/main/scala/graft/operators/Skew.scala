package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4: person-level skew — one patient with
  * thousands of encounters makes a single reducer the straggler).
  *
  * AQE's skew-join splitting handles the join case at runtime; these
  * helpers cover the cases AQE doesn't: skewed AGGREGATION keys, and
  * deterministic pre-planned salting when AQE is off.
  */
object Skew {

  /** Two-phase salted collect-and-sort: phase 1 partially collects
    * per (keys, salt) — spreading a hot key over `saltBuckets` reducers —
    * phase 2 merges the partial arrays and applies the final sort. The
    * composition equals `collect_list + array_sort` on the unsalted key.
    *
    * `sortedStruct` must be the struct((orderKeys…, value)) used by
    * [[graft.functions.MysqlFunctions.groupConcat]]; salt is derived from
    * it (deterministic — same row always lands in the same bucket).
    */
  def saltedSortedAgg(
      df: DataFrame,
      keys: Seq[String],
      sortedStruct: Column,
      saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(sortedStruct), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sort_array(collect_list(sortedStruct)).as("__partial"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sort_array(flatten(collect_list(col("__partial")))).as("sorted_entries"))
  }

  /** Salted equi-join for a skewed left side: left rows get a random-ish
    * (hash-derived, deterministic) salt in [0, n); the right side is
    * replicated n× so every salted left partition finds its match.
    * Correct for inner/left joins on `key`; use when a few hot keys
    * dominate and broadcast isn't possible.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLeft = skewed.withColumn(
      "__salt", pmod(hash(struct(skewed.columns.map(col): _*)), lit(saltBuckets)))
    val replicatedRight = other.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
