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

  /** Generalized two-phase salted aggregation: several sorted collect-lists
    * (each a `struct(orderKeys…, v)` whose null rows are skipped, exactly
    * like [[graft.functions.MysqlFunctions.groupConcat]]'s input) plus
    * associative MAX columns, all in the same two shuffles. Phase 1
    * aggregates per (keys, salt) so a hot key spreads over `saltBuckets`
    * reducers; phase 2 merges partials (flatten + final sort, max of
    * maxes). Output: `keys ++ maxCols.names ++ structCols.names`, the
    * struct columns holding the globally sorted entry arrays.
    */
  def saltedSortedAggs(
      df: DataFrame,
      keys: Seq[String],
      structCols: Seq[(String, Column)],
      maxCols: Seq[(String, Column)],
      saltBuckets: Int,
      minCols: Seq[(String, Column)] = Nil): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(hash(structCols.head._2), lit(saltBuckets)))
    val phase1 = maxCols.map { case (n, c) => max(c).as(n) } ++
      minCols.map { case (n, c) => min(c).as(n) } ++
      structCols.map { case (n, c) =>
        sort_array(collect_list(when(c.getField("v").isNotNull, c))).as(n)
      }
    val partials = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1.head, phase1.tail: _*)
    val phase2 = maxCols.map { case (n, _) => max(col(n)).as(n) } ++
      minCols.map { case (n, _) => min(col(n)).as(n) } ++
      structCols.map { case (n, _) =>
        sort_array(flatten(collect_list(col(n)))).as(n)
      }
    partials
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
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
      "__salt", pmod(hash(struct(skewed.columns.toIndexedSeq.map(col): _*)), lit(saltBuckets)))
    val replicatedRight = other.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
