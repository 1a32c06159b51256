package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.etl.{FlatObs, Pipeline, Schemas}
import graft.operators.LatestRow

/** Streaming mode for the ETL: the reference's cron-style `CALL` loop IS
  * micro-batch incremental processing (SURVEY §2.9 — "conceptually
  * Structured Streaming with Trigger.AvailableNow, implemented by hand").
  * This wires it for real: a file stream tails the obs source directory
  * and each micro-batch drives the SAME FlatObs.incremental merge the
  * batch pipeline uses. The engine's checkpointed offsets replace the
  * flat_log high-water mark (I1); newly-arrived files are the
  * `date_created > @last_update` delta (I2) with no watermark query.
  *
  * Source contract: an append-only log of row VERSIONS — a void (I4)
  * arrives as a new file carrying the same obs_id with voided=1. Current
  * state = latest version per obs_id (voided version outranks the
  * original). The recompute reads the deduped snapshot for affected
  * groups, because retraction needs the surviving rows, not just the
  * delta.
  */
object IncrementalEtlStream {

  /** Latest version per obs_id: order by date_created, then date_voided
    * (desc, nulls last) so the voided version of a same-timestamp row wins.
    */
  def currentState(versions: DataFrame): DataFrame =
    LatestRow(versions, Seq("obs_id"), Seq(col("date_created"), col("date_voided")))

  /** Process all unseen obs files into the flat_obs snapshot at `pipeline`
    * root, then stop (Trigger.AvailableNow). Repeated calls = repeated
    * `CALL generate_flat_obs()`.
    */
  def runFlatObsOnce(
      spark: SparkSession,
      obsDir: String,
      encounter: DataFrame,
      person: DataFrame,
      pipeline: Pipeline,
      checkpointDir: String): Unit = {
    val stream = spark.readStream
      .schema(Schemas.obs)
      .option("recursiveFileLookup", "true")
      .parquet(obsDir)

    val query = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val snapshot = currentState(
          spark.read.schema(Schemas.obs)
            .option("recursiveFileLookup", "true").parquet(obsDir))
        val next = pipeline.readFlat("flat_obs") match {
          case Some(existing) =>
            // Per-batch watermark: just below the batch's earliest event —
            // date_created for inserts, date_voided for retractions — so
            // every arriving version registers on its delta path
            // (new: date_created > wm; void: date_voided > wm with the
            // original row's date_created <= wm).
            val wmRow = batch.agg(
              min(when(col("voided") === 1, col("date_voided"))
                .otherwise(col("date_created"))).cast("string")).first()
            if (wmRow.isNullAt(0)) existing
            else {
              val wm = new java.sql.Timestamp(
                java.sql.Timestamp.valueOf(wmRow.getString(0)).getTime - 1)
              FlatObs.incremental(existing, snapshot, encounter, person, wm)
            }
          case None => FlatObs.build(snapshot, encounter, person)
        }
        pipeline.writeSnapshot(next, "flat_obs")
        ()
      }
      .start()
    query.awaitTermination()
  }
}
