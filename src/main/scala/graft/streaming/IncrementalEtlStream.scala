package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.etl.{FlatLabObs, FlatLatestHivSummary, FlatObs, FlatOrders, FlatVisitSummary, Pipeline, Schemas}
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

  /** Merge one micro-batch into flat_obs: incremental against the
    * existing snapshot when one exists, full build otherwise. Returns the
    * next flat_obs and the per-batch watermark used (None on first build
    * or an empty batch).
    *
    * The watermark sits just below the batch's earliest event —
    * date_created for inserts, date_voided for retractions — so every
    * arriving version registers on its delta path (new: date_created >
    * wm; void: date_voided > wm with the original row's date_created <=
    * wm).
    */
  private def mergeFlatObs(
      batch: DataFrame,
      snapshot: DataFrame,
      encounter: DataFrame,
      person: DataFrame,
      pipeline: Pipeline): (DataFrame, Option[java.sql.Timestamp]) =
    pipeline.readFlat("flat_obs") match {
      case Some(existing) =>
        val wmRow = batch.agg(
          min(when(col("voided") === 1, col("date_voided"))
            .otherwise(col("date_created"))).cast("string")).first()
        if (wmRow.isNullAt(0)) (existing, None)
        else {
          val wm = new java.sql.Timestamp(
            java.sql.Timestamp.valueOf(wmRow.getString(0)).getTime - 1)
          // the BATCH is the change feed (SourceDeltas contract): every
          // version arriving since the last watermark is in it, so the
          // delta key scans seed from the batch instead of re-scanning
          // the whole accumulated snapshot; rebuilds still read the
          // snapshot source-of-truth
          (FlatObs.incremental(existing, snapshot, encounter, person, wm,
            obsDelta = Some(batch)), Some(wm))
        }
      case None => (FlatObs.build(snapshot, encounter, person), None)
    }

  private def obsSnapshot(spark: SparkSession, obsDir: String): DataFrame =
    currentState(
      spark.read.schema(Schemas.obs)
        .option("recursiveFileLookup", "true").parquet(obsDir))

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
        val (next, _) = mergeFlatObs(
          batch, obsSnapshot(spark, obsDir), encounter, person, pipeline)
        pipeline.writeSnapshot(next, "flat_obs")
        ()
      }
      .start()
    query.awaitTermination()
  }

  /** The full downstream cascade in one micro-batch loop: each batch
    * merges flat_obs, drives flat_lab_obs' person-day incremental from
    * the same snapshot and watermark, then flat_visit_summary's
    * person-queue incremental (including the retraction-only queue via
    * the raw obs snapshot), and rebuilds flat_latest_hiv_summary — the
    * same stage code and cascade order as `Pipeline.tick`, with the
    * stream's checkpointed offsets as the only progress state. `orders`
    * is a static dimension here (its flat stage builds once); a second
    * file stream on orders would slot in identically.
    */
  def runCascadeOnce(
      spark: SparkSession,
      obsDir: String,
      encounter: DataFrame,
      orders: DataFrame,
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
      .foreachBatch { (rawBatch: DataFrame, _: Long) =>
        // `graft.debug.cascadeTiming=true` prints per-stage seconds —
        // profiling hook only, no behavior change
        def timed[A](label: String)(f: => A): A =
          if (spark.conf.getOption("graft.debug.cascadeTiming")
              .contains("true")) {
            val t0 = System.nanoTime()
            val r = f
            println(f"    [cascade] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
            r
          } else f
        // the deduped snapshot's LatestRow window used to re-execute
        // inside EVERY downstream stage's plan (4-5x per batch); pin it
        // once per batch. The batch doubles as the stages' change feed.
        val batch = rawBatch.persist()
        val snapshot = obsSnapshot(spark, obsDir).persist()
        try {
          val (next, wmOpt) = mergeFlatObs(
            batch, snapshot, encounter, person, pipeline)
          timed("flat_obs")(pipeline.writeSnapshot(next, "flat_obs"))
          val lab = (pipeline.readFlat("flat_lab_obs"), wmOpt) match {
            case (Some(existing), Some(wm)) =>
              FlatLabObs.incremental(existing, snapshot, person, wm,
                obsDelta = Some(batch))
            case _ => FlatLabObs.build(snapshot, person)
          }
          timed("flat_lab_obs")(pipeline.writeSnapshot(lab, "flat_lab_obs"))
          if (pipeline.readFlat("flat_orders").isEmpty)
            timed("flat_orders")(pipeline.writeSnapshot(
              FlatOrders.build(orders, encounter, person), "flat_orders"))
          val fo = pipeline.readFlat("flat_obs").get
          val ford = pipeline.readFlat("flat_orders").get
          val summary = (pipeline.readFlat("flat_visit_summary"), wmOpt) match {
            case (Some(existing), Some(wm)) =>
              FlatVisitSummary.incremental(
                existing, fo, ford, snapshot, encounter, person, wm,
                obsDelta = Some(batch))
            case _ => FlatVisitSummary.build(fo, ford, person)
          }
          timed("flat_visit_summary")(
            pipeline.writeSnapshot(summary, "flat_visit_summary"))
          timed("flat_latest")(pipeline.writeSnapshot(
            FlatLatestHivSummary.build(
              pipeline.readFlat("flat_visit_summary").get),
            "flat_latest_hiv_summary"))
        } finally { batch.unpersist(); snapshot.unpersist() }
        ()
      }
      .start()
    query.awaitTermination()
  }
}
