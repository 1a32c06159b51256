package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the reference's hand-rolled
  * micro-batch incremental machinery (SURVEY §2.9: the cron-style CALL loop
  * is conceptually `Trigger.AvailableNow`).
  *
  * Every transform here is written against a plain DataFrame/Dataset so it
  * composes with either `spark.read` (batch) or `spark.readStream` — the
  * same declarative plan, Catalyst decides micro-batch execution.
  */
object EventStreams {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class SessionState(start: Long, lastTs: Long, nEvents: Int)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Int)

  /** Watermarked tumbling-window counts per event type — the streaming form
    * of the person-day grain aggregation (flat_lab_obs' `group by person,
    * date(obs_datetime)` is a 1-day tumbling window, SURVEY §2.9).
    * `withWatermark` bounds state: late events beyond the delay are
    * dropped, closed windows are emitted (append mode) and their state
    * freed — mandatory for unbounded 100 TB/day streams.
    */
  def windowedTypeCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Watermarked stream-stream inner join (view→purchase attribution):
    * each view matches the same user's purchases landing within
    * `windowDur` after it. The time-range predicate plus both sides'
    * watermarks let the symmetric hash join EVICT state — a view older
    * than watermark − windowDur can never match a future purchase and is
    * dropped, so state is bounded by (event rate × window), not by the
    * stream's history; without both bounds Spark rejects the plan in
    * append mode. Inner-join matches emit as soon as both rows have
    * arrived — the watermark withholds nothing from the output, which is
    * what lets the single-arrival-batch oracle replay it as a plain batch
    * join.
    */
  def attributionJoin(
      views: DataFrame, // streaming (event_id, ts, user_id, ...)
      purchases: DataFrame, // streaming (event_id, ts, user_id, value, ...)
      windowDur: String = "2 hours",
      lateness: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", lateness)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", lateness)
    v.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $windowDur"))
      .select(col("view_id"), col("purchase_id"), col("user_id"),
        col("view_ts"), col("purchase_ts"), col("value"))
  }

  /** Inactivity-gap sessionization via flatMapGroupsWithState — the custom
    * stateful operator path (SURVEY §2.9 I4 note: arbitrary-late
    * retractions stay batch-side; per-key streaming state handles the
    * append-only session case). State per user is O(1); an event-time
    * timeout closes idle sessions so state can't grow unboundedly.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800,
      lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness) // required for event-time timeouts
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.lastTs), s.nEvents))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapSeconds * 1000 =>
                  cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.lastTs), s.nEvents)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000)
            }
            closed.reverseIterator
          }
      }
  }

  /** The reference's watermark-delta scan (I1/I2) as a streaming source
    * definition: a parquet directory tailed with `readStream` is exactly
    * `date_created > @last_update` done by the engine — checkpointed
    * offsets replace the flat_log high-water mark.
    */
  def deltaStream(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Streaming exact dedup on a content key — the ingest-time form of
    * `Dedup.exact`: duplicates arriving within the watermark horizon of
    * their first occurrence are dropped; the horizon bounds the dedup
    * state (an unbounded `dropDuplicates` would grow state forever on a
    * 100 TB/day stream). Batch composition works too — on a batch frame
    * Catalyst plans it as a plain aggregate.
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      horizon: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols)
}
