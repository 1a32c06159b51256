package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite
import EventStreams._

class EventStreamsSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedTypeCounts over a MemoryStream emits closed watermarked windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = windowedTypeCounts(input.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts("2024-01-01 10:05:00"), "click", 1.0),
      Event(1, ts("2024-01-01 10:40:00"), "click", 2.0),
      Event(2, ts("2024-01-01 10:50:00"), "view", 3.0))
    q.processAllAvailable()
    // advance watermark past 11:10 so the 10:00 window closes
    input.addData(Event(3, ts("2024-01-01 12:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("win_counts")
      .select(col("window.start").cast("string"), col("event_type"), col("n"),
        col("total_value"))
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    q.stop()
    assert(rows.toSeq == Seq(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 10:00:00", "view", 1L, 3.0)))
  }

  test("sessionize groups by inactivity gap and closes sessions on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()

    // user 1: two events 10 min apart (one session), then a 2-hour gap event
    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), "click", 1.0),
      Event(1, ts("2024-01-01 10:10:00"), "view", 1.0),
      Event(1, ts("2024-01-01 13:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("sessions")
      .select(col("user_id"), col("session_start").cast("string"), col("n_events"))
      .as[(Long, String, Int)].collect().sortBy(_._2)
    q.stop()
    // first session closed when the 13:00 event arrived in-batch
    assert(rows.toSeq == Seq((1L, "2024-01-01 10:00:00", 2)))
  }

  test("dedupStream drops in-horizon duplicates, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.dedupStream(
        input.toDF(), Seq("user_id", "event_type"), "ts", "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()

    input.addData(
      Event(1, ts("2024-01-01 10:00:00"), "click", 1.0),
      Event(1, ts("2024-01-01 10:20:00"), "click", 2.0), // dup within horizon
      Event(2, ts("2024-01-01 10:05:00"), "click", 3.0))
    q.processAllAvailable()
    input.addData(
      Event(1, ts("2024-01-01 10:30:00"), "click", 4.0)) // still duplicate
    q.processAllAvailable()
    val rows = spark.table("deduped")
      .select(col("user_id"), col("value")).as[(Long, Double)]
      .collect().sortBy(_._1)
    q.stop()
    assert(rows.toSeq == Seq((1L, 1.0), (2L, 3.0)))
  }

  test("attributionJoin matches in-window pairs and evicts state past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = EventStreams.attributionJoin(
        views.toDF().toDF("event_id", "ts", "user_id"),
        purchases.toDF().toDF("event_id", "ts", "user_id", "value"),
        windowDur = "2 hours", lateness = "10 minutes")
      .writeStream.format("memory").queryName("attributed")
      .outputMode(OutputMode.Append()).start()

    // batch 1: v1 matches p1 (30 min later, same user); the 20:00 events
    // advance BOTH sides' watermarks (global watermark = min of inputs)
    // far past v1's join horizon (view_ts + 2h = 12:00)
    views.addData((1L, ts("2024-01-01 10:00:00"), 1L),
      (90L, ts("2024-01-01 20:00:00"), 9L))
    purchases.addData((101L, ts("2024-01-01 10:30:00"), 1L, 5.0),
      (190L, ts("2024-01-01 20:00:00"), 8L, 1.0))
    q.processAllAvailable()

    // batch 2: p2 would match v1 inside the 2-hour window, but arrives
    // after the watermark passed v1's horizon — state was evicted (and
    // the row itself is watermark-late), so NO match may emerge. A fresh
    // in-horizon pair proves the join is still live.
    purchases.addData((102L, ts("2024-01-01 10:40:00"), 1L, 7.0),
      (191L, ts("2024-01-01 20:05:00"), 9L, 2.0))
    q.processAllAvailable()
    val rows = spark.table("attributed")
      .select(col("view_id"), col("purchase_id"), col("value"))
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    q.stop()
    assert(rows.toSeq == Seq((1L, 101L, 5.0), (90L, 191L, 2.0)),
      s"unexpected matches: ${rows.toSeq}")
  }
}
