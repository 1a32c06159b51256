package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables.load
import graft.functions.MysqlFunctions
import graft.operators.ReplaceInto

/** Coverage for the incremental / retraction machinery (SURVEY §2.4 K2/K4,
  * §2.9 I1-I5) expressed on the driver fixtures: the same
  * watermark → delta-keys → recompute-groups → merge dance the reference
  * performs on obs/encounters, here on orders/events with a fixed split
  * date playing the watermark.
  *
  * Scale notes: delta key-sets are small relative to the base table and are
  * broadcast into the anti-join; group recompute shuffles only rows whose
  * key is in the delta (left_semi against the broadcast key set) — at 100 TB
  * the merge cost is proportional to the delta, not the table.
  */
object IncrementalQueries {

  // Fixed "watermark": orders span 1995-01-01 .. 2001-08-01 (seed=42 fixtures).
  private val Cutoff = "2000-01-01"

  /** Streaming-fixture source files, written ONCE per (query, sf dir) and
    * reused across bench reps: the source split-write is harness prep,
    * not stream execution, and the round-7 bench showed it dominating
    * q100 (and inflating q89/q90). Checkpoint and sink dirs stay fresh
    * per invocation — only the immutable source parquet is shared. */
  private val srcCache = scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private def preparedSrc(name: String, dir: String)(write: String => Unit): String =
    srcCache.getOrElseUpdate((name, dir), {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-$name-src").toString
      write(tmp)
      tmp
    })

  private def q89Src(s: org.apache.spark.sql.SparkSession, dir: String): String =
    preparedSrc("q89", dir) { t =>
      load(s, dir, "events").coalesce(1)
        .write.mode("overwrite").parquet(s"$t/src")
    }

  private def q90Src(s: org.apache.spark.sql.SparkSession, dir: String): String =
    preparedSrc("q90", dir) { t =>
      load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$t/src")
    }

  private def q100Src(s: org.apache.spark.sql.SparkSession, dir: String): String =
    preparedSrc("q100", dir) { t =>
      val ev = load(s, dir, "events")
      ev.filter(col("event_type") === "view").coalesce(1)
        .write.mode("overwrite").parquet(s"$t/views")
      ev.filter(col("event_type") === "purchase").coalesce(1)
        .write.mode("overwrite").parquet(s"$t/purchases")
    }

  val all: Seq[OpQuery] = Seq(

    // K2/I3: REPLACE INTO merge — groups with post-watermark activity are
    // recomputed in full and replace the stale aggregate; untouched groups
    // survive. Oracle = decide per key which side it came from.
    OpQuery.sql(
      "q28_replace_into_merge",
      s"""WITH base AS (
         |  SELECT o_custkey, count(*) AS n_orders, CAST(max(o_orderdate) AS DATE) AS max_order_date
         |  FROM orders WHERE o_orderdate < TIMESTAMP '$Cutoff' GROUP BY o_custkey
         |), delta_keys AS (
         |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '$Cutoff'
         |), recomputed AS (
         |  SELECT o_custkey, count(*) AS n_orders, CAST(max(o_orderdate) AS DATE) AS max_order_date
         |  FROM orders WHERE o_custkey IN (SELECT o_custkey FROM delta_keys) GROUP BY o_custkey
         |)
         |SELECT * FROM base WHERE o_custkey NOT IN (SELECT o_custkey FROM delta_keys)
         |UNION ALL
         |SELECT * FROM recomputed""".stripMargin) {
      (s, dir) =>
        val o = load(s, dir, "orders")
        val agg = (df: org.apache.spark.sql.DataFrame) => df.groupBy("o_custkey").agg(
          count(lit(1)).as("n_orders"), to_date(max("o_orderdate")).as("max_order_date"))
        val base = agg(o.filter(col("o_orderdate") < lit(Cutoff)))
        val deltaKeys = o.filter(col("o_orderdate") >= lit(Cutoff))
          .select("o_custkey").distinct()
        val recomputed = agg(o.join(deltaKeys, Seq("o_custkey"), "left_semi"))
        ReplaceInto(base, recomputed, Seq("o_custkey"))
    },

    // I4: retraction rebuild — post-watermark 'error' events are voids; the
    // touched (user, day) groups are rebuilt from surviving rows only
    // (flat_obs_v1.0.sql:74-153 pattern at the flat_lab_obs person-day grain).
    OpQuery.sql(
      "q29_retraction_rebuild",
      s"""WITH voided AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
         |  WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-20'
         |)
         |SELECT e.user_id, CAST(e.ts AS DATE) AS day,
         |  string_agg(CAST(e.event_id AS VARCHAR), ' ## ' ORDER BY e.event_id) AS surviving_events,
         |  count(*) AS n_surviving
         |FROM events e JOIN voided v ON e.user_id = v.user_id AND CAST(e.ts AS DATE) = v.day
         |WHERE e.event_type <> 'error'
         |GROUP BY e.user_id, CAST(e.ts AS DATE)""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events").withColumn("day", to_date(col("ts")))
        val voided = ev.filter(col("event_type") === "error" && col("ts") >= lit("2024-01-20"))
          .select("user_id", "day").distinct()
        ev.filter(col("event_type") =!= "error")
          .join(broadcast(voided), Seq("user_id", "day"), "left_semi")
          .groupBy("user_id", "day")
          .agg(
            MysqlFunctions.groupConcat(col("event_id").cast("string"),
              Seq(col("event_id"))).as("surviving_events"),
            count(lit(1)).as("n_surviving"))
    },

    // K4/J6: voided-person purge — drop every summary row whose entity is in
    // the voided set (flat_obs_v1.0.sql:337-340).
    OpQuery.sql(
      "q30_voided_entity_purge",
      """WITH summary AS (
        |  SELECT user_id, count(*) AS n_events, max(value) AS max_value
        |  FROM events GROUP BY user_id
        |), voided AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0)
        |SELECT * FROM summary WHERE user_id NOT IN (SELECT user_id FROM voided)""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
        val summary = ev.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"), max("value").as("max_value"))
        val voided = ev.filter(col("user_id") % 97 === 0).select("user_id").distinct()
        ReplaceInto.deleteMatching(summary, voided, Seq("user_id"))
    },

    // I5: cascade invalidation — the downstream queue of entities whose
    // upstream rows changed since the watermark
    // (flat_visit_summary_v1.0.sql:86-99: changed encounters ∪ changed obs).
    OpQuery.sql(
      "q31_cascade_queue_build",
      s"""SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-25'
         |UNION
         |SELECT user_id FROM events WHERE event_type = 'error' AND ts >= TIMESTAMP '2024-01-20'""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
        ev.filter(col("ts") >= lit("2024-01-25")).select("user_id")
          .union(ev.filter(col("event_type") === "error" && col("ts") >= lit("2024-01-20"))
            .select("user_id"))
          .distinct()
    },

    // Structured Streaming under the batch oracle: the watermarked
    // tumbling-window aggregation runs as a REAL streaming query
    // (Trigger.AvailableNow, checkpointed, append mode) over a file
    // source, and the parquet sink's contents are compared against batch
    // SQL. Append mode withholds windows the final watermark
    // (max(ts) - lateness) hasn't closed — the oracle reproduces exactly
    // that: only windows with end <= max(ts) - 10 minutes appear. This
    // pins the STREAMING semantics (watermark close, state eviction,
    // epoch-aligned windows) to an external engine, not just to a
    // batch-vs-stream spec inside Spark.
    OpQuery.sqlPrepared(
      "q89_stream_windowed_counts",
      """WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
        |agg AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, event_type, n FROM agg, wm
        |WHERE window_start + INTERVAL 1 HOUR <= wm.w""".stripMargin)(
      (s, dir) => q89Src(s, dir): Unit) {
      (s, dir) =>
        import org.apache.spark.sql.streaming.Trigger
        // one source file → one data batch: no row can arrive "late"
        // behind a watermark raised by an earlier batch, so the only
        // withholding is the final watermark, which the oracle models
        val src = q89Src(s, dir)
        val tmp = java.nio.file.Files.createTempDirectory("graft-q89").toString
        val stream = s.readStream
          .schema(s.read.parquet(s"$src/src").schema)
          .parquet(s"$src/src")
        val q = graft.streaming.EventStreams
          .windowedTypeCounts(stream, "1 hour", "10 minutes")
          .select(col("window.start").as("window_start"),
            col("event_type"), col("n"))
          .writeStream.format("parquet")
          .option("path", s"$tmp/out")
          .option("checkpointLocation", s"$tmp/ckpt")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(300000), "stream did not drain")
        s.read.parquet(s"$tmp/out")
    },

    // The CUSTOM-STATE streaming operator (flatMapGroupsWithState
    // inactivity-gap sessionization, event-time timeouts) under the
    // batch oracle. With one data batch: sessions closed by an in-batch
    // gap emit unconditionally; each user's trailing session sits in
    // state with timeout lastTs + gap and emits only when the final
    // watermark (max(ts) - lateness) passes it. All arithmetic is
    // MILLISECOND-grain (Timestamp.getTime truncates micros), which the
    // oracle reproduces via epoch_ms — so state transitions, timeout
    // firing, and the ms truncation are all value-checked externally.
    OpQuery.sqlPrepared(
      "q90_stream_sessionize",
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tms FROM events),
        |o AS (SELECT user_id, tms,
        |    CASE WHEN lag(tms) OVER (PARTITION BY user_id ORDER BY tms) IS NULL
        |           OR tms - lag(tms) OVER (PARTITION BY user_id ORDER BY tms) > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |g AS (SELECT user_id, tms,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY tms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o),
        |sess AS (SELECT user_id, sid, min(tms) AS start_ms, max(tms) AS end_ms,
        |    count(*) AS n FROM g GROUP BY 1, 2),
        |wm AS (SELECT max(epoch_ms(ts)) - 600000 AS w FROM events),
        |last AS (SELECT user_id, max(sid) AS last_sid FROM sess GROUP BY 1)
        |SELECT s.user_id,
        |  make_timestamp(s.start_ms * 1000) AS session_start,
        |  make_timestamp(s.end_ms * 1000) AS session_end,
        |  CAST(s.n AS INTEGER) AS n_events
        |FROM sess s JOIN last l USING (user_id), wm
        |WHERE s.sid < l.last_sid OR s.end_ms + 1800000 < wm.w""".stripMargin)(
      (s, dir) => q90Src(s, dir): Unit) {
      (s, dir) =>
        import org.apache.spark.sql.streaming.Trigger
        import s.implicits._
        val src = q90Src(s, dir)
        val tmp = java.nio.file.Files.createTempDirectory("graft-q90").toString
        val stream = s.readStream
          .schema(s.read.parquet(s"$src/src").schema)
          .parquet(s"$src/src")
          .as[graft.streaming.EventStreams.Event]
        val q = graft.streaming.EventStreams
          .sessionize(stream, gapSeconds = 1800, lateness = "10 minutes")
          .writeStream.format("parquet")
          .option("path", s"$tmp/out")
          .option("checkpointLocation", s"$tmp/ckpt")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(300000), "stream did not drain")
        s.read.parquet(s"$tmp/out")
    },

    // The WATERMARKED STREAM-STREAM JOIN under the batch oracle: views and
    // purchases arrive as two file streams, and the symmetric hash join
    // matches each view to the same user's purchases within 2 hours after
    // it. Inner matches emit as both rows arrive, so with each side
    // draining in one arrival batch the output is EXACTLY the batch join —
    // which is what the oracle replays; the watermark/time-bound pair's
    // role is state eviction, exercised for real by the streaming engine
    // (append mode rejects the plan without them).
    OpQuery.sqlPrepared(
      "q100_stream_stream_join",
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
        |  v.ts AS view_ts, p.ts AS purchase_ts, p.value
        |FROM events v JOIN events p ON v.user_id = p.user_id
        |WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 2 HOUR""".stripMargin)(
      (s, dir) => q100Src(s, dir): Unit) {
      (s, dir) =>
        import org.apache.spark.sql.streaming.Trigger
        val srcDir = q100Src(s, dir)
        val tmp = java.nio.file.Files.createTempDirectory("graft-q100").toString
        def src(name: String) = s.readStream
          .schema(s.read.parquet(s"$srcDir/$name").schema)
          .parquet(s"$srcDir/$name")
        val q = graft.streaming.EventStreams
          .attributionJoin(src("views"), src("purchases"),
            windowDur = "2 hours", lateness = "10 minutes")
          .writeStream.format("parquet")
          .option("path", s"$tmp/out")
          .option("checkpointLocation", s"$tmp/ckpt")
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(300000), "stream did not drain")
        s.read.parquet(s"$tmp/out")
    }
  )
}
