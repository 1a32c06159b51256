package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables.load
import graft.operators.{LatestRow, TextAnalysis}

/** Window / ordered-sequential operator coverage (SURVEY §2.6).
  *
  * The reference emulates these with MySQL session-variable scans
  * (@prev_id := @cur_id, flat_visit_summary_v1.0.sql:182-191) and
  * nondeterministic GROUP BY (flat_latest_hiv_summary_v1.0.sql:22-36);
  * here they are real window functions — partitioned by the entity key so
  * they scale (no global windows in the hot path).
  */
object WindowQueries {

  val all: Seq[OpQuery] = Seq(

    // W1: lag over (person, time) — the @prev_id/@cur_id sequential scan.
    OpQuery.sql(
      "q18_window_lag_prev",
      """SELECT event_id, user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
        |  CASE WHEN lag(user_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |       THEN 1 ELSE 0 END AS is_first_of_user
        |FROM events""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        load(s, dir, "events").select(
          col("event_id"), col("user_id"), col("event_type"),
          lag("event_type", 1).over(w).as("prev_type"),
          when(lag("user_id", 1).over(w).isNull, 1).otherwise(0).as("is_first_of_user"))
    },

    // W2: latest-row-per-group, deterministic tie-break.
    OpQuery.sql(
      "q19_latest_row_per_user",
      """SELECT user_id, event_id AS last_event_id, event_type AS last_type
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin) {
      (s, dir) =>
        LatestRow(load(s, dir, "events"), Seq("user_id"), Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("event_type").as("last_type"))
    },

    // W2 + A4: the flat_latest_hiv_summary fix — latest-row bare columns
    // joined with true MAX aggregates (no Frankenstein rows, SURVEY §7.4.8).
    OpQuery.sql(
      "q20_latest_plus_max",
      """WITH latest AS (
        |  SELECT user_id, event_type AS last_type
        |  FROM events
        |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |), aggs AS (
        |  SELECT user_id, max(value) AS max_value, count(*) AS n_events FROM events GROUP BY user_id
        |)
        |SELECT user_id, last_type, max_value, n_events FROM latest JOIN aggs USING (user_id)""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
        val latest = LatestRow(ev, Seq("user_id"), Seq(col("ts"), col("event_id")))
          .select(col("user_id"), col("event_type").as("last_type"))
        val aggs = ev.groupBy("user_id")
          .agg(max("value").as("max_value"), count(lit(1)).as("n_events"))
        latest.join(aggs, Seq("user_id")).select("user_id", "last_type", "max_value", "n_events")
    },

    // W3: running counter. The reference mints global fake visit ids with
    // @fake_visit_id := @fake_visit_id + 1 seeded at 10,000,000
    // (flat_obs_v1.0.sql:29) — load-order-dependent there. Rebuilt as a
    // deterministic per-entity counter (a global row_number would serialize
    // on one partition at scale; per-key ids + the key are just as unique).
    OpQuery.sql(
      "q21_running_counter",
      """SELECT event_id, user_id,
        |  10000000 + row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS fake_visit_id
        |FROM events WHERE event_type = 'signup'""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        load(s, dir, "events")
          .filter(col("event_type") === "signup")
          .select(col("event_id"), col("user_id"),
            (lit(10000000L) + row_number().over(w)).as("fake_visit_id"))
    },

    // W1 composed: sessionization by inactivity gap (30 min) — lag + running
    // sum of boundaries, the standard event-stream pattern.
    OpQuery.sql(
      "q22_sessionize_gaps",
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
        |           OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS is_new_session
        |  FROM events
        |)
        |SELECT user_id, event_id,
        |  CAST(sum(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
        |FROM g""".stripMargin) {
      (s, dir) =>
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val g = load(s, dir, "events").select(
          col("user_id"), col("event_id"), col("ts"),
          when(
            (unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)) > 1800)
              || lag("ts", 1).over(w).isNull, 1
          ).otherwise(0).as("is_new_session"))
        g.select(col("user_id"), col("event_id"),
          sum("is_new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("session_no"))
    },

    // As-of join: every click carries the value of the user's most recent
    // purchase at-or-before it. Spark lacks ASOF JOIN; the operator is the
    // union+running-last formulation (one shuffle by key, no join) — see
    // operators/AsOfJoin.scala. Oracle mirrors it with a window over the
    // same union, ordered on epoch_us to match Spark's microsecond
    // timestamps (the parquet carries nanos, which DuckDB keeps).
    OpQuery.sql(
      "q69_asof_join",
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS tsu, 1 AS side,
        |         CAST(NULL AS BIGINT) AS seq, CAST(NULL AS DOUBLE) AS p,
        |         event_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 0, event_id, value, NULL
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, last_purchase FROM (
        |  SELECT event_id, user_id, side,
        |    last_value(p IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY tsu, side, seq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
        |  FROM u)
        |WHERE side = 1""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
        graft.operators.AsOfJoin.asof(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value"), col("event_id")),
            key = "user_id", ts = "ts", payload = "value", seq = "event_id")
          .select(col("event_id"), col("user_id"), col("value").as("last_purchase"))
    },

    // As-of, forward direction with a tolerance bound: the NEXT purchase
    // within one hour after each click (pandas merge_asof
    // direction='forward', tolerance=1h). Same union+running-last plan,
    // scanned descending; the matched right row's timestamp travels in
    // the struct so the tolerance gate nulls far matches without a join.
    // The oracle mirrors the struct trick (struct_pack) so a purchase
    // with a NULL value would still match consistently.
    OpQuery.sql(
      "q75_asof_forward",
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS tsu, 1 AS side,
        |         CAST(NULL AS BIGINT) AS seq,
        |         CAST(NULL AS STRUCT(v DOUBLE, t BIGINT)) AS p, event_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 0, event_id,
        |         struct_pack(v := value, t := epoch_us(ts)), NULL
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id,
        |  CASE WHEN m.t - tsu <= 3600000000 THEN m.v END AS next_purchase
        |FROM (
        |  SELECT event_id, user_id, side, tsu,
        |    last_value(p IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY tsu DESC, side ASC, seq DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
        |  FROM u)
        |WHERE side = 1""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
        graft.operators.AsOfJoin.asof(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value"), col("event_id")),
            key = "user_id", ts = "ts", payload = "value", seq = "event_id",
            direction = "forward", tolerance = Some(3600000000L))
          .select(col("event_id"), col("user_id"), col("value").as("next_purchase"))
    },

    // As-of, nearest direction: the purchase closest in time to each
    // click, either side, exact-distance ties resolving backward. Two
    // windows over ONE shuffle (opposite in-partition sort orders), zero
    // joins. The oracle evaluates both scans and replays the same
    // null/tie cascade.
    OpQuery.sql(
      "q76_asof_nearest",
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS tsu, 1 AS side,
        |         CAST(NULL AS BIGINT) AS seq,
        |         CAST(NULL AS STRUCT(v DOUBLE, t BIGINT)) AS p, event_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), 0, event_id,
        |         struct_pack(v := value, t := epoch_us(ts)), NULL
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id,
        |  CASE WHEN b IS NULL THEN f.v
        |       WHEN f IS NULL THEN b.v
        |       WHEN tsu - b.t <= f.t - tsu THEN b.v
        |       ELSE f.v END AS nearest_purchase
        |FROM (
        |  SELECT event_id, user_id, side, tsu,
        |    last_value(p IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY tsu ASC, side ASC, seq ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b,
        |    last_value(p IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY tsu DESC, side ASC, seq DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f
        |  FROM u)
        |WHERE side = 1""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
        graft.operators.AsOfJoin.asof(
            left = ev.filter(col("event_type") === "click")
              .select("event_id", "user_id", "ts"),
            right = ev.filter(col("event_type") === "purchase")
              .select(col("user_id"), col("ts"), col("value"), col("event_id")),
            key = "user_id", ts = "ts", payload = "value", seq = "event_id",
            direction = "nearest")
          .select(col("event_id"), col("user_id"), col("value").as("nearest_purchase"))
    },

    // Range join: every view event inside a 10-minute incident window
    // opened by an error event. Spark would plan the bare range predicate
    // as a nested-loop join; operators/RangeJoin.scala quantizes the time
    // axis and equi-joins on bucket + residual filter. The oracle is
    // DuckDB's native range join (IEJoin) over the same predicate —
    // an independent engine-level check of the bucketization.
    OpQuery.sql(
      "q70_range_join",
      """SELECT v.event_id AS view_id, e.event_id AS incident_id
        |FROM (SELECT event_id, epoch_us(ts) AS x FROM events WHERE event_type = 'view') v
        |JOIN (SELECT event_id, epoch_us(ts) AS lo, epoch_us(ts) + 600000000 AS hi
        |      FROM events WHERE event_type = 'error') e
        |ON v.x >= e.lo AND v.x < e.hi""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("event_id").as("view_id"), unix_micros(col("ts")).as("x"))
        val incidents = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("incident_id"),
            unix_micros(col("ts")).as("lo"),
            (unix_micros(col("ts")) + 600000000L).as("hi"))
        graft.operators.RangeJoin.intervalJoin(
            views, "x", incidents, "lo", "hi", bucketWidth = 600000000L)
          .select("view_id", "incident_id")
    },

    // The ranking-window family over per-source quality binning:
    // rank/dense_rank/percent_rank/cume_dist are deterministic under TIES
    // (they depend only on the ordering key's values), so they order by
    // token count alone; ntile splits ties arbitrarily and therefore gets
    // the doc_id tiebreak for a total order. The decile column is the
    // drop-the-bottom-decile quality gate a curation pipeline applies per
    // source. Exact ntile sorts each source partition — at corpus scale
    // the cut points come from approx percentiles (q45's path) instead.
    OpQuery.sql(
      "q103_rank_family_deciles",
      """WITH t AS (SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS tc
        |  FROM documents)
        |SELECT doc_id, source, tc,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  round(cume_dist() OVER w, 6) AS cdist,
        |  CAST(ntile(10) OVER (PARTITION BY source ORDER BY tc, doc_id)
        |    AS INTEGER) AS decile
        |FROM t
        |WINDOW w AS (PARTITION BY source ORDER BY tc)""".stripMargin) {
      (s, dir) =>
        val t = load(s, dir, "documents").select(
          col("doc_id"), col("source"),
          TextAnalysis.tokenCountWhitespace(col("text")).as("tc"))
        val w = Window.partitionBy("source").orderBy("tc")
        val wT = Window.partitionBy("source").orderBy("tc", "doc_id")
        t.select(col("doc_id"), col("source"), col("tc"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prnk"),
          round(cume_dist().over(w), 6).as("cdist"),
          ntile(10).over(wT).as("decile"))
    },

    // FUNNEL analysis (first-completion semantics): view -> click ->
    // purchase per user, each step within 48h of the previous step's
    // chosen event. Three keyed min-aggregations chained by per-user
    // joins — every frame moves by user_id, no window over the event
    // stream, so a 100 TB event log funnels in three map-side-
    // combinable passes. Timestamps stay exact (microsecond equality
    // across engines).
    OpQuery.sql(
      "q147_funnel_steps",
      """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.t1
        |    AND e.ts <= v.t1 + INTERVAL 48 HOUR
        |  GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
        |    AND e.ts <= c.t2 + INTERVAL 48 HOUR
        |  GROUP BY 1)
        |SELECT v.user_id,
        |  CAST(CASE WHEN p.t3 IS NOT NULL THEN 3
        |            WHEN c.t2 IS NOT NULL THEN 2 ELSE 1 END AS INTEGER) AS funnel_depth,
        |  v.t1 AS step1_ts, c.t2 AS step2_ts, p.t3 AS step3_ts
        |FROM v LEFT JOIN c ON v.user_id = c.user_id
        |LEFT JOIN p ON v.user_id = p.user_id""".stripMargin) {
      (s, dir) =>
        val e = load(s, dir, "events")
        val v = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val c = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("cts"))
          .join(v, Seq("user_id"))
          .filter(col("cts") > col("t1") &&
            col("cts") <= col("t1") + expr("INTERVAL 48 HOURS"))
          .groupBy("user_id").agg(min("cts").as("t2"))
        val p = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"))
          .join(c, Seq("user_id"))
          .filter(col("pts") > col("t2") &&
            col("pts") <= col("t2") + expr("INTERVAL 48 HOURS"))
          .groupBy("user_id").agg(min("pts").as("t3"))
        v.join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("t3").isNotNull, 3)
              .when(col("t2").isNotNull, 2).otherwise(1).as("funnel_depth"),
            col("t1").as("step1_ts"), col("t2").as("step2_ts"),
            col("t3").as("step3_ts"))
    },

    // COHORT retention: users grouped by first-activity week, counted
    // in each later week they were active. Both week keys are Monday
    // truncations, so the week offset is an exact integer (day diff of
    // two Mondays / 7). Two keyed aggregations and one join — the
    // cohort matrix of a 100 TB event log is user-grain, not
    // event-grain, after the first pass.
    OpQuery.sql(
      "q148_cohort_retention",
      """WITH f AS (SELECT user_id,
        |    CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS active_week
        |  FROM events)
        |SELECT f.cohort_week,
        |  CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS INTEGER) AS week_k,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM f JOIN a ON f.user_id = a.user_id
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val e = load(s, dir, "events")
        val f = e.groupBy("user_id")
          .agg(date_trunc("week", min("ts")).cast("date").as("cohort_week"))
        val a = e.select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("active_week")).distinct()
        f.join(a, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (datediff(col("active_week"), col("cohort_week")) / 7)
              .cast("int").as("week_k"))
          .agg(count(lit(1)).as("n_users"))
    },

    // RANGE-frame sliding window: 7-day trailing event counts per type
    // over the daily series — the frame is VALUE-based (RANGE BETWEEN 6
    // PRECEDING), so gaps in the calendar shorten the window instead of
    // silently widening it the way a ROWS frame would. Aggregation to
    // daily grain happens FIRST (map-side-combinable), so the window
    // sorts days-per-type, never raw events.
    OpQuery.sql(
      "q149_sliding_range_window",
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_7d,
        |  round(CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
        |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 7, 6) AS avg_7d
        |FROM d""".stripMargin) {
      (s, dir) =>
        val d = load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        // RANGE frame needs a numeric ordering key in Spark: days since
        // epoch carries the same 6-preceding semantics as the DATE range
        val w = Window.partitionBy("event_type")
          .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
          .rangeBetween(-6, Window.currentRow)
        d.select(col("event_type"), col("day"), col("n"),
          sum("n").over(w).as("n_7d"),
          round(sum("n").over(w).cast("double") / 7, 6).as("avg_7d"))
    },

    // Interval coalescing (gaps-and-islands): per-user activity spans
    // [ts, ts + (event_id%97+1) minutes] merged into maximal islands —
    // the reduction every span-producing operator (VAD windows, scrub
    // spans, session ranges) needs. Running-max island detection, NOT a
    // range self-join: one shuffle by user, two same-window passes
    // (Spark collapses them into one sort), linear per key. Timestamps
    // compare microsecond-exact across engines (q147 precedent); the
    // island increment fires only on a strict gap, so tie order can't
    // change the output.
    OpQuery.sql(
      "q158_interval_coalesce",
      """WITH s AS (SELECT user_id,
        |    ts AS s,
        |    ts + to_minutes(CAST(event_id % 97 + 1 AS BIGINT)) AS e
        |  FROM events),
        |m AS (SELECT user_id, s, e,
        |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM s),
        |f AS (SELECT user_id, s, e,
        |    CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS ni
        |  FROM m),
        |i AS (SELECT user_id, s, e,
        |    sum(ni) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM f)
        |SELECT user_id, min(s) AS start, max(e) AS "end",
        |  count(*) AS n_merged
        |FROM i GROUP BY user_id, island""".stripMargin) {
      (s, dir) =>
        graft.operators.Intervals.coalesceIntervals(
            load(s, dir, "events"),
            col("user_id"),
            col("ts"),
            col("ts") + expr(
              "make_interval(0, 0, 0, 0, 0, cast(event_id % 97 + 1 as int), 0)"))
          .select(col("key").as("user_id"), col("start"), col("end"),
            col("n_merged"))
    },

    // Inter-arrival-time distribution: per user, the exact MEDIAN gap
    // between consecutive events in MICROSECONDS — sub-second parts are
    // real in this fixture, so second-floor arithmetic would corrupt
    // gaps; unix_micros keeps the diff exact and the median is the
    // q144 order statistic. The behavioral-telemetry grain bot
    // detection and session modeling read.
    OpQuery.sql(
      "q199_interarrival_median",
      """WITH g AS (SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
        |  FROM events),
        |d AS (SELECT user_id, date_diff('microsecond', pts, ts) AS gap_us
        |  FROM g WHERE pts IS NOT NULL),
        |r AS (SELECT user_id, gap_us,
        |    row_number() OVER (PARTITION BY user_id ORDER BY gap_us) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n FROM d)
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_gaps,
        |  CAST(max(CASE WHEN rn - 1 = floor((n - 1) * 0.5) THEN gap_us END)
        |    AS BIGINT) AS median_gap_us
        |FROM r WHERE n >= 2 GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val g = load(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("pts", lag("ts", 1).over(
            Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
          .filter(col("pts").isNotNull)
          .select(col("user_id"),
            (unix_micros(col("ts")) - unix_micros(col("pts"))).as("gap_us"))
        val r = g
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy("gap_us")))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
          .filter(col("n") >= 2)
        r.groupBy("user_id")
          .agg(max("n").as("n_gaps"),
            max(when(col("rn") - 1 === floor((col("n") - 1) * lit(0.5)),
              col("gap_us"))).as("median_gap_us"))
    },

    // Semi-structured JSON payload extraction — events carry a JSON
    // props blob, and the path extraction (`$.k`) runs as a codegen'd
    // per-row projection on both engines, NO pre-parsing pass or
    // schema migration: the standard first contact with event payloads.
    // Malformed JSON yields NULL (counted, never guessed); aggregates
    // stay in the integer domain.
    OpQuery.sql(
      "q197_json_payload_extract",
      """WITH j AS (SELECT event_type,
        |    CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unparsed,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(count(DISTINCT k) AS BIGINT) AS n_distinct_k,
        |  CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |FROM j GROUP BY 1""".stripMargin) {
      (s, dir) =>
        load(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("k").isNull, 1).otherwise(0)).cast("long")
              .as("n_unparsed"),
            sum("k").as("sum_k"),
            countDistinct("k").as("n_distinct_k"),
            min("k").as("min_k"), max("k").as("max_k"))
    },

    // Event-rate ANOMALY detection: each day's count scored against
    // the trailing 7-day baseline (excluding the day itself) as a
    // z-score built from exact INTEGER window moments — sum and
    // sum-of-squares are int sums in the frame, so the mean/std inputs
    // carry no float fold-order, and the z is one fixed double
    // expression. Zero-variance or short baselines yield NULL, never a
    // fabricated score.
    OpQuery.sql(
      "q194_event_rate_anomaly",
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |    sum(n) OVER w7 AS s,
        |    sum(n * n) OVER w7 AS ss,
        |    count(*) OVER w7 AS m
        |  FROM d
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n,
        |  CAST(m AS INTEGER) AS baseline_days,
        |  round(CASE WHEN m >= 3 AND m * ss - s * s > 0
        |    THEN (n - CAST(s AS DOUBLE) / m)
        |      / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / m) / m)
        |    END, 6) AS z_score
        |FROM w""".stripMargin) {
      (s, dir) =>
        val d = load(s, dir, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val w7 = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        d.select(col("event_type"), col("day"), col("n"),
            sum("n").over(w7).as("s"),
            sum(col("n") * col("n")).over(w7).as("ss"),
            count(lit(1)).over(w7).as("m"))
          .select(col("event_type"), col("day"), col("n"),
            col("m").cast("int").as("baseline_days"),
            round(when(col("m") >= 3 &&
              col("m") * col("ss") - col("s") * col("s") > 0,
              (col("n") - col("s").cast("double") / col("m")) /
                sqrt((col("ss").cast("double") -
                  col("s").cast("double") * col("s") / col("m")) / col("m"))),
              6).as("z_score"))
    },

    // Idempotency-key event dedup — at-least-once delivery means the
    // same logical event arrives more than once with a fresh surrogate
    // id; the dedup key is (user, type, event time) and FIRST-writer
    // wins (min event_id). The fixture replays a redelivered slice
    // (every 37th event, new ids) so the duplicate accounting is
    // non-vacuous; one window keyed by the idempotency key.
    OpQuery.sql(
      "q190_event_idempotency_dedup",
      """WITH e AS (SELECT event_id, user_id, event_type, ts FROM events
        |  UNION ALL
        |  SELECT event_id + 10000000, user_id, event_type, ts
        |  FROM events WHERE event_id % 37 = 0),
        |d AS (SELECT event_type, user_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type, ts
        |      ORDER BY event_id) AS rn
        |  FROM e)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_duplicates,
        |  round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS dup_rate
        |FROM d GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val ev = load(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts"))
        val redelivered = ev.filter(col("event_id") % 37 === 0)
          .select((col("event_id") + 10000000L).as("event_id"),
            col("user_id"), col("event_type"), col("ts"))
        val w = Window.partitionBy("user_id", "event_type", "ts")
          .orderBy("event_id")
        ev.unionByName(redelivered)
          .withColumn("rn", row_number().over(w))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("rn") > 1, 1).otherwise(0)).cast("long")
              .as("n_duplicates"),
            round(sum(when(col("rn") > 1, 1).otherwise(0)).cast("double") /
              count(lit(1)), 6).as("dup_rate"))
    }
  )
}
