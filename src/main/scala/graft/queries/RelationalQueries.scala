package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables.load
import graft.functions.MysqlFunctions.groupConcat

/** Operator-coverage queries for the relational inventory (SURVEY §2.1
  * scans, §2.2 projections/filters, §2.3 joins, §2.5 aggregations) on the
  * driver's TPC-H-ish fixtures.
  *
  * Scale notes (these run at 100 TB in spirit, sf0.1 in the bench):
  *  - filters/projections sit directly on the parquet scan so Catalyst
  *    pushes them down (PushedFilters/ReadSchema);
  *  - dimension joins (nation/region/customer) are broadcast;
  *  - money sums go through DecimalType so partial-aggregation order can't
  *    perturb the result (then cast back to double for a stable surface).
  */
object RelationalQueries {

  val all: Seq[OpQuery] = Seq(

    // S1/P1/P3: projection + pushed-down predicate scan.
    OpQuery.sql(
      "q01_scan_project_filter",
      """SELECT l_orderkey, l_partkey, l_quantity, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 45""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .filter(col("l_shipdate") < to_timestamp(lit("1996-01-01")) && col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
            to_date(col("l_shipdate")).as("ship_date"))
    },

    // P5/P4: IN-list + null tests (the lab-panel / encounter-type filters).
    OpQuery.sql(
      "q02_filter_isin_notnull",
      """SELECT event_id, user_id, event_type
        |FROM events
        |WHERE event_type IN ('click','purchase') AND value IS NOT NULL""".stripMargin) {
      (s, dir) =>
        load(s, dir, "events")
          .filter(col("event_type").isin("click", "purchase") && col("value").isNotNull)
          .select("event_id", "user_id", "event_type")
    },

    // P7/P8: IF + searched CASE (typed-value decode analog).
    OpQuery.sql(
      "q03_case_decode",
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus='F' THEN 'final'
        |       WHEN o_orderstatus='O' THEN 'open'
        |       ELSE 'pending' END AS status_label,
        |  CASE WHEN substr(o_orderpriority,1,1) IN ('1','2') THEN 1 ELSE 0 END AS urgent_flag
        |FROM orders""".stripMargin) {
      (s, dir) =>
        load(s, dir, "orders").select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", "final")
            .when(col("o_orderstatus") === "O", "open")
            .otherwise("pending").as("status_label"),
          when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), 1)
            .otherwise(0).as("urgent_flag"))
    },

    // P9: is_clinical_encounter / encounter_type_sort_index flag derivation
    // (flat_visit_summary_v1.0.sql:141-149) on the events analog.
    OpQuery.sql(
      "q04_flag_derivation",
      """SELECT event_id,
        |  CASE WHEN event_type IN ('click','view') THEN 1 ELSE NULL END AS is_clinical,
        |  CASE WHEN event_type='signup' THEN 20 WHEN event_type='error' THEN 10 ELSE 1 END AS sort_index
        |FROM events""".stripMargin) {
      (s, dir) =>
        load(s, dir, "events").select(
          col("event_id"),
          when(col("event_type").isin("click", "view"), 1).as("is_clinical"),
          when(col("event_type") === "signup", 20)
            .when(col("event_type") === "error", 10)
            .otherwise(1).as("sort_index"))
    },

    // J1/A8: big-big inner equi-join + aggregation.
    OpQuery.sql(
      "q05_join_inner_agg",
      """SELECT o_orderstatus, count(*) AS n_lines, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .join(load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
    },

    // J3: left outer join preserving unmatched left rows.
    OpQuery.sql(
      "q06_join_left_outer",
      """SELECT o_orderpriority, count(l_orderkey) AS n_lines, count(*) AS n_rows
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        load(s, dir, "orders")
          .join(load(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy("o_orderpriority")
          .agg(count(col("l_orderkey")).as("n_lines"), count(lit(1)).as("n_rows"))
    },

    // J5: semi-join work-set restriction (queue/delta filtering).
    OpQuery.sql(
      "q07_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin) {
      (s, dir) =>
        load(s, dir, "customer")
          .join(
            load(s, dir, "orders").filter(col("o_totalprice") > 400000)
              .withColumnRenamed("o_custkey", "c_custkey"),
            Seq("c_custkey"), "left_semi")
          .select("c_custkey", "c_name")
    },

    // J6: anti-join (the DELETE ... JOIN retraction shape).
    OpQuery.sql(
      "q08_join_anti",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin) {
      (s, dir) =>
        load(s, dir, "customer")
          .join(
            load(s, dir, "orders").filter(col("o_totalprice") > 450000)
              .withColumnRenamed("o_custkey", "c_custkey"),
            Seq("c_custkey"), "left_anti")
          .select("c_custkey", "c_mktsegment")
    },

    // J7: person-enrichment broadcast dimension joins.
    OpQuery.sql(
      "q09_join_broadcast_dims",
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin) {
      (s, dir) =>
        load(s, dir, "customer")
          .join(broadcast(load(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(load(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(count(lit(1)).as("n_customers"),
            min("c_acctbal").as("min_bal"), max("c_acctbal").as("max_bal"))
    },

    // J4: expression join on date-truncated key, kept equi-joinable by
    // precomputing to_date (avoids a theta/BNL join — SURVEY §2.3 J4).
    OpQuery.sql(
      "q10_join_date_expr",
      """SELECT l_returnflag, count(*) AS n_same_day
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND CAST(l_shipdate AS DATE) = CAST(o_orderdate AS DATE)
        |GROUP BY l_returnflag""".stripMargin) {
      (s, dir) =>
        val li = load(s, dir, "lineitem").withColumn("ship_day", to_date(col("l_shipdate")))
        val o = load(s, dir, "orders").withColumn("order_day", to_date(col("o_orderdate")))
        li.join(o, li("l_orderkey") === o("o_orderkey") && li("ship_day") === o("order_day"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_same_day"))
    },

    // A4/A6/A8 flagship: multi-aggregate group-by. Money sums use exact
    // decimal accumulation (order-insensitive) surfaced as double.
    OpQuery.sql(
      "q11_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(min(l_shipdate) AS DATE) AS min_ship, CAST(max(l_shipdate) AS DATE) AS max_ship
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum("l_quantity").as("sum_qty"),
            count(lit(1)).as("n_rows"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast(DecimalType(18, 4))).cast("double").as("revenue"),
            to_date(min("l_shipdate")).as("min_ship"),
            to_date(max("l_shipdate")).as("max_ship"))
    },

    // A2: GROUP_CONCAT(DISTINCT ... ORDER BY ...) (flat_lab_obs_v1.0.sql:109).
    OpQuery.sql(
      "q13_group_concat_distinct",
      """SELECT o_custkey, string_agg(DISTINCT o_orderstatus, ' ## ' ORDER BY o_orderstatus) AS statuses
        |FROM orders GROUP BY o_custkey""".stripMargin) {
      (s, dir) =>
        load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(groupConcat(col("o_orderstatus"), Seq(col("o_orderstatus")),
            distinct = true).as("statuses"))
    },

    // A4: MAX watermark column + synthetic key minting
    // (min(obs_id) + 100000000, flat_obs_v1.0.sql:161).
    OpQuery.sql(
      "q14_minmax_synthetic_key",
      """SELECT o_custkey, CAST(max(o_orderdate) AS DATE) AS max_order_date,
        |  min(o_orderkey) + 100000000 AS synthetic_id, count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin) {
      (s, dir) =>
        load(s, dir, "orders")
          .groupBy("o_custkey")
          .agg(
            to_date(max("o_orderdate")).as("max_order_date"),
            (min("o_orderkey") + 100000000L).as("synthetic_id"),
            count(lit(1)).as("n_orders"))
    },

    // A7: SELECT DISTINCT dedup projection.
    OpQuery.sql(
      "q15_distinct_projection",
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem") {
      (s, dir) => load(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    },

    // A5/I1/I2: scalar-subquery watermark resolved driver-side, then the
    // incremental delta predicate (date_created > @last_update).
    OpQuery.sql(
      "q16_watermark_delta_scan",
      """SELECT o_orderstatus, count(*) AS n_new
        |FROM orders
        |WHERE o_orderdate > (SELECT max(o_orderdate) - INTERVAL 90 DAY FROM orders)
        |GROUP BY o_orderstatus""".stripMargin) {
      (s, dir) =>
        val o = load(s, dir, "orders")
        // A5: scalar aggregate resolved to a driver-side value (string form —
        // robust to TIMESTAMP vs TIMESTAMP_NTZ row encodings).
        val wmStr = o.select(max("o_orderdate").cast("string")).first().getString(0)
        val cutoff = java.time.LocalDateTime
          .parse(wmStr.replace(' ', 'T')).minusDays(90)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
        o.filter(col("o_orderdate") > lit(cutoff))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_new"))
    },

    // A8: composite-grain grouping by (entity, day) — the person-day grain
    // of flat_lab_obs (group by person_id, date(obs_datetime),
    // flat_lab_obs_v1.0.sql:133).
    OpQuery.sql(
      "q17_groupby_entity_day",
      """SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_events,
        |  count(DISTINCT event_type) AS n_types, max(value) AS max_value
        |FROM events GROUP BY user_id, CAST(ts AS DATE)""".stripMargin) {
      (s, dir) =>
        load(s, dir, "events")
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct("event_type").as("n_types"),
            max("value").as("max_value"))
    },

    // Z-ORDER (Morton) clustering key — the multi-dimensional layout
    // operator for file skipping (the Delta/Iceberg OPTIMIZE ZORDER
    // recipe on plain parquet): interleave 16 bits each of customer and
    // order-day so a range-partition on the key gives BOTH dimensions
    // min/max locality. Pure codegen'd shifts/masks, no UDF; the oracle
    // replays every bit of the interleave, so one wrong bit position
    // anywhere breaks that row. ZorderSpec measures the actual pruning
    // win (fewer partition envelopes overlap a 2-d box than any
    // single-column sort).
    OpQuery.sql(
      "q136_zorder_key",
      """WITH b AS (SELECT o_orderkey,
        |    CAST(o_custkey AS BIGINT) & 65535 AS ck,
        |    CAST(date_diff('day', TIMESTAMP '1992-01-01 00:00:00', o_orderdate) AS BIGINT)
        |      & 65535 AS dd
        |  FROM orders),
        |e AS (SELECT *, unnest(generate_series(0, 15)) AS i FROM b)
        |SELECT o_orderkey,
        |  CAST(sum((((ck >> i) & 1) << (2*i)) + (((dd >> i) & 1) << (2*i + 1))) AS BIGINT)
        |    AS z_value
        |FROM e GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val o = load(s, dir, "orders")
        o.select(col("o_orderkey"),
          graft.operators.Zorder.zValue(Seq(
            col("o_custkey").bitwiseAND(lit(65535L)),
            datediff(col("o_orderdate"),
              to_date(lit("1992-01-01"))).cast("long").bitwiseAND(lit(65535L))),
            bits = 16).as("z_value"))
    },

    // EXACT per-group quantiles (nearest-rank-low, the deterministic
    // discrete form): rank = floor((n-1)·q) over the value-sorted group.
    // Spark's built-in percentile_approx is approximate by design; the
    // exact form is one per-group sort window — the honest cost of exact
    // quantiles — and ties at the boundary rank pick the same VALUE on
    // any engine because rank selects from the sorted multiset.
    OpQuery.sql(
      "q144_exact_group_quantiles",
      """WITH t AS (SELECT l_returnflag AS flag, l_extendedprice AS v FROM lineitem),
        |r AS (SELECT flag, v,
        |    row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |    count(*) OVER (PARTITION BY flag) AS n FROM t)
        |SELECT flag,
        |  max(CASE WHEN rn - 1 = floor((n - 1) * 0.5) THEN v END) AS p50,
        |  max(CASE WHEN rn - 1 = floor((n - 1) * 0.9) THEN v END) AS p90,
        |  max(CASE WHEN rn - 1 = floor((n - 1) * 0.99) THEN v END) AS p99
        |FROM r GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val t = load(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
        val ranked = t
          .withColumn("rn", row_number().over(
            Window.partitionBy("flag").orderBy("v")))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
        ranked.groupBy("flag").agg(
          max(when(col("rn") - 1 === floor((col("n") - 1) * lit(0.5)), col("v"))).as("p50"),
          max(when(col("rn") - 1 === floor((col("n") - 1) * lit(0.9)), col("v"))).as("p90"),
          max(when(col("rn") - 1 === floor((col("n") - 1) * lit(0.99)), col("v"))).as("p99"))
    },

    // Table PROFILING (the ANALYZE-style stats a planner feeds on):
    // per-column row count, null count, and exact distinct count in ONE
    // pass over the table — each row contributes one instance per
    // profiled column (the unpivot), then count-distinct aggregates per
    // column name. At 100 TB the same shape runs with the HLL sketch
    // (q130) swapped in for the exact distinct.
    OpQuery.sql(
      "q145_profile_columns",
      """WITH u AS (
        |  SELECT 'o_custkey' AS col_name, CAST(o_custkey AS VARCHAR) AS v FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders)
        |SELECT col_name, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct
        |FROM u GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val o = load(s, dir, "orders")
        val u = o.select(explode(array(
          struct(lit("o_custkey").as("col_name"),
            col("o_custkey").cast("string").as("v")),
          struct(lit("o_orderstatus").as("col_name"),
            col("o_orderstatus").as("v")),
          struct(lit("o_orderpriority").as("col_name"),
            col("o_orderpriority").as("v")))).as("e"))
          .select(col("e.col_name").as("col_name"), col("e.v").as("v"))
        u.groupBy("col_name").agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("v")).as("n_distinct"))
    },

    // HISTOGRAM quantile sketch — q144's MERGEABLE scale twin: one
    // min/max pass, one 256-bin equi-width count pass (map-side
    // combinable, O(bins) state — partial histograms merge by addition,
    // which is what a 1000-executor run needs), then the quantile is
    // the right edge of the bin holding the target rank. Deterministic
    // double arithmetic, identical expression both engines; the
    // cumulative walk runs over 256 rows, not the data.
    OpQuery.sql(
      "q151_histogram_quantile_sketch",
      """WITH t AS (SELECT l_extendedprice AS v FROM lineitem),
        |s AS (SELECT min(v) AS mn, max(v) AS mx, count(*) AS n FROM t),
        |b AS (SELECT CAST(least(255, floor((t.v - s.mn) * 256 / (s.mx - s.mn))) AS INTEGER) AS bin
        |  FROM t, s),
        |h AS (SELECT bin, count(*) AS c FROM b GROUP BY 1),
        |cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM h),
        |q AS (SELECT unnest([0.5, 0.9, 0.99]) AS qq)
        |SELECT q.qq AS quantile,
        |  round(s.mn + (min(cum.bin) + 1) * (s.mx - s.mn) / 256, 6) AS est_value
        |FROM q, s, cum
        |WHERE cum.cum >= ceil(q.qq * s.n)
        |GROUP BY q.qq, s.mn, s.mx""".stripMargin) {
      (s, dir) =>
        val t = load(s, dir, "lineitem").select(col("l_extendedprice").as("v"))
        val stats = t.agg(min("v").as("mn"), max("v").as("mx"),
          count(lit(1)).as("n"))
        val bins = t.crossJoin(broadcast(stats))
          .select(least(lit(255), floor((col("v") - col("mn")) * 256 /
            (col("mx") - col("mn")))).cast("int").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("c"))
        val cum = bins.select(col("bin"),
          sum("c").over(Window.orderBy("bin")).as("cum"))
        val qs = t.sparkSession.createDataFrame(
          Seq(Tuple1(0.5), Tuple1(0.9), Tuple1(0.99))).toDF("qq")
        qs.crossJoin(broadcast(stats)).join(cum,
            col("cum") >= ceil(col("qq") * col("n")))
          .groupBy(col("qq").as("quantile"), col("mn"), col("mx"))
          .agg(round(col("mn") + (min("bin") + 1) * (col("mx") - col("mn")) / 256, 6)
            .as("est_value"))
          .select(col("quantile"), col("est_value"))
    },

    // SALTED hot-key aggregation (SURVEY §4 skew): the two-phase
    // collect-and-sort that spreads one hot key over 8 reducers before
    // the final merge — byte-identical to the unsalted aggregation,
    // which is exactly what the oracle checks (it computes the plain
    // ordered aggregation; the salting must be invisible in the
    // result).
    OpQuery.sql(
      "q152_salted_hot_key_agg",
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  md5(string_agg(CAST(event_id AS VARCHAR), '|' ORDER BY ts, event_id))
        |    AS ids_md5
        |FROM events GROUP BY 1""".stripMargin) {
      (s, dir) =>
        val e = load(s, dir, "events")
          .select(col("event_type"), struct(col("ts"), col("event_id")).as("st"))
        graft.operators.Skew.saltedSortedAgg(e, Seq("event_type"),
            col("st"), saltBuckets = 8)
          .select(col("event_type"),
            size(col("sorted_entries")).cast("long").as("n"),
            md5(array_join(transform(col("sorted_entries"),
              x => x.getField("event_id").cast("string")), "|")).as("ids_md5"))
    },

    // ITERATIVE GRAPH analytics — PageRank, 5 rounds, in FIXED-POINT
    // arithmetic (scaled BIGINT, explicit integer division): floating-
    // point PageRank sums contributions in shuffle order, so its low
    // bits are not engine- or partitioning-reproducible; the fixed-point
    // form is bit-exact everywhere (long sums are order-independent,
    // DIV truncation is explicit), which is what lets an oracle replay
    // all five rounds. The graph is an id-derived 3-regular digraph
    // (offsets +7/+13/+101 mod N: out-degree AND in-degree exactly 3,
    // no self-loops), so each round is one equi-join + one keyed sum —
    // the canonical distributed PageRank shape.
    OpQuery.sql(
      "q153_pagerank_fixed_point",
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |e AS (SELECT d.doc_id AS src,
        |    CAST((d.doc_id + o.off) % nn.n AS BIGINT) AS dst
        |  FROM documents d, nn, (SELECT unnest([7, 13, 101]) AS off) o),
        |r0 AS (SELECT doc_id AS v,
        |    CAST(1000000000000000 // nn.n AS BIGINT) AS r FROM documents, nn),
        |r1 AS (SELECT e.dst AS v,
        |    CAST(150000000000000 // nn.n + (85 * sum(r0.r // 3)) // 100 AS BIGINT) AS r
        |  FROM e JOIN r0 ON r0.v = e.src, nn GROUP BY e.dst, nn.n),
        |r2 AS (SELECT e.dst AS v,
        |    CAST(150000000000000 // nn.n + (85 * sum(r1.r // 3)) // 100 AS BIGINT) AS r
        |  FROM e JOIN r1 ON r1.v = e.src, nn GROUP BY e.dst, nn.n),
        |r3 AS (SELECT e.dst AS v,
        |    CAST(150000000000000 // nn.n + (85 * sum(r2.r // 3)) // 100 AS BIGINT) AS r
        |  FROM e JOIN r2 ON r2.v = e.src, nn GROUP BY e.dst, nn.n),
        |r4 AS (SELECT e.dst AS v,
        |    CAST(150000000000000 // nn.n + (85 * sum(r3.r // 3)) // 100 AS BIGINT) AS r
        |  FROM e JOIN r3 ON r3.v = e.src, nn GROUP BY e.dst, nn.n),
        |r5 AS (SELECT e.dst AS v,
        |    CAST(150000000000000 // nn.n + (85 * sum(r4.r // 3)) // 100 AS BIGINT) AS r
        |  FROM e JOIN r4 ON r4.v = e.src, nn GROUP BY e.dst, nn.n)
        |SELECT v AS doc_id, r AS pr_scaled FROM r5""".stripMargin) {
      (s, dir) =>
        val docs = load(s, dir, "documents").select(col("doc_id")).cache()
        // N is needed as a literal inside the edge arithmetic — a
        // scalar-class driver count, same footing as the watermarks
        val n = docs.count()
        val scale = 1000000000000000L
        val edges = docs
          .select(col("doc_id").as("src"),
            explode(array(lit(7L), lit(13L), lit(101L))).as("off"))
          .select(col("src"), ((col("src") + col("off")) % n).as("dst"))
        var r = docs.select(col("doc_id").as("v"), lit(scale / n).as("r"))
        for (_ <- 1 to 5) {
          r = edges.join(r, edges("src") === r("v"))
            .groupBy(col("dst").as("v2"))
            .agg(expr(s"CAST(${15 * scale / 100 / n} + (85 * sum(r DIV 3)) DIV 100 AS BIGINT)")
              .as("r"))
            .select(col("v2").as("v"), col("r"))
        }
        r.select(col("v").as("doc_id"), col("r").as("pr_scaled"))
    }
  )
}
