package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables.load

/** Engine-completeness operators beyond the reference's own surface (the
  * reference has no rollup/full-outer/except/pivot — SURVEY §2.5/§2.7
  * "none appear"), included so a user migrating analytics onto this
  * library has the standard relational toolkit. All oracle-checked.
  */
object CompletenessQueries {

  val all: Seq[OpQuery] = Seq(

    // ROLLUP hierarchy totals with grouping flags.
    OpQuery.sql(
      "q49_rollup",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n,
        |  CAST(grouping(l_returnflag) AS INT) AS g_flag, CAST(grouping(l_linestatus) AS INT) AS g_status
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) {
      (s, dir) =>
        load(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"),
            grouping("l_returnflag").cast("int").as("g_flag"),
            grouping("l_linestatus").cast("int").as("g_status"))
    },

    // CUBE — all 2^n grouping sets at once — plus the composite
    // grouping_id bitmask (first grouping column = most significant bit
    // in both engines).
    OpQuery.sql(
      "q104_cube_grouping_id",
      """SELECT source, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars,
        |  CAST(GROUPING(source, lang) AS INT) AS gid
        |FROM documents GROUP BY CUBE (source, lang)""".stripMargin) {
      (s, dir) =>
        load(s, dir, "documents")
          .cube("source", "lang")
          .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"),
            grouping_id().cast("int").as("gid"))
          .select("source", "lang", "n_docs", "chars", "gid")
    },

    // FULL OUTER join preserving both unmatched sides.
    OpQuery.sql(
      "q50_full_outer_join",
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |  c.c_name, count(o.o_orderkey) AS n_orders
        |FROM (SELECT * FROM customer WHERE c_custkey % 3 = 0) c
        |FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey % 2 = 0) o
        |  ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2""".stripMargin) {
      (s, dir) =>
        val c = load(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
        val o = load(s, dir, "orders").filter(col("o_custkey") % 2 === 0)
        c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
          .groupBy(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"), col("c_name"))
          .agg(count(col("o_orderkey")).as("n_orders"))
    },

    // EXCEPT / INTERSECT set operations.
    OpQuery.sql(
      "q51_set_ops",
      """SELECT 'only_big' AS side, o_custkey FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 450000)
        |UNION ALL
        |SELECT 'both', o_custkey FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin) {
      (s, dir) =>
        val o = load(s, dir, "orders")
        val big = o.filter(col("o_totalprice") > 300000).select("o_custkey").distinct()
        val bigger = o.filter(col("o_totalprice") > 450000).select("o_custkey").distinct()
        val fstatus = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
        big.except(bigger).select(lit("only_big").as("side"), col("o_custkey"))
          .unionByName(big.intersect(fstatus)
            .select(lit("both").as("side"), col("o_custkey")))
    },

    // PIVOT: status columns per priority (fixed pivot values → deterministic
    // schema; DuckDB side via FILTERed conditional aggregation).
    OpQuery.sql(
      "q52_pivot",
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
        |FROM orders GROUP BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        load(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .withColumnRenamed("F", "status_F")
          .withColumnRenamed("O", "status_O")
          .withColumnRenamed("P", "status_P")
          .na.fill(0, Seq("status_F", "status_O", "status_P"))
    }
  )
}
