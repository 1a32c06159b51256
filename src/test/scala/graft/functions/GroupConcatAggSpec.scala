package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class GroupConcatAggSpec extends SparkSuite {

  test("GroupConcatAgg matches the Catalyst composition on multi-partition data") {
    import spark.implicits._
    val df = (1 to 500).map { i =>
      (i % 7, (i * 37) % 100, s"v${(i * 13) % 50}")
    }.toDF("g", "k", "v").repartition(8)
    val a = df.groupBy("g").agg(
      GroupConcatAgg(col("v"), Seq(col("k"), col("v")), " ## ", 100000, distinct = false)
        .as("s"))
    val b = df.groupBy("g").agg(
      MysqlFunctions.groupConcat(col("v"), Seq(col("k"), col("v"))).as("s"))
    val av = a.orderBy("g").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    val bv = b.orderBy("g").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(av == bv)
  }

  test("GroupConcatAgg distinct + MySQL truncation semantics") {
    import spark.implicits._
    val df = Seq((1, 2, "bb"), (1, 1, "aa"), (1, 3, "bb"), (1, 0, "cc"))
      .toDF("g", "k", "v")
    val out = df.groupBy("g").agg(
      GroupConcatAgg(col("v"), Seq(col("k")), " ## ", 8, distinct = true).as("s"))
      .collect()(0).getString(1)
    // sorted by k: cc, aa, bb, bb → distinct: cc, aa, bb → joined then cut at 8
    assert(out == "cc ## aa")
  }

  test("SQL surface: group_concat / obs_value_for / obs_contains registered") {
    SqlFunctions.register(spark)
    import spark.implicits._
    Seq((1, 10, "x"), (1, 5, "y"), (2, 1, "z")).toDF("g", "k", "v")
      .createOrReplaceTempView("t")
    val gc = spark.sql("SELECT g, group_concat(v, k) s FROM t GROUP BY g ORDER BY g")
      .collect().map(_.getString(1))
    assert(gc.toSeq == Seq("y ## x", "z"))

    Seq("!!6743=72!! ## !!1836=1065!!").toDF("obs").createOrReplaceTempView("o")
    val row = spark.sql(
      "SELECT obs_value_for(obs, 6743) w, obs_contains(obs, 1836, '1065') p FROM o")
      .collect()(0)
    assert(row.getString(0) == "72")
    assert(row.getBoolean(1))
  }
}
