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

  test("truncation counts UTF-8 bytes and never splits a code point") {
    import spark.implicits._
    // "é" is 2 bytes, "日" is 3 bytes in UTF-8. MySQL's group_concat_max_len
    // counts bytes; cutting mid-code-point is not allowed.
    val df = Seq((1, 1, "ééé"), (1, 2, "日日日")).toDF("g", "k", "v")
    def cutAt(maxLen: Int): String =
      df.groupBy("g").agg(
        GroupConcatAgg(col("v"), Seq(col("k")), "##", maxLen, distinct = false).as("s"))
        .collect()(0).getString(1)
    // full string = "ééé##日日日" = 6 + 2 + 9 = 17 bytes
    assert(cutAt(17) == "ééé##日日日")
    assert(cutAt(16) == "ééé##日日")  // 14 bytes; byte 16 would split 日 #3
    assert(cutAt(11) == "ééé##日")    // byte 11 exactly ends 日 #1
    assert(cutAt(10) == "ééé##")      // bytes 9-10 are inside 日 #1
    assert(cutAt(7) == "ééé#")        // ASCII separator cuts cleanly
    assert(cutAt(5) == "éé")          // byte 5 is inside é #3
    assert(cutAt(3) == "é")           // byte 3 would split é #2
  }

  test("SQL surface: group_concat coerces non-string value columns") {
    SqlFunctions.register(spark)
    import spark.implicits._
    // the scaladoc's own example shape: an INT value column
    Seq((1, 2, 1065), (1, 1, 6743), (2, 1, 5096)).toDF("g", "k", "c")
      .createOrReplaceTempView("t_int")
    val gc = spark.sql("SELECT g, group_concat(c, k) s FROM t_int GROUP BY g ORDER BY g")
      .collect().map(_.getString(1))
    assert(gc.toSeq == Seq("6743 ## 1065", "5096"))
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
