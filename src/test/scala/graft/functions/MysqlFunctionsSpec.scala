package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSuite

class MysqlFunctionsSpec extends SparkSuite {
  import MysqlFunctions._

  private def groups = {
    import spark.implicits._
    Seq(
      (1, 30, Some(2), "b"),
      (1, 10, Some(1), "a"),
      (1, 20, None, "z"), // null order key sorts first (MySQL NULLs-first asc)
      (1, 10, Some(1), "a"), // duplicate rendered value
      (2, 5, Some(9), "only")).toDF("g", "k", "vc", "v")
  }

  test("groupConcat orders by keys with nulls first and keeps duplicates") {
    val out = groups.groupBy("g")
      .agg(groupConcat(col("v"), Seq(col("vc"), col("k"))).as("s"))
      .orderBy("g").collect()
    assert(out(0).getString(1) == "z ## a ## a ## b")
    assert(out(1).getString(1) == "only")
  }

  test("groupConcat distinct dedups rendered values after sorting") {
    val out = groups.groupBy("g")
      .agg(groupConcat(col("v"), Seq(col("vc"), col("k")), distinct = true).as("s"))
      .orderBy("g").collect()
    assert(out(0).getString(1) == "z ## a ## b")
  }

  test("groupConcat skips null values and yields NULL for all-null groups") {
    import spark.implicits._
    val df = Seq((1, Option("x")), (1, None), (2, None)).toDF("g", "v")
    val out = df.groupBy("g").agg(groupConcat(col("v"), Seq(col("v"))).as("s"))
      .orderBy("g").collect()
    assert(out(0).getString(1) == "x")
    assert(out(1).isNullAt(1))
  }

  test("groupConcatTruncated caps the joined string") {
    import spark.implicits._
    val df = Seq.fill(50)(("g", "0123456789")).toDF("g", "v")
    val out = df.groupBy("g")
      .agg(groupConcatTruncated(col("v"), Seq(col("v")), maxLen = 25).as("s"))
      .collect()
    assert(out(0).getString(1).length == 25)
  }

  test("extractMapEntry pulls first entry for key; null when absent") {
    import spark.implicits._
    val df = Seq("!!5=70!! ## !!6743=80.5!! ## !!7=x!!").toDF("obs")
    val got = df.select(
      extractMapEntry(col("obs"), "!!6743=").as("w"),
      extractMapEntry(col("obs"), "!!9999=").as("missing")).collect()(0)
    assert(got.getString(0) == "80.5")
    assert(got.isNullAt(1))
  }

  test("regexpDecode first match wins, default used otherwise") {
    import spark.implicits._
    val df = Seq("!!1836=1065!! ## !!1836=1066!!", "!!1=2!!").toDF("obs")
    val got = df.select(regexpDecode(col("obs"),
      Seq("1836=1065" -> "Yes", "1836=1066" -> "No"), lit("none")).as("d"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("Yes", "none"))
  }
}
